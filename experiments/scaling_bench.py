"""Edge-partitioned scaling benchmark.

Measures edges/s of the edge-partitioned AMPGCN training step at 1..K
shards. On a real multi-chip slice the 'graph' axis rides ICI and this
reports true scaling efficiency (BASELINE.md target: >=80% at N>=2
hosts); on a single chip it runs over the virtual CPU mesh
(xla_force_host_platform_device_count) and validates the collective
structure rather than absolute throughput."""
import argparse
import json
import os
import sys
import time

if __name__ == "__main__" and os.environ.get("SCALING_BENCH_CPU", "1") == "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

from common import *  # noqa: F401,F403

import jax

if os.environ.get("SCALING_BENCH_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.core.graph import from_arrays
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.parallel import (
    build_halo_plan,
    make_mesh,
    make_partitioned_train_step,
    partition_graph,
)
from ampnet_tpu.train.optim import make_optimizer


def bench_shards(n_shards, g, cfg, params, iters=10, use_halo=False):
    mesh = make_mesh(data=1, graph=n_shards)
    pg = partition_graph(g, n_shards)
    tx = make_optimizer(1e-3)
    opt_state = tx.init(params)
    step = make_partitioned_train_step(cfg, mesh, tx, loss_mode="full",
                                       use_halo=use_halo)
    extra = (build_halo_plan(pg),) if use_halo else ()
    with mesh:
        params_, opt_state, _ = step(params, opt_state, pg,
                                     jax.random.PRNGKey(0), *extra)
        jax.block_until_ready(params_)
        t0 = time.perf_counter()
        p, o = params, opt_state
        for i in range(iters):
            p, o, m = step(p, o, pg, jax.random.PRNGKey(i), *extra)
        jax.block_until_ready(p)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main(max_shards=8, n=512, e=4096, use_halo=False):
    rng = np.random.default_rng(0)
    f = 256
    x = (rng.random((n, f)) < 0.05).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = from_arrays(x, ei, y=rng.integers(0, 7, n), train_mask=np.ones(n, bool),
                    node_norm=np.ones(n, np.float32))
    cfg = AMPGCNConfig(
        embedding_dim=32, num_heads=4, num_node_features=f,
        num_sampled_vectors=8, output_dim=7, feat_emb_dim=31, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    )
    model = AMPGCN(config=cfg)
    k = jax.random.PRNGKey(0)
    variables = model.init({"params": k, "sample": k, "dropout": k, "edges": k}, g)
    params = variables["params"]

    results = {}
    shard_counts = [s for s in (1, 2, 4, 8) if s <= max_shards and s <= len(jax.devices())]
    for s in shard_counts:
        dt = bench_shards(s, g, cfg, params, use_halo=use_halo)
        results[s] = {"step_ms": dt * 1e3, "edges_per_s": e / dt}
        print(f"shards={s}: {dt*1e3:.2f} ms/step, {e/dt:.0f} edges/s")
    if 1 in results:
        base = results[1]["edges_per_s"]
        for s in shard_counts[1:]:
            eff = results[s]["edges_per_s"] / (base * s)
            results[s]["scaling_efficiency"] = eff
            print(f"shards={s}: scaling efficiency {eff:.2%}")
    print(json.dumps({str(k): v for k, v in results.items()}))
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--max-shards", type=int, default=8)
    p.add_argument("--halo", action="store_true",
                   help="boundary-only halo exchange (the scale-out "
                        "default) instead of the all-gather path")
    a = p.parse_args()
    main(a.max_shards, use_halo=a.halo)
