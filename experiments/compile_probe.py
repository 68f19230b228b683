"""Compile-time probe for the DP train step on the virtual CPU mesh
(VERDICT r2 #6): which dimension makes XLA CPU compile take >30 min at
Cora scale?

Sweeps one knob at a time from the tiny base (which compiles in ~1 min)
toward the full config (pad_n=4096, pad_e=32768, emb=128, S=20, H=4),
timing `.lower()` and `.compile()` separately with the persistent cache
DISABLED so every point is a true cold compile.
"""
import argparse
import time

import numpy as np

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def force_cpu(n_devices: int):
    flags = os.environ.get("XLA_FLAGS", "")
    opt = f"--xla_force_host_platform_device_count={n_devices}"
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + opt).strip()
    else:
        os.environ["XLA_FLAGS"] = re.sub(
            r"--xla_force_host_platform_device_count=\d+", opt, flags)
    import jax

    jax.config.update("jax_platforms", "cpu")


def probe(name, pad_n, pad_e, emb, s, heads, n_shards=8):
    import jax

    from ampnet_tpu.core.config import AMPGCNConfig
    from ampnet_tpu.core.graph import from_arrays
    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.parallel import make_dp_train_step, make_mesh, shard_batch, stack_graphs
    from ampnet_tpu.train import create_train_state, make_optimizer

    mesh = make_mesh(data=n_shards)
    f = 1433
    rng = np.random.default_rng(0)
    n, e = pad_n // 2, pad_e // 2  # live sizes; rest is padding
    x = (rng.random((n, f)) < 0.02).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = from_arrays(
        x, ei, y=rng.integers(0, 7, n), train_mask=np.ones(n, bool),
        node_norm=np.ones(n, np.float32),
        pad_nodes_to=pad_n, pad_edges_to=pad_e,
    )
    cfg = AMPGCNConfig(
        embedding_dim=emb, num_heads=heads, num_node_features=f,
        num_sampled_vectors=s, output_dim=7,
        feat_emb_dim=emb - 1, val_emb_dim=1,
    )
    model = AMPGCN(config=cfg)
    tx = make_optimizer(1e-3, cosine_t0=None)
    state = create_train_state(model, g, tx, seed=0)
    batch = shard_batch(stack_graphs([g] * n_shards), mesh)
    step = make_dp_train_step(model, mesh, loss_mode="saint")

    t0 = time.time()
    lowered = step.lower(state, batch)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"{name:24s} pad_n={pad_n} pad_e={pad_e} emb={emb} S={s} H={heads}"
          f"  lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s", flush=True)
    del compiled
    return t2 - t1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", nargs="+", default=None)
    p.add_argument("--partitioned", action="store_true",
                   help="probe the DP x graph-partitioned step instead")
    p.add_argument("--pallas", action="store_true",
                   help="with --partitioned: Pallas interpret-mode kernels")
    a = p.parse_args()
    force_cpu(8)
    import jax

    # cold compiles: no persistent cache
    jax.config.update("jax_compilation_cache_dir", None)

    # base tiny, then raise one knob at a time toward full scale
    pts = {
        "tiny":   (512, 2048, 16, 4, 2),
        "+edges": (512, 32768, 16, 4, 2),
        "+nodes": (4096, 2048, 16, 4, 2),
        "+emb":   (512, 2048, 128, 4, 4),
        "+S":     (512, 2048, 16, 20, 2),
        "mid":    (2048, 8192, 128, 20, 4),
        "full":   (4096, 32768, 128, 20, 4),
    }
    names = a.points or list(pts)
    for name in names:
        if a.partitioned:
            probe_partitioned(name, *pts[name], use_pallas=a.pallas)
        else:
            probe(name, *pts[name])




def probe_partitioned(name, pad_n, pad_e, emb, s, heads, n_devices=8,
                      use_pallas=False):
    """The dryrun/distributed-driver path: combined DP x graph-partitioned
    step. On CPU, use_pallas=True runs the kernels in Pallas INTERPRET
    mode, whose lowering is suspected to dominate the >30-min compile."""
    import jax

    from ampnet_tpu.core.config import AMPGCNConfig
    from ampnet_tpu.core.graph import from_arrays
    from ampnet_tpu.parallel.edge_partition import (
        make_dp_partitioned_train_step,
        partition_graph,
        partition_layouts,
        stack_layouts,
        stack_partitioned,
    )
    from ampnet_tpu.parallel.mesh import auto_mesh_shape, make_mesh
    from ampnet_tpu.train.optim import make_optimizer

    data, graph_shards = auto_mesh_shape(n_devices)
    mesh = make_mesh(data=data, graph=graph_shards)
    f = 1433
    rng = np.random.default_rng(0)
    n, e = pad_n // 2, pad_e // 2
    x = (rng.random((n, f)) < 0.02).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = from_arrays(
        x, ei, y=rng.integers(0, 7, n), train_mask=np.ones(n, bool),
        node_norm=np.ones(n, np.float32),
        pad_nodes_to=pad_n, pad_edges_to=pad_e,
    )
    cfg = AMPGCNConfig(
        embedding_dim=emb, num_heads=heads, num_node_features=f,
        num_sampled_vectors=s, output_dim=7,
        feat_emb_dim=emb - 1, val_emb_dim=1,
        use_pallas=use_pallas,
    )
    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.train import create_train_state

    model = AMPGCN(config=cfg)
    tx = make_optimizer(1e-3, cosine_t0=None)
    state = create_train_state(model, g, tx, seed=0)

    pgs = [partition_graph(g, graph_shards) for _ in range(data)]
    batch = stack_partitioned(pgs)
    tile_nodes = 64
    layouts = stack_layouts(
        [partition_layouts(pg, tile_nodes=tile_nodes) for pg in pgs]
    ) if use_pallas else None
    step = make_dp_partitioned_train_step(
        cfg, mesh, tx, loss_mode="saint",
        use_pallas=use_pallas, tile_nodes=tile_nodes,
        interpret=use_pallas,  # CPU: interpret mode
    )
    extra = (layouts,) if use_pallas else ()
    t0 = time.time()
    with mesh:
        lowered = step.lower(state.params, state.opt_state, batch,
                             jax.random.PRNGKey(0), *extra)
        t1 = time.time()
        compiled = lowered.compile()
    t2 = time.time()
    print(f"partitioned/{name:14s} pallas={use_pallas} pad_n={pad_n} pad_e={pad_e}"
          f" emb={emb} S={s} H={heads}  lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s",
          flush=True)

if __name__ == "__main__":
    main()
