"""Data-parallel Cora GraphSAINT training.

The corrected TPU version of the reference's 2-process gloo DDP script
(experiments/cora_benchmark_graphsaint_distributed.py) — whose
`model(data)` bug (:83) silently disabled gradient sync, and whose
`start_time` NameError (:115) crashed rank 0. Here: one process, SPMD over
a 'data' mesh axis; each shard consumes its own GraphSAINT stream
(bs=20/wl=200/steps=10, Adam lr=1e-3, 30 epochs — :64-94); the gradient
all-reduce is inserted by XLA."""
import argparse
import time

import jax
import numpy as np

from common import cora_graph

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.data.graphsaint import GraphSaintRandomWalkSampler
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.parallel import make_dp_train_step, make_mesh, shard_batch, stack_graphs
from ampnet_tpu.train import create_train_state, make_eval_step, make_optimizer


def force_cpu_mesh(n_devices: int):
    """Run on an n-device virtual CPU mesh (this env's sitecustomize pins
    the TPU plugin, so the env var alone is not honored — same workaround
    as __graft_entry__.dryrun_multichip)."""
    import os
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    opt = f"--xla_force_host_platform_device_count={n_devices}"
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + opt).strip()
    else:
        os.environ["XLA_FLAGS"] = re.sub(
            r"--xla_force_host_platform_device_count=\d+", opt, flags)
    jax.config.update("jax_platforms", "cpu")


def main(epochs=30, steps=10, n_shards=None, tiny=False):
    start_time = time.time()
    d, full_g = cora_graph()
    n_shards = n_shards or len(jax.devices())
    mesh = make_mesh(data=n_shards)

    # per-shard independent GraphSAINT streams (reference :64-65, but with
    # explicit per-shard seeds instead of shared RNG state)
    # --tiny: smoke-scale config — the full Cora-scale DP program takes
    # >30 min of XLA *CPU* compile on a virtual 8-device mesh (fine on
    # real TPUs); tiny proves the driver end-to-end in ~a minute.
    pad_n, pad_e = (512, 2048) if tiny else (4096, 32768)
    samplers = [
        GraphSaintRandomWalkSampler(
            d.x, d.edge_index, y=d.y,
            train_mask=d.train_mask, val_mask=d.val_mask, test_mask=d.test_mask,
            batch_size=4 if tiny else 20, walk_length=20 if tiny else 200,
            num_steps=steps, sample_coverage=5 if tiny else 50,
            pad_nodes_to=pad_n, pad_edges_to=pad_e, seed=100 + i,
        )
        for i in range(n_shards)
    ]

    cfg = AMPGCNConfig(
        embedding_dim=16 if tiny else 128, num_heads=2 if tiny else 4,
        num_node_features=1433,
        num_sampled_vectors=4 if tiny else 20, output_dim=7,
        feat_emb_dim=15 if tiny else 127, val_emb_dim=1,
    )
    model = AMPGCN(config=cfg)
    tx = make_optimizer(1e-3, cosine_t0=None)
    state = create_train_state(model, samplers[0].sample(), tx, seed=0)
    step = make_dp_train_step(model, mesh, loss_mode="saint")
    eval_step = make_eval_step(model)

    for epoch in range(epochs):
        iters = [iter(s) for s in samplers]
        for _ in range(steps):
            batch = shard_batch(stack_graphs([next(it) for it in iters]), mesh)
            state, metrics = step(state, batch)
        print(
            f"epoch {epoch:3d} | loss {float(metrics['loss']):.4f} | "
            f"sub acc {float(metrics['train_acc']):.4f} | {time.time()-start_time:.1f}s"
        )
    final = eval_step(state.params, full_g, jax.random.PRNGKey(999))
    print(f"Final Test Accuracy: {float(final['test_acc']):.4f}")
    return state, final


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--shards", type=int, default=None)
    p.add_argument("--tiny", action="store_true",
                   help="smoke-scale config (~1 min end-to-end)")
    p.add_argument("--cpu", type=int, default=0, metavar="N",
                   help="run on an N-device virtual CPU mesh (full "
                        "Cora-scale compiles in ~3 s there via the XLA "
                        "conv path — measured r3, compile_probe.py "
                        "--partitioned)")
    a = p.parse_args()
    if a.cpu:
        force_cpu_mesh(a.cpu)
    main(a.epochs, a.steps, a.shards, tiny=a.tiny)
