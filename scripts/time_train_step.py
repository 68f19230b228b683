"""Measure full train-step (fwd+bwd+opt) time: XLA path vs fused-forward
path, Cora-GraphSAINT-shaped subgraph. Run on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.expanduser("~/.cache/jax_ampnet")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.core.graph import from_arrays
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import create_train_state, make_optimizer, make_train_step
from ampnet_tpu.train.pallas_step import (
    compute_layout,
    default_edge_budget,
    make_pallas_train_step,
)


def make_graph(n=768, e=4096, f=1433, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.random((n, f)) < 0.02).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    return from_arrays(
        x, ei, y=rng.integers(0, 7, n), train_mask=np.ones(n, bool),
        node_norm=np.ones(n, np.float32),
    )


def timed(step_fn, make_state, graphs, extra=None, iters=10):
    # steps donate their input state — build a fresh one per timing run
    s = make_state()
    s, _ = step_fn(s, graphs[0], *(extra[0:1] if extra else []))
    jax.block_until_ready(s.params)
    t0 = time.perf_counter()
    for i in range(iters):
        g = graphs[i % len(graphs)]
        args = (extra[i % len(extra)],) if extra else ()
        s, m = step_fn(s, g, *args)
    jax.block_until_ready(s.params)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = AMPGCNConfig(dropout_rate=0.0, dropout_adj_rate=0.0)
    model = AMPGCN(config=cfg)
    # several different graphs so the relay can't dedupe
    graphs = [make_graph(seed=i) for i in range(4)]
    tx = make_optimizer(1e-3)

    def make_state():
        return create_train_state(model, graphs[0], tx, seed=0)

    xla_step = make_train_step(model, loss_mode="saint")
    t_xla = timed(xla_step, make_state, graphs)
    print(f"XLA train step: {t_xla*1e3:.2f} ms", flush=True)

    budget = default_edge_budget(graphs[0].num_edges_padded, graphs[0].num_nodes_padded // 64, slack=4.0)
    layouts = [compute_layout(g, tile_nodes=64, edges_per_tile=budget) for g in graphs]
    fused_step = make_pallas_train_step(model, loss_mode="saint")
    t_fused = timed(fused_step, make_state, graphs, extra=layouts)
    print(f"fused train step: {t_fused*1e3:.2f} ms  speedup {t_xla/t_fused:.2f}x", flush=True)


if __name__ == "__main__":
    main()
