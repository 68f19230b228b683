"""Time the PRODUCTION recipe's full train step on chip: tfidf S=40
sampling + hybrid raw-residual head + fused kernels (the configuration
RESULTS.md recommends: 0.874 +- 0.023 full-batch / 0.864 SAINT), with
the r5 transposed backward + inverse-CDF sampler.

The bench artifact times the reference's S=20 plain-AMPGCN step; this
records the shape users are told to run. Device-loop protocol.

Run: python experiments/production_step_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from ampnet_tpu.core.config import AMPGCNConfig
    from ampnet_tpu.core.graph import from_arrays
    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.ops.tokenize import fit_scaler
    from ampnet_tpu.train import create_train_state, make_optimizer
    from ampnet_tpu.train.state import make_train_step
    from ampnet_tpu.train.pallas_step import (
        compute_layout,
        default_edge_budget,
    )

    e = 10556
    n_g = 2712
    r2 = np.random.default_rng(0)
    xf = (r2.random((n_g, 1433)) < 0.02).astype(np.float32)
    xf[xf.sum(1) == 0, 0] = 1.0
    ei = np.stack([r2.integers(0, n_g, e), r2.integers(0, n_g, e)])
    graph = from_arrays(xf, ei, y=r2.integers(0, 7, n_g),
                        train_mask=np.ones(n_g, bool),
                        node_norm=np.ones(n_g, np.float32))
    budget = default_edge_budget(graph.num_edges_padded,
                                 -(-graph.num_nodes_padded // 256), slack=4.0)
    layout = compute_layout(graph, edges_per_tile=budget)
    cfg = AMPGCNConfig(
        num_sampled_vectors=40, token_sampling="tfidf",
        scaler="precomputed", dropout_rate=0.3, raw_residual="gcn2",
        use_pallas=True,
    )
    model = AMPGCN(config=cfg, scaler_stats=fit_scaler(xf))
    # the production loop's own step builder: model edge_layout path
    # (honors dropout_adj via edge_slot scatter), loss as the full-batch
    # hybrid driver runs it
    step = make_train_step(model, loss_mode="full")
    state = create_train_state(model, graph, make_optimizer(3e-3), seed=0)

    state, m = step(state, graph, layout)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, graph, layout)
    jax.block_until_ready(state.params)
    host_ms = (time.perf_counter() - t0) / 10 * 1e3

    @jax.jit
    def multi(st, k):
        def body(i, st):
            st2, _ = step(st, graph, layout)
            return st2
        return jax.lax.fori_loop(0, k, body, st)

    jax.block_until_ready(multi(state, 2).params)
    t0 = time.perf_counter()
    jax.block_until_ready(multi(state, 3).params)
    t1 = time.perf_counter()
    jax.block_until_ready(multi(state, 13).params)
    t2 = time.perf_counter()
    dev_ms = ((t2 - t1) - (t1 - t0)) / 10 * 1e3
    print(json.dumps({
        "recipe": "tfidf S=40 + hybrid gcn2 head, fused kernels, "
                  "full-batch Cora shapes",
        "ms_per_step_hostloop": round(host_ms, 2),
        "ms_per_step_deviceloop": round(dev_ms, 2),
        "loss_finite": bool(np.isfinite(float(m["loss"]))),
    }))


if __name__ == "__main__":
    main()
