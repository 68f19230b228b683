"""Decompose the 24 ms full-batch Cora fused train step (bench.py's
train_step row) into fwd / backward / optimizer / op-level components.

Motivation: BENCH r5 rooflines say the fused conv FORWARD attains 56% of
measured HBM bandwidth but the full train STEP only ~17% — this probe
locates the gap before any tuning is attempted (r4 lesson: measure the
decomposition first; several plausible "optimizations" were flat).

Every number uses the device-loop protocol (k chained iterations inside
one dispatch, two never-before-dispatched k values differenced) because
host-loop timing through the TPU relay is unreliable (RESULTS.md).

Rows:
  conv_fwd        op-level fused edge-attention forward (bench headline)
  conv_fwd_bwd    op-level forward + VJP (scatter-free backward)
  model_fwd       full AMPGCN forward + SAINT loss (tokenizer, 2 convs, head)
  model_grad      value_and_grad of the same (no optimizer)
  full_step       grad + Adam apply_gradients (bench train_step row)

Run: python experiments/step_decomposition_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dev_loop(run, arg, k1=3, k2=13, salt=0):
    """Time run(arg, k) for two fresh k values; return per-iter seconds.

    k is traced by the caller's jit so one executable serves both; salt
    offsets the k pair so repeated probes never hit the relay dedupe.
    """
    import jax

    jax.block_until_ready(run(arg, k1 + salt))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run(arg, k1 + salt + 1))
    t1 = time.perf_counter()
    jax.block_until_ready(run(arg, k2 + salt + 1))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_inputs
    from ampnet_tpu.core.config import AMPGCNConfig
    from ampnet_tpu.core.graph import from_arrays
    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.ops.edge_attention import MHAParams
    from ampnet_tpu.train import create_train_state, make_optimizer
    from ampnet_tpu.train.losses import saint_weighted_nll
    from ampnet_tpu.train.pallas_step import (
        compute_layout,
        default_edge_budget,
        make_fused_fns,
        make_pallas_train_step,
    )
    from ampnet_tpu.train.state import split_rngs

    e, h = 10556, 4
    results = {}

    # --- model level: same construction as bench.py's train_step row ---
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
    cfg = AMPGCNConfig(dropout_rate=0.0, dropout_adj_rate=0.0)
    model = AMPGCN(config=cfg)
    state = create_train_state(model, graph, make_optimizer(1e-3), seed=0)

    # --- op level THROUGH THE STEP'S PATH: amp_edge_attention_pallas with
    # the sender layout (scatter-free backward engaged), exactly what the
    # train step's convs run — NOT make_pallas_edge_attention, whose VJP
    # recomputes through the XLA reference path (first probe run measured
    # that by mistake: 24.5 ms "op backward" that the step never executes)
    fusedL, _ = make_fused_fns(model, graph, layout)
    _, _, _, bparams = build_inputs(e=e)
    p = MHAParams(bparams["w_qkv"], bparams["b_qkv"], bparams["w_out"],
                  bparams["b_out"])
    n_pad = graph.num_nodes_padded
    rx = np.random.default_rng(7)
    x = jnp.asarray(rx.normal(size=(n_pad, cfg.num_sampled_vectors,
                                    cfg.embedding_dim)).astype(np.float32))

    @jax.jit
    def run_fwd(xx, k):
        def body(i, xx):
            return xx * 0.99 + fusedL(xx, p) * 0.01
        return jax.lax.fori_loop(0, k, body, xx)

    @jax.jit
    def run_fwd_bwd(xx, k):
        def body(i, xx):
            gx, gp = jax.grad(lambda u, q: fusedL(u, q).sum(),
                              argnums=(0, 1))(xx, p)
            # touch BOTH cotangents so neither backward kernel is DCE-able
            return (xx * 0.999 + gx * 1e-6
                    + jnp.sum(gp.w_out) * jnp.zeros_like(xx))
        return jax.lax.fori_loop(0, k, body, xx)

    results["conv_fwd_ms"] = min(
        dev_loop(run_fwd, x, salt=100 * r) for r in range(3)) * 1e3
    print(f"conv_fwd {results['conv_fwd_ms']:.2f} ms", file=sys.stderr)
    results["conv_fwd_bwd_ms"] = min(
        dev_loop(run_fwd_bwd, x, salt=100 * r + 31) for r in range(3)) * 1e3
    print(f"conv_fwd_bwd {results['conv_fwd_bwd_ms']:.2f} ms", file=sys.stderr)

    def loss_fn(params, rngs):
        fns = make_fused_fns(model, graph, layout)
        out = model.apply({"params": params}, graph, deterministic=False,
                          return_aux=False, rngs=rngs, fused_fns=fns)
        tm = graph.train_mask & graph.node_mask
        return saint_weighted_nll(out.logits, graph.y, graph.node_norm, tm)

    base_rng = state.rng

    @jax.jit
    def run_model_fwd(params, k):
        def body(i, params):
            _, rngs = split_rngs(jax.random.fold_in(base_rng, i))
            loss = loss_fn(params, rngs)
            # fold the loss into EVERY leaf so the body is not DCE/LICM-able
            # (first probe run matched on a leaf name that didn't exist and
            # the whole forward was eliminated: -0.7 "ms")
            return jax.tree_util.tree_map(
                lambda v: v * (1.0 + 0.0 * loss), params)
        return jax.lax.fori_loop(0, k, body, params)

    @jax.jit
    def run_model_grad(params, k):
        def body(i, params):
            _, rngs = split_rngs(jax.random.fold_in(base_rng, i))
            g = jax.grad(loss_fn)(params, rngs)
            return jax.tree_util.tree_map(lambda v, gv: v - 1e-9 * gv,
                                          params, g)
        return jax.lax.fori_loop(0, k, body, params)

    results["model_fwd_ms"] = min(
        dev_loop(run_model_fwd, state.params, salt=100 * r + 57)
        for r in range(3)) * 1e3
    print(f"model_fwd {results['model_fwd_ms']:.2f} ms", file=sys.stderr)
    results["model_grad_ms"] = min(
        dev_loop(run_model_grad, state.params, salt=100 * r + 83)
        for r in range(3)) * 1e3
    print(f"model_grad {results['model_grad_ms']:.2f} ms", file=sys.stderr)

    # --- full step (host loop, same protocol as bench.py's row) ---
    step = make_pallas_train_step(model, loss_mode="saint")
    state, _ = step(state, graph, layout)
    jax.block_until_ready(state.params)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, graph, layout)
    jax.block_until_ready(state.params)
    results["full_step_ms"] = (time.perf_counter() - t0) / iters * 1e3
    print(f"full_step {results['full_step_ms']:.2f} ms", file=sys.stderr)

    # derived attribution
    results["derived"] = {
        "conv_bwd_only_ms": round(
            results["conv_fwd_bwd_ms"] - results["conv_fwd_ms"], 2),
        "frontend_head_fwd_ms": round(
            results["model_fwd_ms"] - 2 * results["conv_fwd_ms"], 2),
        "backward_total_ms": round(
            results["model_grad_ms"] - results["model_fwd_ms"], 2),
        "conv_bwd_share_ms": round(
            2 * (results["conv_fwd_bwd_ms"] - results["conv_fwd_ms"]), 2),
        "adam_and_dispatch_ms": round(
            results["full_step_ms"] - results["model_grad_ms"], 2),
    }
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
