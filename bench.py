"""Headline benchmark: edges/s/chip for the fused AMPNet edge attention.

Protocol (BASELINE.md): Cora-scale edge-attention layer — the op that
subsumes the SDDMM (per-edge attention scores) + SpMM (scatter-mean
aggregation) pair — at the reference's main config: D=128, H=4, S=20
tokens/node (experiments/cora_benchmark_graphsaint.py:58-82), full-Cora
edge count. `vs_baseline` is the speedup of this framework's optimized
path over a naive direct translation of the reference's compute order
(gather endpoints per edge, then project per edge — amp_conv.py:35-39),
both measured on the same chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

import numpy as np


def _enable_compile_cache():
    try:
        import jax

        cache_dir = os.environ.get(
            "AMPNET_JAX_CACHE", os.path.expanduser("~/.cache/jax_ampnet")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()


def build_inputs(n=2708, e=10556, s=20, d=128, seed=0, dtype="float32"):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    x = jnp.asarray(rng.normal(size=(n, s, d)).astype(np.float32), dtype=dt)
    senders = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    receivers = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))
    params = {
        "w_qkv": jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.05, dtype=dt),
        "b_qkv": jnp.asarray(np.zeros(3 * d, np.float32), dtype=dt),
        "w_out": jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.05, dtype=dt),
        "b_out": jnp.asarray(np.zeros(d, np.float32), dtype=dt),
    }
    return x, senders, receivers, params


def naive_reference_order(x, senders, receivers, p, num_heads):
    """Direct translation of the reference compute order: gather node
    tokens per edge FIRST, then run the full MHA per edge
    (amp_conv.py:35-39 + functional :4189-4444). Used as the baseline."""
    import jax.numpy as jnp
    from ampnet_tpu.ops.edge_attention import MHAParams, multihead_attention
    from ampnet_tpu.ops.segment import segment_count, segment_sum

    params = MHAParams(p["w_qkv"], p["b_qkv"], p["w_out"], p["b_out"])
    n = x.shape[0]
    q_in, kv_in = x[receivers], x[senders]
    msg, _ = multihead_attention(q_in, kv_in, kv_in, params, num_heads)
    total = segment_sum(msg, receivers, n)
    count = segment_count(receivers, n)
    return total / jnp.maximum(count, 1.0)[:, None, None]


def optimized(x, senders, receivers, p, num_heads):
    from ampnet_tpu.ops.edge_attention import MHAParams, amp_edge_attention

    params = MHAParams(p["w_qkv"], p["b_qkv"], p["w_out"], p["b_out"])
    out, _ = amp_edge_attention(
        x, senders, receivers, None, params, num_heads, return_weights=False
    )
    return out


_TIME_FN_SALT = [0]


def time_fn(fn, x, *args, k1=2, k2=32, iters=None, warmup=None):
    """Device-loop timing: run K chained iterations inside ONE jitted
    lax.fori_loop dispatch and difference two K values.

    Host wall-clock around individual dispatches is unreliable on
    tunneled/remote TPU runtimes (dedupe of repeated calls, multi-core
    fan-out, relay acks) — measured per-call times were non-linear in the
    iteration count. A single dispatch whose body chains each iteration's
    input through the previous output forces the device to execute every
    step; (T(k2) - T(k1)) / (k2 - k1) is pure per-iteration device time.

    Dedupe defenses (measured: the relay can serve a repeat-identical
    (program, args) dispatch from cache -> 0 ms): every TIMED dispatch
    uses k values never dispatched before in this process (a global salt;
    k is traced so the compiled program is shared), and the k contrast
    defaults to 30 iterations so the signal clears relay jitter.
    (iters/warmup accepted for API compat; unused.)
    """
    import jax

    def body(i, x):
        out = fn(x, *args)
        return x * 0.99 + out.astype(x.dtype) * 0.01

    @jax.jit
    def run(x, k):
        # k is TRACED: one compile serves every iteration count (compiles
        # through the TPU relay are expensive — minutes per program)
        return jax.lax.fori_loop(0, k, body, x)

    jax.block_until_ready(run(x, k1))  # compile + warm
    salt = _TIME_FN_SALT[0] = _TIME_FN_SALT[0] + 1
    ka, kb = k1 + 2 * salt, k2 + 2 * salt + 1  # fresh k values every call
    t0 = time.perf_counter()
    jax.block_until_ready(run(x, ka))
    t1 = time.perf_counter()
    jax.block_until_ready(run(x, kb))
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (kb - ka), 1e-9)


def _best_rep(ts, floor=0.25e-3):
    """Best credible repetition. Relay noise is strictly ADDITIVE
    (tenancy sharing, ack delays), so min-of-N estimates device time;
    the floor filters relay-dedupe artifacts that read as ~0 ms (no
    path through this op can execute in < 0.25 ms at Cora scale —
    the MXU-only lower bound is ~0.3 ms). Same estimator is applied
    to both the optimized and baseline paths, keeping vs_baseline fair.
    """
    ok = [t for t in ts if t > floor]
    return min(ok) if ok else sorted(ts)[len(ts) // 2]


def main():
    import sys

    import jax

    e = 10556
    h = 4
    iters = 10
    x, senders, receivers, params = build_inputs(e=e)

    # order: time the production (pallas) path FIRST so a partial run
    # still yields the headline number; the baseline follows
    t_naive = None
    t_opt = None
    try:
        from ampnet_tpu.ops.edge_attention import MHAParams
        from ampnet_tpu.ops.pallas.edge_attention_fused import (
            make_pallas_edge_attention,
            pallas_available,
        )

        if pallas_available():
            n = x.shape[0]
            # tile_nodes=256 (= DEFAULT_TILE_NODES, the library-wide
            # default since the probe12/13 backward-path A/B): fewer
            # partial edge groups per tile — probe11 (r3) measured 0.955x
            # vs tn=64 at Cora scale with exact parity; explicit here so
            # the bench geometry is pinned even if the default moves.
            fused = make_pallas_edge_attention(
                np.asarray(senders), np.asarray(receivers),
                np.ones(e, bool), n, h, tile_nodes=256,
            )
            p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])
            print("bench: timing fused Pallas path...", file=sys.stderr)
            opt_reps = sorted(time_fn(lambda xx: fused(xx, p), x, iters=iters)
                              for _ in range(5))
            t_opt = _best_rep(opt_reps)
            print(f"bench: pallas {t_opt*1e3:.2f} ms "
                  f"(5 reps: {['%.2f' % (u*1e3) for u in opt_reps]})", file=sys.stderr)
    except Exception as err:
        print(f"pallas path unavailable: {type(err).__name__}: {err}", file=sys.stderr)

    metric_path = "fused"
    if t_opt is None:
        opt_reps = []
        # fall back to the XLA-optimized path (node-level projections) —
        # and LABEL the metric accordingly, so a host without the Pallas
        # path never records XLA throughput under the fused kernel's name
        metric_path = "XLA"
        print("bench: timing XLA-optimized path...", file=sys.stderr)
        opt_reps = sorted(time_fn(
            lambda *a: optimized(*a, h), x, senders, receivers, params, iters=iters
        ) for _ in range(3))
        t_opt = _best_rep(opt_reps)
        print(f"bench: xla-optimized {t_opt*1e3:.2f} ms", file=sys.stderr)

    tns = []
    try:
        print("bench: timing naive reference-order baseline...", file=sys.stderr)
        tns = sorted(time_fn(
            lambda *a: naive_reference_order(*a, h), x, senders, receivers, params,
            iters=iters,
        ) for _ in range(3))
        t_naive = _best_rep(tns)
        print(f"bench: naive {t_naive*1e3:.2f} ms "
              f"(3 reps: {['%.2f' % (u*1e3) for u in tns]})", file=sys.stderr)
    except Exception as err:
        print(f"baseline timing failed: {type(err).__name__}: {err}", file=sys.stderr)

    def _disp(ts):
        """Dispersion fields: per-rep ms + median + spread, so the captured
        artifact explains its own session-tenancy drift (VERDICT r2 weak #1:
        BENCH_r02's 1.63 ms vs the 1.35 ms best was silent relay drift)."""
        if not ts:
            return None
        ms = [round(u * 1e3, 3) for u in ts]
        med = sorted(ms)[len(ms) // 2]
        return {
            "reps_ms": ms,
            "median_ms": med,
            "spread_pct": round(100.0 * (max(ms) - min(ms)) / med, 1),
        }

    # Secondary metric: the full fused TRAIN STEP (fwd + scatter-free
    # fused bwd + adam) at full-batch Cora shapes — captures the backward
    # line's state in the artifact (r4: scatter-free backward measured
    # 0.64x the stream backward at this scale, kernel_probe15).
    train_step = None
    if os.environ.get("AMPNET_BENCH_TRAIN", "1") == "1":
        try:
            print("bench: timing fused train step (full-batch Cora shapes)...",
                  file=sys.stderr)
            from ampnet_tpu.core.config import AMPGCNConfig
            from ampnet_tpu.core.graph import from_arrays
            from ampnet_tpu.models import AMPGCN
            from ampnet_tpu.train import create_train_state, make_optimizer
            from ampnet_tpu.train.pallas_step import (
                compute_layout,
                default_edge_budget,
                make_pallas_train_step,
            )

            rng = np.random.default_rng(0)
            n_g = 2712
            graphs = []
            for seed in range(4):
                r2 = np.random.default_rng(seed)
                xf = (r2.random((n_g, 1433)) < 0.02).astype(np.float32)
                xf[xf.sum(1) == 0, 0] = 1.0
                ei = np.stack([r2.integers(0, n_g, e), r2.integers(0, n_g, e)])
                graphs.append(from_arrays(
                    xf, ei, y=r2.integers(0, 7, n_g),
                    train_mask=np.ones(n_g, bool),
                    node_norm=np.ones(n_g, np.float32)))
            budget = default_edge_budget(
                graphs[0].num_edges_padded,
                -(-graphs[0].num_nodes_padded // 256), slack=4.0)
            layouts = [compute_layout(g, edges_per_tile=budget)
                       for g in graphs]
            cfg = AMPGCNConfig(dropout_rate=0.0, dropout_adj_rate=0.0)
            model = AMPGCN(config=cfg)
            step = make_pallas_train_step(model, loss_mode="saint")
            state = create_train_state(model, graphs[0], make_optimizer(1e-3),
                                       seed=0)
            state, _ = step(state, graphs[0], layouts[0])  # compile
            jax.block_until_ready(state.params)
            iters = 10
            t0 = time.perf_counter()
            for i in range(iters):
                state, _ = step(state, graphs[i % 4], layouts[i % 4])
            jax.block_until_ready(state.params)
            step_ms = (time.perf_counter() - t0) / iters * 1e3
            train_step = {
                "ms_per_step": round(step_ms, 2),
                "shape": "full-batch Cora (N=2712, E=10556, S=20, D=128, H=4)",
                "backward": "scatter-free two-pass (r4)",
            }
            print(f"bench: fused train step {step_ms:.2f} ms", file=sys.stderr)
        except Exception as err:
            print(f"train-step timing failed: {type(err).__name__}: {err}",
                  file=sys.stderr)

    edges_per_s = e / t_opt
    result = {
        "metric": f"edges/s/chip ({metric_path} AMPNet edge attention, Cora D=128 H=4 S=20)",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(t_naive / t_opt, 3) if t_naive else 1.0,
        "used_ms": round(t_opt * 1e3, 3),
        "optimized": _disp(opt_reps),
        "naive": _disp(tns),
        "train_step": train_step,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
