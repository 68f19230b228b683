"""Headline benchmark: edges/s/chip for the fused AMPNet edge attention.

Protocol (BASELINE.md): Cora-scale edge-attention layer — the op that
subsumes the SDDMM (per-edge attention scores) + SpMM (scatter-mean
aggregation) pair — at the reference's main config: D=128, H=4, S=20
tokens/node (experiments/cora_benchmark_graphsaint.py:58-82), full-Cora
edge count. `vs_baseline` is the speedup of this framework's optimized
path over a naive direct translation of the reference's compute order
(gather endpoints per edge, then project per edge — amp_conv.py:35-39),
both measured on the same chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}, with
secondary fields: the full fused train step, the production S=40 shape
(the recommended tfidf recipe's token count), the 1M-edge scale rows
(AMPNET_BENCH_1M=0 to skip), and a roofline block per row — the
BASELINE.md "HBM-roofline speed-of-light" accounting (%_f32_peak and
%_measured_HBM from an explicit FLOP/byte model, stated in
conv_flops_bytes below so headroom claims are checkable).
"""
import json
import os
import time

import numpy as np

# TPU v5e (device_kind 'TPU v5 lite'): dense f32 peak and the HBM
# bandwidth MEASURED on this chip/toolchain (scripts/hbm_probe.py
# k-sweep copy: 659 GB/s effective vs 819 GB/s spec). Roofline percents
# use the measured figure — the spec ceiling is not attainable here.
F32_PEAK = 49.2e12
HBM_BW_MEASURED = 659e9


def conv_flops_bytes(n, e, s, d):
    """Useful-work FLOP/byte model of ONE fused AMPNet edge-attention op
    (QKV proj + per-edge attention + segment-mean + out proj), counting
    the real token count s (not the lane-padded SP — pad work is waste,
    and the roofline should say how far the USEFUL work is from the
    ceiling). FLOPs: qkv proj 6nsd^2 + out proj 2nsd^2; per-edge scores
    q@k^T 2s^2d + attn@v 2s^2d; aggregation adds e*s*d. Bytes (HBM):
    read x [n,s,d], write+read qkv [n,s,3d], per-edge K|V gather
    e*s*2d (the dma path's actual stream), write out [n,s,d]; f32."""
    flops = 8 * n * s * d * d + e * s * d * (4 * s + 1)
    bytes_ = 4 * (n * s * d + 2 * n * s * 3 * d + e * s * 2 * d + n * s * d)
    return flops, bytes_


def roofline(flops, bytes_, seconds):
    tf = flops / seconds
    gb = bytes_ / seconds
    return {
        "model_gflop": round(flops / 1e9, 2),
        "model_gbyte": round(bytes_ / 1e9, 3),
        "attained_tflops": round(tf / 1e12, 2),
        "pct_f32_peak": round(100.0 * tf / F32_PEAK, 1),
        "attained_gbps": round(gb / 1e9, 0),
        "pct_measured_hbm": round(100.0 * gb / HBM_BW_MEASURED, 1),
    }


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

    # Production shape: the recommended tfidf recipe samples S=40
    # tokens/node (RESULTS.md hybrid recipe) — the headline S=20 is the
    # reference's config, so the shape the framework actually recommends
    # gets its own row (VERDICT r4 weak #4).
    s40 = None
    try:
        from ampnet_tpu.ops.edge_attention import MHAParams
        from ampnet_tpu.ops.pallas.edge_attention_fused import (
            make_pallas_edge_attention,
            pallas_available,
        )

        if pallas_available() and os.environ.get("AMPNET_BENCH_S40", "1") == "1":
            x40, s40_senders, s40_receivers, p40 = build_inputs(e=e, s=40)
            n = x40.shape[0]
            fused40 = make_pallas_edge_attention(
                np.asarray(s40_senders), np.asarray(s40_receivers),
                np.ones(e, bool), n, h, tile_nodes=256,
            )
            pp40 = MHAParams(p40["w_qkv"], p40["b_qkv"], p40["w_out"], p40["b_out"])
            print("bench: timing S=40 production shape...", file=sys.stderr)
            reps40 = sorted(time_fn(lambda xx: fused40(xx, pp40), x40)
                            for _ in range(5))
            t40 = _best_rep(reps40, floor=0.4e-3)
            fl, by = conv_flops_bytes(n, e, 40, 128)
            s40 = {
                "ms": round(t40 * 1e3, 3),
                "edges_per_s": round(e / t40, 1),
                "dispersion": None,  # filled below once _disp is defined
                "_reps": reps40,
                "roofline": roofline(fl, by, t40),
            }
            print(f"bench: s40 {t40*1e3:.2f} ms", file=sys.stderr)
    except Exception as err:
        print(f"S=40 row failed: {type(err).__name__}: {err}", file=sys.stderr)

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
            host_ms = (time.perf_counter() - t0) / iters * 1e3

            # device-loop protocol: chain k steps inside ONE dispatch and
            # difference two never-seen k values — the host loop above
            # pays per-dispatch relay overhead that swings 20->74 ms/step
            # between sessions (RESULTS.md r5); state.rng advances every
            # step so the loop body cannot be CSE'd
            @jax.jit
            def multi(st, k):
                def body(i, st):
                    st2, _ = step(st, graphs[0], layouts[0])
                    return st2
                return jax.lax.fori_loop(0, k, body, st)

            jax.block_until_ready(multi(state, 2).params)
            t0 = time.perf_counter()
            jax.block_until_ready(multi(state, 3).params)
            t1 = time.perf_counter()
            jax.block_until_ready(multi(state, 13).params)
            t2 = time.perf_counter()
            step_ms = ((t2 - t1) - (t1 - t0)) / 10 * 1e3
            if not (0 < step_ms < host_ms * 2):
                step_ms = host_ms  # jitter guard: fall back to host loop
            # step model: 2 convs x 3 (fwd + bwd ~ 2x fwd); frontend/head
            # are <2% of FLOPs at these shapes and are left out
            fl, by = conv_flops_bytes(n_g, e, 20, 128)
            train_step = {
                "ms_per_step": round(step_ms, 2),
                "ms_per_step_hostloop": round(host_ms, 2),
                "shape": "full-batch Cora (N=2712, E=10556, S=20, D=128, H=4)",
                "backward": "scatter-free two-pass, transposed dKV layout (r5)",
                "roofline": roofline(6 * fl, 6 * by, step_ms / 1e3),
            }
            print(f"bench: fused train step {step_ms:.2f} ms device-loop "
                  f"({host_ms:.2f} host-loop)", file=sys.stderr)
        except Exception as err:
            print(f"train-step timing failed: {type(err).__name__}: {err}",
                  file=sys.stderr)

    # 1M-edge scale (N=100k, E=1M, dma-gather fused op): fwd + op-level
    # train step with the scatter-free backward — the RESULTS.md scale
    # rows, now with roofline fields in the driver-captured artifact.
    # Runs LAST so a relay wedge only loses the tail. AMPNET_BENCH_1M=0
    # skips (first compile without a warm persistent cache is ~8 min for
    # the step — see RESULTS.md AOT note).
    big = None
    if os.environ.get("AMPNET_BENCH_1M", "1") == "1" and metric_path == "fused":
        try:
            import jax.numpy as jnp
            import optax

            from ampnet_tpu.ops.edge_attention import MHAParams
            from ampnet_tpu.ops.pallas.edge_attention_fused import (
                amp_edge_attention_pallas,
            )
            from ampnet_tpu.ops.pallas.format import build_tiled_csr

            nb, eb, sb, db = 100_000, 1_000_000, 20, 128
            tn = 256
            rngb = np.random.default_rng(0)
            sd = rngb.integers(0, nb, eb).astype(np.int32)
            rc = rngb.integers(0, nb, eb).astype(np.int32)
            xb = jnp.asarray(rngb.normal(size=(nb, sb, db)) * 0.1, jnp.float32)
            pb = MHAParams(
                w_qkv=jnp.asarray(rngb.normal(size=(db, 3 * db)) * 0.05, jnp.float32),
                b_qkv=jnp.zeros((3 * db,), jnp.float32),
                w_out=jnp.asarray(rngb.normal(size=(db, db)) * 0.05, jnp.float32),
                b_out=jnp.zeros((db,), jnp.float32),
            )
            n_pad = -(-nb // tn) * tn
            tcsr = build_tiled_csr(sd, rc, np.ones(eb, bool), n_pad,
                                   tile_nodes=tn, group=8)
            stcsr = build_tiled_csr(rc, sd, np.ones(eb, bool), n_pad,
                                    tile_nodes=tn, group=8)
            kw = dict(
                snd_receivers=jnp.asarray(stcsr.senders),
                snd_local=jnp.asarray(stcsr.recv_local),
                snd_valid=jnp.asarray(stcsr.valid),
                snd_counts=jnp.asarray(stcsr.counts),
            )
            sd_j, rc_j = jnp.asarray(sd), jnp.asarray(rc)
            ts_ = jnp.asarray(tcsr.senders)
            tr_ = jnp.asarray(tcsr.recv_local)
            tv_ = jnp.asarray(tcsr.valid)

            def fwd_1m(x):
                return amp_edge_attention_pallas(
                    x, pb, sd_j, rc_j, None, ts_, tr_, tv_, h,
                    tile_nodes=tn, gather="dma", fused_bwd=True,
                    scatterfree=True, **kw,
                )

            print("bench: timing 1M-edge forward...", file=sys.stderr)
            t_fwd = _best_rep(sorted(
                time_fn(fwd_1m, xb, k1=1, k2=9) for _ in range(3)),
                floor=20e-3)
            fl1, by1 = conv_flops_bytes(nb, eb, sb, db)
            big = {
                "fwd_ms": round(t_fwd * 1e3, 1),
                "fwd_edges_per_s": round(eb / t_fwd, 1),
                "fwd_roofline": roofline(fl1, by1, t_fwd),
            }
            print(f"bench: 1M fwd {t_fwd*1e3:.1f} ms", file=sys.stderr)

            def loss_1m(x, p):
                out = amp_edge_attention_pallas(
                    x, p, sd_j, rc_j, None, ts_, tr_, tv_, h,
                    tile_nodes=tn, gather="dma", fused_bwd=True,
                    scatterfree=True, **kw,
                )
                return jnp.sum(out * out)

            txb = optax.adam(1e-3)

            @jax.jit
            def step_1m(x, p, opt_state):
                loss, (gx, gp) = jax.value_and_grad(loss_1m, argnums=(0, 1))(x, p)
                updates, opt_state = txb.update(gp, opt_state)
                p = optax.apply_updates(p, updates)
                return loss, x - 1e-3 * gx, p, opt_state

            print("bench: timing 1M-edge train step (compile may be slow "
                  "without a warm cache)...", file=sys.stderr)
            osb = txb.init(pb)
            t0 = time.perf_counter()
            loss, xx, pp2, osb = step_1m(xb, pb, osb)
            jax.block_until_ready(loss)
            compile_s = time.perf_counter() - t0
            iters_b = 4
            t0 = time.perf_counter()
            for _ in range(iters_b):
                loss, xx, pp2, osb = step_1m(xx, pp2, osb)
            jax.block_until_ready(loss)
            step_s = (time.perf_counter() - t0) / iters_b
            big["step_ms"] = round(step_s * 1e3, 1)
            big["step_compile_s"] = round(compile_s, 1)
            big["step_roofline"] = roofline(3 * fl1, 3 * by1, step_s)
            print(f"bench: 1M step {step_s*1e3:.1f} ms "
                  f"(first+compile {compile_s:.1f}s)", file=sys.stderr)
        except Exception as err:
            print(f"1M-edge rows failed: {type(err).__name__}: {err}",
                  file=sys.stderr)

    if s40 is not None:
        s40["dispersion"] = _disp(s40.pop("_reps"))

    edges_per_s = e / t_opt
    fl, by = conv_flops_bytes(x.shape[0], e, 20, 128)
    result = {
        "metric": f"edges/s/chip ({metric_path} AMPNet edge attention, Cora D=128 H=4 S=20)",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(t_naive / t_opt, 3) if t_naive else 1.0,
        "used_ms": round(t_opt * 1e3, 3),
        "roofline": roofline(fl, by, t_opt),
        "optimized": _disp(opt_reps),
        "naive": _disp(tns),
        "train_step": train_step,
        "s40_production_shape": s40,
        "scale_1m": big,
        "roofline_basis": {
            "f32_peak_tflops": F32_PEAK / 1e12,
            "hbm_gbps_measured": HBM_BW_MEASURED / 1e9,
            "note": "useful-work model (conv_flops_bytes docstring); "
                    "train steps modeled as 3x the constituent convs",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
