"""Pass-level timing of the scatter-free backward at Cora bench shapes.

step_decomposition_probe.py found the step is 61% conv backward (7.25 ms
per conv vs 0.59 ms forward — 12x). This probe splits that 7.25 ms into
pass R (dQ, receiver-tiled), pass S (dK|dV, sender-tiled), and the XLA
glue (projection recompute, out-proj grads, _finish_bwd), to find which
piece is below forward efficiency before attempting any restructuring
(r2-r4 lesson: measure first, most plausible rewrites were flat).

Run: python experiments/bwd_pass_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dev_loop(run, arg, k1=3, k2=33, salt=0):
    import jax

    jax.block_until_ready(run(arg, k1 + salt))
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
    from ampnet_tpu.ops.pallas.edge_attention_bwd_scatterfree import (
        fused_edge_bwd_dq,
        fused_edge_bwd_dkv,
    )
    from ampnet_tpu.ops.pallas.edge_attention_fused import _auto_group
    from ampnet_tpu.train import create_train_state, make_optimizer
    from ampnet_tpu.train.pallas_step import (
        compute_layout,
        default_edge_budget,
        make_fused_fns,
    )

    e, h, s, d = 10556, 4, 20, 128
    results = {}

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

    fusedL, _ = make_fused_fns(model, graph, layout)
    _, _, _, bparams = build_inputs(e=e)
    p = MHAParams(bparams["w_qkv"], bparams["b_qkv"], bparams["w_out"],
                  bparams["b_out"])
    n_pad = graph.num_nodes_padded
    rx = np.random.default_rng(7)
    x = jnp.asarray(rx.normal(size=(n_pad, s, d)).astype(np.float32))

    # shapes/arrays exactly as _pallas_bwd_dynamic builds them
    sp = -(-s // 8) * 8  # f32 stream align = 8 -> SP=24
    num_tiles, emax = layout.tile_senders.shape
    tn = 256
    nt = num_tiles * tn
    qkv = x @ p.w_qkv + p.b_qkv
    qkv = jnp.pad(qkv, ((0, 0), (0, sp - s), (0, 0)))
    q_rows = qkv[..., :d].reshape(n_pad * sp, d)
    kv_rows = qkv[..., d:].reshape(n_pad * sp, 2 * d)
    if nt > n_pad:
        pad = (nt - n_pad) * sp
        q_rows = jnp.pad(q_rows, ((0, pad), (0, 0)))
        kv_rows = jnp.pad(kv_rows, ((0, pad), (0, 0)))
    dsum_rows = jnp.asarray(
        rx.normal(size=(nt * sp, d)).astype(np.float32)) * 1e-2
    group = _auto_group(sp, emax, "vmem")
    ts3 = jnp.asarray(layout.tile_senders)[:, None, :]
    tr3 = jnp.asarray(layout.tile_recv)[:, None, :]
    tv3 = jnp.asarray(layout.tile_valid)[:, None, :]
    counts = jnp.asarray(layout.tile_counts)
    ss3 = jnp.asarray(layout.snd_receivers)[:, None, :]
    sl3 = jnp.asarray(layout.snd_local)[:, None, :]
    sv3 = jnp.asarray(layout.snd_valid)[:, None, :]
    scounts = jnp.asarray(layout.snd_counts)
    t_s, emax_s = layout.snd_receivers.shape
    group_s = _auto_group(sp, emax_s, "vmem")
    results["geometry"] = {
        "num_tiles": int(num_tiles), "emax": int(emax),
        "emax_s": int(emax_s), "group": int(group),
        "group_s": int(group_s), "sp": sp,
    }

    @jax.jit
    def run_dq(q, k):
        def body(i, q):
            dq = fused_edge_bwd_dq(
                q, kv_rows, dsum_rows, ts3, tr3, tv3, counts,
                num_heads=h, softmax=True, tile_nodes=tn, group=group,
                num_tiles=num_tiles, emax=emax, s=s, gather="vmem")
            return q * 0.999 + dq.astype(q.dtype) * 1e-6
        return jax.lax.fori_loop(0, k, body, q)

    @jax.jit
    def run_dkv(q, k):
        def body(i, q):
            qdm = jnp.concatenate([q, dsum_rows], axis=1)
            dkv = fused_edge_bwd_dkv(
                qdm, kv_rows, ss3, sl3, sv3, scounts,
                num_heads=h, softmax=True, tile_nodes=tn, group=group_s,
                num_tiles=t_s, emax=emax_s, s=s, gather="vmem")
            return q * 0.999 + dkv[:, :d].astype(q.dtype) * 1e-6
        return jax.lax.fori_loop(0, k, body, q)

    @jax.jit
    def run_vjp(xx, k):
        def body(i, xx):
            gx, gp = jax.grad(lambda u, q: fusedL(u, q).sum(),
                              argnums=(0, 1))(xx, p)
            return (xx * 0.999 + gx * 1e-6
                    + jnp.sum(gp.w_out) * jnp.zeros_like(xx))
        return jax.lax.fori_loop(0, k, body, xx)

    @jax.jit
    def run_fwd(xx, k):
        def body(i, xx):
            return xx * 0.99 + fusedL(xx, p) * 0.01
        return jax.lax.fori_loop(0, k, body, xx)

    for name, run, arg in [("pass_r_dq", run_dq, q_rows),
                           ("pass_s_dkv", run_dkv, q_rows),
                           ("full_vjp", run_vjp, x),
                           ("fwd", run_fwd, x)]:
        reps = sorted(dev_loop(run, arg, salt=1000 * r + 7) for r in range(5))
        # min positive rep: negative values are relay-jitter artifacts
        pos = [u for u in reps if u > 0]
        ms = (pos[0] if pos else float("nan")) * 1e3
        results[name + "_ms"] = round(ms, 2)
        print(f"{name} {ms:.2f} ms", file=sys.stderr)

    results["glue_ms"] = round(
        results["full_vjp_ms"] - results["pass_r_dq_ms"]
        - results["pass_s_dkv_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
