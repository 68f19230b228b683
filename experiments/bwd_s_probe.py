"""Why is the scatter-free backward's pass S (dK|dV) 5.5x pass R (dQ)?

bwd_pass_probe.py measured R=0.60 ms, S=3.30 ms at Cora shapes — but S
has only 4/3 the batched dots of R and the same gather/accumulate
structure. This probe sweeps the cheap knobs first (r2-r4 protocol:
measure before restructuring):

  * group size g for S (per-group fixed overhead amortizes differently
    with 4 dots + 2D-wide accumulate) and for R as control
  * softmax=False for both passes (isolates the exp/max/sum recompute)

Run: python experiments/bwd_s_probe.py
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


def best_ms(run, arg, reps=5):
    vals = sorted(dev_loop(run, arg, salt=1000 * r + 7) for r in range(reps))
    pos = [u for u in vals if u > 0]
    return (pos[0] if pos else float("nan")) * 1e3


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
    from ampnet_tpu.train.pallas_step import (
        compute_layout,
        default_edge_budget,
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
    _, _, _, bparams = build_inputs(e=e)
    p = MHAParams(bparams["w_qkv"], bparams["b_qkv"], bparams["w_out"],
                  bparams["b_out"])
    n_pad = graph.num_nodes_padded
    rx = np.random.default_rng(7)
    x = jnp.asarray(rx.normal(size=(n_pad, s, d)).astype(np.float32))

    sp = 24
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
    qdm_rows = jnp.concatenate([q_rows, dsum_rows], axis=1)
    ts3 = jnp.asarray(layout.tile_senders)[:, None, :]
    tr3 = jnp.asarray(layout.tile_recv)[:, None, :]
    tv3 = jnp.asarray(layout.tile_valid)[:, None, :]
    counts = jnp.asarray(layout.tile_counts)
    ss3 = jnp.asarray(layout.snd_receivers)[:, None, :]
    sl3 = jnp.asarray(layout.snd_local)[:, None, :]
    sv3 = jnp.asarray(layout.snd_valid)[:, None, :]
    scounts = jnp.asarray(layout.snd_counts)
    t_s, emax_s = layout.snd_receivers.shape

    def mk_s(g, softmax, vmem_mb=100):
        @jax.jit
        def run(q, k):
            def body(i, q):
                qdm = jnp.concatenate([q, dsum_rows], axis=1)
                dkv = fused_edge_bwd_dkv(
                    qdm, kv_rows, ss3, sl3, sv3, scounts,
                    num_heads=h, softmax=softmax, tile_nodes=tn, group=g,
                    num_tiles=t_s, emax=emax_s, s=s, gather="vmem",
                    vmem_limit_mb=vmem_mb)
                return q * 0.999 + dkv[:, :d].astype(q.dtype) * 1e-6
            return jax.lax.fori_loop(0, k, body, q)
        return run

    def mk_r(g, softmax):
        @jax.jit
        def run(q, k):
            def body(i, q):
                dq = fused_edge_bwd_dq(
                    q, kv_rows, dsum_rows, ts3, tr3, tv3, counts,
                    num_heads=h, softmax=softmax, tile_nodes=tn, group=g,
                    num_tiles=num_tiles, emax=emax, s=s, gather="vmem")
                return q * 0.999 + dq.astype(q.dtype) * 1e-6
            return jax.lax.fori_loop(0, k, body, q)
        return run

    rows = [
        ("s_g32", mk_s(32, True)),
        ("s_g64", mk_s(64, True, vmem_mb=112)),
        ("r_g32", mk_r(32, True)),
        ("r_g64", mk_r(64, True)),
        ("s_g32_b", mk_s(32, True)),   # repeat rows bracket session drift
        ("s_g64_b", mk_s(64, True, vmem_mb=112)),
    ]
    for name, run in rows:
        try:
            ms = best_ms(run, q_rows)
        except Exception as err:  # larger g can exceed the kernels' scoped
            # vmem limit (qdm resident + wider buffers) — record and move on
            results[name + "_error"] = f"{type(err).__name__}"
            print(f"{name} FAILED: {type(err).__name__}", file=sys.stderr)
            continue
        results[name + "_ms"] = round(ms, 3)
        print(f"{name} {ms:.3f} ms", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
