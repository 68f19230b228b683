"""On-device cost breakdown of the fused edge-attention kernel.

Times ablated variants of the vmem-gather kernel (ops/pallas/
edge_attention_fused.py::_fused_kernel_vmem) at Cora scale to attribute
the per-edge cost to: K|V gather copies, Q gather copies, the block-diag
attention matmuls, softmax, and the scatter-accumulate — and sweeps
group size / tile size. Informs the round-2 roofline push (VERDICT r1
next-round item 1).

Run on the TPU (one device job at a time):
    python experiments/kernel_ablation.py [--quick]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bench import build_inputs, time_fn  # noqa: E402
from ampnet_tpu.ops.pallas.format import build_tiled_csr  # noqa: E402


def make_kernel(s, sp, d, num_heads, group, emax, softmax=True,
                kv_gather=True, q_gather=True, attn=True, accum=True):
    g = group
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)

    def kernel(ng_ref, senders_ref, recv_ref, valid_ref, q_ref, kv_ref, out_ref,
               acc_ref, qbuf_ref, kvbuf_ref):
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

        blk_row = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 0) // sp
        blk_col = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) // sp
        col_tok = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) % sp
        block_mask = (blk_row == blk_col) & (col_tok < s)

        def body(gi, _):
            _group(gi)
            return 0

        def _group(gi):
            for j in range(g):
                idx = jnp.minimum(gi * g + j, emax - 1)
                if kv_gather:
                    ns = senders_ref[0, 0, idx]
                    kvbuf_ref[pl.ds(j * sp, sp), :] = kv_ref[pl.ds(ns * sp, sp), :]
                if q_gather:
                    r = recv_ref[0, 0, idx]
                    qbuf_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(r * sp, sp), :]

            kv = kvbuf_ref[:]
            q = qbuf_ref[:]
            dtype = q.dtype
            if attn:
                out_blocks = []
                for h in range(num_heads):
                    qh = q[:, h * dh:(h + 1) * dh] * jnp.asarray(scale, dtype)
                    kh = kv[:, h * dh:(h + 1) * dh]
                    vh = kv[:, d + h * dh:d + (h + 1) * dh]
                    scores = jax.lax.dot_general(
                        qh, kh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if softmax:
                        scores = jnp.where(block_mask, scores, -jnp.inf)
                        m = jnp.max(scores, axis=1, keepdims=True)
                        e = jnp.exp(scores - m)
                        w = e / jnp.sum(e, axis=1, keepdims=True)
                    else:
                        w = jnp.where(block_mask, scores, 0.0)
                    oh = jax.lax.dot_general(
                        w.astype(dtype), vh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out_blocks.append(oh)
                msg = jnp.concatenate(out_blocks, axis=1)
            else:
                msg = kv[:, :d].astype(jnp.float32)

            for j in range(g):
                idx = jnp.minimum(gi * g + j, emax - 1)
                r = recv_ref[0, 0, idx] if accum else 0
                dup = (gi * g + j) > idx
                val = jnp.where(dup, 0, valid_ref[0, 0, idx]).astype(jnp.float32)
                block = msg[j * sp:(j + 1) * sp, :] * val
                cur = acc_ref[pl.ds(r * sp, sp), :]
                acc_ref[pl.ds(r * sp, sp), :] = cur + block

        jax.lax.fori_loop(0, ng_ref[0, pl.program_id(0)], body, 0)
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "tile_nodes", "group", "num_tiles", "emax", "s", "softmax",
    "kv_gather", "q_gather", "attn", "accum"))
def run_variant(q_rows, kv_rows, ts, tr, tv, tc, *, num_heads, tile_nodes, group,
                num_tiles, emax, s, softmax=True, kv_gather=True,
                q_gather=True, attn=True, accum=True):
    sp = q_rows.shape[0] // (num_tiles * tile_nodes)
    d = q_rows.shape[1]
    ngroups = ((tc.astype(jnp.int32) + group - 1) // group).reshape(1, num_tiles)
    kernel = make_kernel(s, sp, d, num_heads, group, emax, softmax,
                         kv_gather, q_gather, attn, accum)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, num_tiles), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_nodes * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kv_rows.shape[0], 2 * d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_nodes * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tile_nodes * sp, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_nodes * sp, d), jnp.float32),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.VMEM((group * sp, 2 * d), kv_rows.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(ngroups, ts, tr, tv, q_rows, kv_rows)


def build(e=10556, n=2708, s=20, d=128, tile_nodes=64, group=8, seed=0):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    align = 8
    sp = -(-s // align) * align
    tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool),
                           -(-n // tile_nodes) * tile_nodes,
                           tile_nodes=tile_nodes, group=group)
    nt = tcsr.num_tiles * tcsr.tile_nodes
    q_rows = jnp.asarray(rng.normal(size=(nt * sp, d)), jnp.float32)
    kv_rows = jnp.asarray(rng.normal(size=(nt * sp, 2 * d)), jnp.float32)
    ts = jnp.asarray(tcsr.senders)[:, None, :]
    tr = jnp.asarray(tcsr.recv_local)[:, None, :]
    tv = jnp.asarray(tcsr.valid)[:, None, :]
    tc = jnp.asarray(tcsr.counts)
    return dict(q_rows=q_rows, kv_rows=kv_rows, ts=ts, tr=tr, tv=tv, tc=tc,
                num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile,
                tile_nodes=tile_nodes, s=s, sp=sp, d=d, e=e,
                padded_edges=tcsr.num_tiles * tcsr.edges_per_tile)


def timeit(inp, repeats=3, **kw):
    fn = lambda q: run_variant(
        q, inp["kv_rows"], inp["ts"], inp["tr"], inp["tv"], inp["tc"],
        num_heads=4, tile_nodes=inp["tile_nodes"], group=kw.pop("group", 8),
        num_tiles=inp["num_tiles"], emax=inp["emax"], s=inp["s"], **kw)
    ts = [time_fn(fn, inp["q_rows"], k1=4, k2=44) for _ in range(repeats)]
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    results = {}
    inp = build()
    print(f"# Cora-scale: E={inp['e']} padded_edges={inp['padded_edges']} "
          f"tiles={inp['num_tiles']} emax={inp['emax']} sp={inp['sp']}",
          flush=True)

    def rec(name, t):
        per_edge = t / inp["e"] * 1e9
        results[name] = {"ms": round(t * 1e3, 3), "ns_per_edge": round(per_edge, 1)}
        print(f"{name:35s} {t*1e3:8.3f} ms   {per_edge:7.1f} ns/edge", flush=True)

    rec("baseline (G=8 v2)", timeit(inp))
    rec("no softmax", timeit(inp, softmax=False))
    rec("no attn matmuls", timeit(inp, attn=False))
    rec("no kv gather", timeit(inp, kv_gather=False))
    rec("no q gather", timeit(inp, q_gather=False))
    rec("no scatter accum", timeit(inp, accum=False))
    rec("gathers only (no attn+accum)", timeit(inp, attn=False, accum=False))
    rec("empty-ish (no g/a/a)", timeit(inp, attn=False, accum=False,
                                       kv_gather=False, q_gather=False))

    if not args.quick:
        for tn in (32, 128):
            inp_t = build(tile_nodes=tn)
            rec(f"tile_nodes={tn}", timeit(inp_t))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
