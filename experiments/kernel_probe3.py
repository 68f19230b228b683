"""Kernel v3 feasibility probes + prototype timing.

P1: does Mosaic lower a BATCHED (3-D) dot_general inside a kernel?
    If yes, per-edge attention can run as [G, SP, dh] x [G, dh, SP]
    batched dots — every per-group tensor stays LINEAR in G (the v1/v2
    block-diag design pays (G*SP)^2 in scores/mask/exp, which is why
    round-1 G=16/32 measured 10-55% slower).
P2: does a vectorized gather (jnp.take with a traced index vector over a
    VMEM-resident value) lower now? (round-1: failed to lower)
P3: prototype v3 kernel (batched dots + compact softmax) timed at Cora
    scale for G in {8, 16, 32}.

Run on TPU; one device job at a time; DO NOT kill mid-stream.
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import time_fn  # noqa: E402  (enables compile cache)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ampnet_tpu.ops.pallas.format import build_tiled_csr  # noqa: E402

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


# ---------- P1: batched dot_general ----------

def probe_batched_dot():
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    g, m, k = 8, 24, 32
    a = jnp.asarray(np.random.default_rng(0).normal(size=(g, m, k)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(g, k, m)), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((g, m, m), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        ref = jnp.einsum("gmk,gkn->gmn", a, b)
        err = float(jnp.max(jnp.abs(out - ref)))
        log(f"P1 batched dot: LOWERS, max err {err:.2e}")
        return err < 1e-3
    except Exception as e:
        log(f"P1 batched dot: FAILS — {type(e).__name__}: {str(e)[:300]}")
        return False


# ---------- P2: vectorized gather ----------

def probe_vector_gather():
    def kernel(idx_ref, src_ref, o_ref):
        idx = idx_ref[0, :]                      # [R] traced row ids
        o_ref[:] = jnp.take(src_ref[:], idx, axis=0)

    n, r, d = 256, 64, 128
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (1, r)), jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r, d), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, src)
        ref = jnp.take(src, idx[0], axis=0)
        err = float(jnp.max(jnp.abs(out - ref)))
        log(f"P2 vector gather: LOWERS, max err {err:.2e}")
        return err < 1e-5
    except Exception as e:
        log(f"P2 vector gather: FAILS — {type(e).__name__}: {str(e)[:300]}")
        return False


# ---------- P3: v3 prototype (batched dots, compact softmax) ----------

def make_v3_kernel(s, sp, d, num_heads, group, emax, softmax=True):
    g = group
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)

    def kernel(ng_ref, senders_ref, recv_ref, valid_ref, q_ref, kv_ref,
               out_ref, acc_ref, qbuf_ref, kvbuf_ref):
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        # compact mask [G, SP_q, SP_k]: only real key tokens
        col_tok = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
        kmask = col_tok < s

        def body(gi, _):
            for j in range(g):
                idx = jnp.minimum(gi * g + j, emax - 1)
                ns = senders_ref[0, 0, idx]
                r = recv_ref[0, 0, idx]
                kvbuf_ref[pl.ds(j * sp, sp), :] = kv_ref[pl.ds(ns * sp, sp), :]
                qbuf_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(r * sp, sp), :]

            kv = kvbuf_ref[:].reshape(g, sp, 2 * d)
            q = qbuf_ref[:].reshape(g, sp, d)
            dtype = q.dtype
            out_heads = []
            for h in range(num_heads):
                qh = q[:, :, h * dh:(h + 1) * dh] * jnp.asarray(scale, dtype)
                kh = kv[:, :, h * dh:(h + 1) * dh]
                vh = kv[:, :, d + h * dh:d + (h + 1) * dh]
                scores = jax.lax.dot_general(
                    qh, kh, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [G, SP, SP] — LINEAR in G
                if softmax:
                    scores = jnp.where(kmask, scores, -jnp.inf)
                    m = jnp.max(scores, axis=2, keepdims=True)
                    e = jnp.exp(scores - m)
                    w = e / jnp.sum(e, axis=2, keepdims=True)
                else:
                    w = jnp.where(kmask, scores, 0.0)
                oh = jax.lax.dot_general(
                    w.astype(dtype), vh, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [G, SP, dh]
                out_heads.append(oh)
            msg = jnp.concatenate(out_heads, axis=2).reshape(g * sp, d)

            for j in range(g):
                idx = jnp.minimum(gi * g + j, emax - 1)
                r = recv_ref[0, 0, idx]
                dup = (gi * g + j) > idx
                val = jnp.where(dup, 0, valid_ref[0, 0, idx]).astype(jnp.float32)
                block = msg[j * sp:(j + 1) * sp, :] * val
                cur = acc_ref[pl.ds(r * sp, sp), :]
                acc_ref[pl.ds(r * sp, sp), :] = cur + block
            return 0

        jax.lax.fori_loop(0, ng_ref[0, pl.program_id(0)], body, 0)
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "tile_nodes", "group", "num_tiles", "emax", "s", "softmax"))
def run_v3(q_rows, kv_rows, ts, tr, tv, tc, *, num_heads, tile_nodes, group,
           num_tiles, emax, s, softmax=True):
    sp = q_rows.shape[0] // (num_tiles * tile_nodes)
    d = q_rows.shape[1]
    ngroups = ((tc.astype(jnp.int32) + group - 1) // group).reshape(1, num_tiles)
    kernel = make_v3_kernel(s, sp, d, num_heads, group, emax, softmax)
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


def main():
    results = {"p1_batched_dot": probe_batched_dot(),
               "p2_vector_gather": probe_vector_gather()}

    if results["p1_batched_dot"]:
        from experiments.kernel_bench2 import build
        tcsr, q_rows, kv_rows, meta = build()
        ts = jnp.asarray(tcsr.senders)[:, None, :]
        tr = jnp.asarray(tcsr.recv_local)[:, None, :]
        tv = jnp.asarray(tcsr.valid)[:, None, :]
        tc = jnp.asarray(tcsr.counts)
        e = meta["e"]
        # correctness vs v2 first
        from ampnet_tpu.ops.pallas.edge_attention_fused import _fused_edge_sums_v2
        ref = _fused_edge_sums_v2(q_rows, kv_rows, ts, tr, tv, tc,
                                  num_heads=4, softmax=True, tile_nodes=64,
                                  group=8, num_tiles=tcsr.num_tiles,
                                  emax=tcsr.edges_per_tile, s=meta["s"])
        for g in (8, 16, 32):
            try:
                out = run_v3(q_rows, kv_rows, ts, tr, tv, tc,
                             num_heads=4, tile_nodes=64, group=g,
                             num_tiles=tcsr.num_tiles,
                             emax=tcsr.edges_per_tile, s=meta["s"])
                err = float(jnp.max(jnp.abs(out - ref)))
                log(f"v3 g={g}: parity err {err:.2e}")
                t = time_fn(lambda q, g=g: run_v3(
                    q, kv_rows, ts, tr, tv, tc, num_heads=4, tile_nodes=64,
                    group=g, num_tiles=tcsr.num_tiles,
                    emax=tcsr.edges_per_tile, s=meta["s"]), q_rows)
                results[f"v3_g{g}_ms"] = round(t * 1e3, 4)
                log(f"v3 g={g}: {t*1e3:.3f} ms ({e/t/1e6:.2f} M edges/s)")
            except Exception as err:
                results[f"v3_g{g}_ms"] = f"ERROR {type(err).__name__}: {str(err)[:200]}"
                log(f"v3 g={g}: FAILED {type(err).__name__}: {str(err)[:300]}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
