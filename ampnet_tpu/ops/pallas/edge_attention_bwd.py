"""Fused backward pass for the Pallas edge-attention kernel.

Two-pass design (the sender-side scatter is the hard part — SURVEY §7.4):

  Pass A (Pallas, receiver-tiled like the forward): per edge group,
  recompute scores/softmax from the projected Q/K rows, then
    dV = W^T dMsg,  dW = dMsg V^T,  dS = softmax-bwd(dW),
    dQ = dS K * scale  (accumulated into the tile's receiver rows),
    dK = dS^T Q * scale,
  streaming per-edge dK|dV rows to an HBM output via async DMA.

  Pass B (XLA): segment-sum the dK|dV stream BY SENDER using the layout's
  flattened sender ids (masked by edge validity, so never-written rows of
  skipped padded groups are excluded), then standard matmuls for
  dX / dW_qkv / dW_out.

Parity vs jax.vjp of the XLA reference path is tested in
tests/test_pallas_bwd.py (interpret mode).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _bwd_kernel_vmem(
    ng_ref,        # SMEM [1, T] int32 live edge-GROUP trip counts (from
    #                STRUCTURAL counts — runtime masks may zero arbitrary
    #                slots, so a slot-0-validity skip would drop live
    #                edges' gradients and leave their stream rows garbage)
    senders_ref,   # SMEM [1, 1, EMAX]
    recv_ref,      # SMEM [1, 1, EMAX]
    valid_ref,     # SMEM [1, 1, EMAX] (may carry RUNTIME masks)
    q_ref,         # VMEM [TN*SP, D] this tile's projected Q rows
    kv_ref,        # VMEM [Nt*SP, 2D] projected K|V rows (resident)
    dsum_ref,      # VMEM [TN*SP, D] d(aggregated sums) rows for this tile
    dq_out_ref,    # VMEM [TN*SP, D] out: dQ accumulated per receiver
    dkv_stream,    # ANY  [T*EMAX*SP, 2D] out: per-edge dK|dV rows
    dqacc_ref,     # scratch VMEM [TN*SP, D] f32
    qbuf_ref,      # scratch VMEM [G*SP, D]
    kvbuf_ref,     # scratch VMEM [G*SP, 2D]
    dmbuf_ref,     # scratch VMEM [G*SP, D]
    dkvbuf_ref,    # scratch VMEM [2, G*SP, 2D] f32
    sems,          # DMA sems (2,)
    *,
    s: int,
    sp: int,
    d: int,
    num_heads: int,
    group: int,
    emax: int,
    softmax: bool,
):
    g = group
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    t = pl.program_id(0)
    ng = ng_ref[0, t]

    dqacc_ref[:] = jnp.zeros(dqacc_ref.shape, dqacc_ref.dtype)

    blk_row = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 0) // sp
    blk_col = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) // sp
    col_tok = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) % sp
    block_mask = (blk_row == blk_col) & (col_tok < s)

    def stream_dma(gi, slot):
        row0 = (t * emax + gi * g) * sp
        return pltpu.make_async_copy(
            dkvbuf_ref.at[slot],
            dkv_stream.at[pl.ds(row0, g * sp), :],
            sems.at[slot],
        )

    def body(gi, _):
        _group(gi)
        return 0

    def _group(gi):
        slot = jax.lax.rem(gi, 2)
        for j in range(g):
            ns = senders_ref[0, 0, gi * g + j]
            r = recv_ref[0, 0, gi * g + j]
            val = valid_ref[0, 0, gi * g + j].astype(q_ref.dtype)
            kvbuf_ref[pl.ds(j * sp, sp), :] = kv_ref[pl.ds(ns * sp, sp), :]
            qbuf_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(r * sp, sp), :]
            # invalid edges contribute nothing: zero their dMsg rows
            dmbuf_ref[pl.ds(j * sp, sp), :] = dsum_ref[pl.ds(r * sp, sp), :] * val

        q = qbuf_ref[:]
        kv = kvbuf_ref[:]
        dm = dmbuf_ref[:]
        dtype = q.dtype
        dq_blocks = []
        dk_blocks = []
        dv_blocks = []
        for h in range(num_heads):
            qh = q[:, h * dh : (h + 1) * dh]
            kh = kv[:, h * dh : (h + 1) * dh]
            vh = kv[:, d + h * dh : d + (h + 1) * dh]
            dmh = dm[:, h * dh : (h + 1) * dh]

            scores = jax.lax.dot_general(
                qh * jnp.asarray(scale, dtype), kh,
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            if softmax:
                scores = jnp.where(block_mask, scores, -jnp.inf)
                mx = jnp.max(scores, axis=1, keepdims=True)
                ex = jnp.exp(scores - mx)
                w = ex / jnp.sum(ex, axis=1, keepdims=True)
            else:
                w = jnp.where(block_mask, scores, 0.0)
            wt = w.astype(dtype)

            # dV = W^T dMsg  (contract over query rows)
            dv_h = jax.lax.dot_general(
                wt, dmh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            # dW = dMsg V^T
            dwm = jax.lax.dot_general(
                dmh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if softmax:
                tmp = dwm * w
                ds = w * (dwm - jnp.sum(tmp, axis=1, keepdims=True))
            else:
                ds = jnp.where(block_mask, dwm, 0.0)
            ds = ds.astype(dtype)
            dq_h = jax.lax.dot_general(
                ds, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            dk_h = jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            dq_blocks.append(dq_h)
            dk_blocks.append(dk_h)
            dv_blocks.append(dv_h)

        dq_g = jnp.concatenate(dq_blocks, axis=1)           # [G*SP, D] f32
        dkv_g = jnp.concatenate(dk_blocks + dv_blocks, axis=1)  # [G*SP, 2D]

        # wait for the previous stream write using this slot, then write
        @pl.when(gi >= 2)
        def _():
            stream_dma(gi - 2, slot).wait()
        dkvbuf_ref[slot] = dkv_g
        stream_dma(gi, slot).start()

        for j in range(g):
            r = recv_ref[0, 0, gi * g + j]
            val = valid_ref[0, 0, gi * g + j].astype(jnp.float32)
            block = dq_g[j * sp : (j + 1) * sp, :] * val
            cur = dqacc_ref[pl.ds(r * sp, sp), :]
            dqacc_ref[pl.ds(r * sp, sp), :] = cur + block

    jax.lax.fori_loop(0, ng, body, 0)

    # drain the last (up to 2) outstanding stream DMAs; the in-loop waits
    # covered groups < ng-2
    @pl.when(ng >= 1)
    def _():
        stream_dma(ng - 1, jax.lax.rem(ng - 1, 2)).wait()

    @pl.when(ng >= 2)
    def _():
        stream_dma(ng - 2, jax.lax.rem(ng - 2, 2)).wait()

    dq_out_ref[:] = dqacc_ref[:].astype(dq_out_ref.dtype)


def _bwd_kernel_vmem_v2(
    ng_ref,        # SMEM [1, T] int32: live edge-group counts (all tiles)
    senders_ref,   # SMEM [1, 1, EMAX]
    recv_ref,      # SMEM [1, 1, EMAX]
    valid_ref,     # SMEM [1, 1, EMAX] (may carry runtime masks)
    q_ref,         # VMEM [TN*SP, D]
    kv_ref,        # VMEM [Nt*SP, 2D] resident
    dsum_ref,      # VMEM [TN*SP, D]
    dq_out_ref,    # VMEM [TN*SP, D]
    dkv_stream,    # ANY  [T*EG*SP, 2D]; EG = ceil(EMAX/G)*G rows per tile
    dqacc_ref,     # scratch VMEM [TN*SP, D] f32
    qbuf_ref,      # scratch VMEM [G*SP, D]
    kvbuf_ref,     # scratch VMEM [G*SP, 2D]
    dmbuf_ref,     # scratch VMEM [G*SP, D]
    dkvbuf_ref,    # scratch VMEM [2, G*SP, 2D] f32
    sems,          # DMA sems (2,)
    *,
    s: int,
    sp: int,
    d: int,
    num_heads: int,
    group: int,
    emax: int,
    softmax: bool,
    compact: bool = True,
    packed: bool = True,
    stacked: bool = False,
):
    """v2 backward: dynamic per-tile trip count (see _fused_kernel_vmem_v2).

    The dkv stream is written per group at a GROUP-ALIGNED per-tile stride
    EG = ceil(EMAX/G)*G so a ragged final group never crosses into the
    next tile's rows; pass B masks the ragged slots via validity."""
    g = group
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    eg = -(-emax // g) * g
    t = pl.program_id(0)

    dqacc_ref[:] = jnp.zeros(dqacc_ref.shape, dqacc_ref.dtype)

    if not compact:
        blk_row = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 0) // sp
        blk_col = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) // sp
        col_tok = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) % sp
        block_mask = (blk_row == blk_col) & (col_tok < s)

    def stream_dma(gi, slot):
        row0 = (t * eg + gi * g) * sp
        return pltpu.make_async_copy(
            dkvbuf_ref.at[slot],
            dkv_stream.at[pl.ds(row0, g * sp), :],
            sems.at[slot],
        )

    def body(gi, _):
        slot = jax.lax.rem(gi, 2)
        # SMEM scalar reads cached across the gather and dq-accumulate
        # loops (traced values survive the Python loop boundary)
        r_cache, v_cache = [], []
        for j in range(g):
            idx = jnp.minimum(gi * g + j, emax - 1)
            ns = senders_ref[0, 0, idx]
            r = recv_ref[0, 0, idx]
            dup = (gi * g + j) > idx
            val = jnp.where(dup, 0, valid_ref[0, 0, idx]).astype(q_ref.dtype)
            r_cache.append(r)
            v_cache.append(val)
            kvbuf_ref[pl.ds(j * sp, sp), :] = kv_ref[pl.ds(ns * sp, sp), :]
            qbuf_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(r * sp, sp), :]
            # invalid/ragged edges contribute nothing: zero their dMsg rows
            dmbuf_ref[pl.ds(j * sp, sp), :] = dsum_ref[pl.ds(r * sp, sp), :] * val

        dtype = qbuf_ref.dtype
        if compact and stacked:
            # HEAD-STACKED body (mirrors the fwd kernel's stacked softmax):
            # heads ride the BATCH axis of the 3-D dots ([H*G, SP, dh]
            # stacks are axis-0 concats of the per-head lane slices), so
            # the softmax AND softmax-bwd chains each run ONCE over
            # [H*G, SP, SP] — 4x fewer VPU op invocations, exact per-head
            # reference numerics (no matmul denominators).
            q3 = qbuf_ref[:].reshape(g, sp, d)
            kv3 = kvbuf_ref[:].reshape(g, sp, 2 * d)
            dm3 = dmbuf_ref[:].reshape(g, sp, d)
            sc = jnp.asarray(scale, dtype)
            qs = jnp.concatenate(
                [q3[:, :, h * dh : (h + 1) * dh] for h in range(num_heads)],
                axis=0)
            ks = jnp.concatenate(
                [kv3[:, :, h * dh : (h + 1) * dh] for h in range(num_heads)],
                axis=0)
            vs = jnp.concatenate(
                [kv3[:, :, d + h * dh : d + (h + 1) * dh]
                 for h in range(num_heads)], axis=0)
            dms = jnp.concatenate(
                [dm3[:, :, h * dh : (h + 1) * dh] for h in range(num_heads)],
                axis=0)
            scores = jax.lax.dot_general(
                qs * sc, ks, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [H*G, SPq, SPk]
            col = jax.lax.broadcasted_iota(
                jnp.int32, (num_heads * g, sp, sp), 2)
            if softmax:
                ts_ = jnp.where(col < s, scores, -jnp.inf)
                mx = jnp.max(ts_, axis=2, keepdims=True)
                ex = jnp.exp(ts_ - mx)
                w = ex / jnp.sum(ex, axis=2, keepdims=True)
            else:
                w = jnp.where(col < s, scores, 0.0)
            wt = w.astype(dtype)
            dv_s = jax.lax.dot_general(
                wt, dms, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [H*G, SPk, dh]
            dwm = jax.lax.dot_general(
                dms, vs, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [H*G, SPq, SPk]
            if softmax:
                ds_ = w * (dwm - jnp.sum(dwm * w, axis=2, keepdims=True))
            else:
                ds_ = jnp.where(col < s, dwm, 0.0)
            ds_ = ds_.astype(dtype)
            dq_s = jax.lax.dot_general(
                ds_, ks, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [H*G, SPq, dh]
            dk_s = jax.lax.dot_general(
                ds_, qs, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale  # [H*G, SPk, dh]
            dq_g = jnp.concatenate(
                [dq_s[h * g : (h + 1) * g] for h in range(num_heads)], axis=2
            ).reshape(g * sp, d)
            dkv_g = jnp.concatenate(
                [dk_s[h * g : (h + 1) * g] for h in range(num_heads)]
                + [dv_s[h * g : (h + 1) * g] for h in range(num_heads)],
                axis=2,
            ).reshape(g * sp, 2 * d)
        elif compact and not packed:
            # batched (3-D) dots, one softmax/softmax-bwd chain PER HEAD
            # (exact reference numerics; the packed variant below trades a
            # matmul-computed denominator for fewer VPU passes — A/B'd on
            # the target chip, see RESULTS.md)
            q3 = qbuf_ref[:].reshape(g, sp, d)
            kv3 = kvbuf_ref[:].reshape(g, sp, 2 * d)
            dm3 = dmbuf_ref[:].reshape(g, sp, d)
            col_tok3 = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
            kmask = col_tok3 < s
            dq_heads, dk_heads, dv_heads = [], [], []
            for h in range(num_heads):
                qh = q3[:, :, h * dh : (h + 1) * dh]
                kh = kv3[:, :, h * dh : (h + 1) * dh]
                vh = kv3[:, :, d + h * dh : d + (h + 1) * dh]
                dmh = dm3[:, :, h * dh : (h + 1) * dh]
                scores = jax.lax.dot_general(
                    qh * jnp.asarray(scale, dtype), kh,
                    (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
                )  # [G, SPq, SPk]
                if softmax:
                    scores = jnp.where(kmask, scores, -jnp.inf)
                    mx = jnp.max(scores, axis=2, keepdims=True)
                    ex = jnp.exp(scores - mx)
                    w = ex / jnp.sum(ex, axis=2, keepdims=True)
                else:
                    w = jnp.where(kmask, scores, 0.0)
                wt = w.astype(dtype)
                dv_h = jax.lax.dot_general(
                    wt, dmh, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [G, SPk, dh]
                dwm = jax.lax.dot_general(
                    dmh, vh, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [G, SPq, SPk]
                if softmax:
                    tmp = dwm * w
                    ds = w * (dwm - jnp.sum(tmp, axis=2, keepdims=True))
                else:
                    ds = jnp.where(kmask, dwm, 0.0)
                ds = ds.astype(dtype)
                dq_heads.append(jax.lax.dot_general(
                    ds, kh, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale)  # [G, SPq, dh]
                dk_heads.append(jax.lax.dot_general(
                    ds, qh, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale)  # [G, SPk, dh]
                dv_heads.append(dv_h)
            dq_g = jnp.concatenate(dq_heads, axis=2).reshape(g * sp, d)
            dkv_g = jnp.concatenate(dk_heads + dv_heads, axis=2).reshape(
                g * sp, 2 * d
            )
        elif compact:
            # batched (3-D) dots keep every tensor [G, SP, *] — linear in
            # G; the elementwise softmax/softmax-bwd chains run ONCE over
            # the packed [G, SP, H*SP] width instead of per head (a VPU op
            # on <=128 lanes costs the same at any width — see the fwd
            # kernel's packed-heads softmax)
            q3 = qbuf_ref[:].reshape(g, sp, d)
            kv3 = kvbuf_ref[:].reshape(g, sp, 2 * d)
            dm3 = dmbuf_ref[:].reshape(g, sp, d)
            col_tok3 = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
            kmask = col_tok3 < s
            hsp = num_heads * sp

            score_heads = []
            for h in range(num_heads):
                qh = q3[:, :, h * dh : (h + 1) * dh]
                kh = kv3[:, :, h * dh : (h + 1) * dh]
                score_heads.append(jax.lax.dot_general(
                    qh * jnp.asarray(scale, dtype), kh,
                    (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
                ))  # [G, SPq, SPk]

            col_all = jax.lax.broadcasted_iota(jnp.int32, (g, sp, hsp), 2)
            kmask_all = (col_all % sp < s).astype(jnp.float32)
            scores_all = jnp.concatenate(score_heads, axis=2)
            if softmax:
                m = jnp.concatenate(
                    [jnp.broadcast_to(
                        jnp.max(jnp.where(kmask, sh, -jnp.inf), axis=2,
                                keepdims=True), (g, sp, sp))
                     for sh in score_heads], axis=2)
                e_all = jnp.exp(scores_all - m) * kmask_all
                seg = (jax.lax.broadcasted_iota(jnp.int32, (hsp, num_heads), 0) // sp
                       == jax.lax.broadcasted_iota(jnp.int32, (hsp, num_heads), 1)
                       ).astype(jnp.float32)
                sums = jax.lax.dot_general(
                    e_all, seg, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G, SP, H]
                inv = 1.0 / sums
                inv_all = jnp.concatenate(
                    [jnp.broadcast_to(inv[:, :, h : h + 1], (g, sp, sp))
                     for h in range(num_heads)], axis=2)
                w_all = e_all * inv_all
            else:
                w_all = scores_all * kmask_all

            dwm_heads = []
            dv_heads = []
            for h in range(num_heads):
                vh = kv3[:, :, d + h * dh : d + (h + 1) * dh]
                dmh = dm3[:, :, h * dh : (h + 1) * dh]
                wt = w_all[:, :, h * sp : (h + 1) * sp].astype(dtype)
                dv_heads.append(jax.lax.dot_general(
                    wt, dmh, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ))  # [G, SPk, dh]
                dwm_heads.append(jax.lax.dot_general(
                    dmh, vh, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ))  # [G, SPq, SPk]

            dwm_all = jnp.concatenate(dwm_heads, axis=2)
            if softmax:
                tmp = dwm_all * w_all
                rs = jax.lax.dot_general(
                    tmp, seg, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G, SP, H]
                rs_all = jnp.concatenate(
                    [jnp.broadcast_to(rs[:, :, h : h + 1], (g, sp, sp))
                     for h in range(num_heads)], axis=2)
                ds_all = w_all * (dwm_all - rs_all)
            else:
                ds_all = dwm_all * kmask_all

            dq_heads, dk_heads = [], []
            for h in range(num_heads):
                qh = q3[:, :, h * dh : (h + 1) * dh]
                kh = kv3[:, :, h * dh : (h + 1) * dh]
                ds_h = ds_all[:, :, h * sp : (h + 1) * sp].astype(dtype)
                dq_heads.append(jax.lax.dot_general(
                    ds_h, kh, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale)  # [G, SPq, dh]
                dk_heads.append(jax.lax.dot_general(
                    ds_h, qh, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale)  # [G, SPk, dh]
            dq_g = jnp.concatenate(dq_heads, axis=2).reshape(g * sp, d)
            dkv_g = jnp.concatenate(dk_heads + dv_heads, axis=2).reshape(
                g * sp, 2 * d
            )
        else:
            q = qbuf_ref[:]
            kv = kvbuf_ref[:]
            dm = dmbuf_ref[:]
            dq_blocks, dk_blocks, dv_blocks = [], [], []
            for h in range(num_heads):
                qh = q[:, h * dh : (h + 1) * dh]
                kh = kv[:, h * dh : (h + 1) * dh]
                vh = kv[:, d + h * dh : d + (h + 1) * dh]
                dmh = dm[:, h * dh : (h + 1) * dh]

                scores = jax.lax.dot_general(
                    qh * jnp.asarray(scale, dtype), kh,
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                )
                if softmax:
                    scores = jnp.where(block_mask, scores, -jnp.inf)
                    mx = jnp.max(scores, axis=1, keepdims=True)
                    ex = jnp.exp(scores - mx)
                    w = ex / jnp.sum(ex, axis=1, keepdims=True)
                else:
                    w = jnp.where(block_mask, scores, 0.0)
                wt = w.astype(dtype)

                dv_h = jax.lax.dot_general(
                    wt, dmh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                dwm = jax.lax.dot_general(
                    dmh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                if softmax:
                    tmp = dwm * w
                    ds = w * (dwm - jnp.sum(tmp, axis=1, keepdims=True))
                else:
                    ds = jnp.where(block_mask, dwm, 0.0)
                ds = ds.astype(dtype)
                dq_h = jax.lax.dot_general(
                    ds, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                ) * scale
                dk_h = jax.lax.dot_general(
                    ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                ) * scale
                dq_blocks.append(dq_h)
                dk_blocks.append(dk_h)
                dv_blocks.append(dv_h)

            dq_g = jnp.concatenate(dq_blocks, axis=1)
            dkv_g = jnp.concatenate(dk_blocks + dv_blocks, axis=1)

        @pl.when(gi >= 2)
        def _():
            stream_dma(gi - 2, slot).wait()
        dkvbuf_ref[slot] = dkv_g
        stream_dma(gi, slot).start()

        for j in range(g):
            r = r_cache[j]
            val = v_cache[j].astype(jnp.float32)
            block = dq_g[j * sp : (j + 1) * sp, :] * val
            cur = dqacc_ref[pl.ds(r * sp, sp), :]
            dqacc_ref[pl.ds(r * sp, sp), :] = cur + block
        return 0

    ng = ng_ref[0, pl.program_id(0)]
    jax.lax.fori_loop(0, ng, body, 0)

    # drain the last (up to 2) outstanding stream DMAs — trivial now that
    # the trip count is explicit (v1 had to re-derive it from packing)
    @pl.when(ng >= 1)
    def _():
        stream_dma(ng - 1, jax.lax.rem(ng - 1, 2)).wait()

    @pl.when(ng >= 2)
    def _():
        stream_dma(ng - 2, jax.lax.rem(ng - 2, 2)).wait()

    dq_out_ref[:] = dqacc_ref[:].astype(dq_out_ref.dtype)


def _bwd_kernel_dma(
    ng_ref,        # SMEM [1, T] int32 STRUCTURAL edge-group trip counts
    senders_ref, recv_ref, valid_ref,
    q_ref,         # VMEM [TN*SP, D]
    kv_hbm,        # ANY [N_all*SP, 2D] — too big for VMEM; DMA per edge
    dsum_ref,      # VMEM [TN*SP, D]
    dq_out_ref, dkv_stream,
    dqacc_ref, qbuf_ref, kvbuf_ref,  # kvbuf [2, G*SP, 2D]
    dmbuf_ref, dkvbuf_ref,
    gsems,         # DMA sems (2, G) — K|V gathers
    ssems,         # DMA sems (2,)   — stream writes
    *,
    s: int, sp: int, d: int, num_heads: int, group: int, emax: int,
    softmax: bool,
):
    """Production-scale backward: K|V rows DMA-gathered from HBM per edge
    group (double-buffered), mirroring the forward's 'dma' gather mode."""
    g = group
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    t = pl.program_id(0)
    ng = ng_ref[0, t]   # STRUCTURAL trip count: runtime masks may zero
    # arbitrary slots, so skipping on slot-0 validity would drop live
    # edges' dQ and leave their dK|dV stream rows uninitialized (and
    # desync the double-buffered stream-DMA waits)

    dqacc_ref[:] = jnp.zeros(dqacc_ref.shape, dqacc_ref.dtype)

    blk_row = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 0) // sp
    blk_col = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) // sp
    col_tok = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) % sp
    block_mask = (blk_row == blk_col) & (col_tok < s)

    def gather_dma(gi, slot, j):
        ns = senders_ref[0, 0, gi * g + j]
        return pltpu.make_async_copy(
            kv_hbm.at[pl.ds(ns * sp, sp), :],
            kvbuf_ref.at[slot, pl.ds(j * sp, sp), :],
            gsems.at[slot, j],
        )

    def start_gather(gi, slot):
        for j in range(g):
            gather_dma(gi, slot, j).start()

    def wait_gather(gi, slot):
        for j in range(g):
            gather_dma(gi, slot, j).wait()

    def stream_dma(gi, slot):
        row0 = (t * emax + gi * g) * sp
        return pltpu.make_async_copy(
            dkvbuf_ref.at[slot],
            dkv_stream.at[pl.ds(row0, g * sp), :],
            ssems.at[slot],
        )

    @pl.when(ng >= 1)
    def _():
        start_gather(0, 0)

    def body(gi, _):
        _group(gi)
        return 0

    def _group(gi):
        slot = jax.lax.rem(gi, 2)
        nxt = jax.lax.rem(gi + 1, 2)

        @pl.when(gi + 1 < ng)
        def _():
            start_gather(gi + 1, nxt)

        wait_gather(gi, slot)
        for j in range(g):
            r = recv_ref[0, 0, gi * g + j]
            val = valid_ref[0, 0, gi * g + j].astype(q_ref.dtype)
            qbuf_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(r * sp, sp), :]
            dmbuf_ref[pl.ds(j * sp, sp), :] = dsum_ref[pl.ds(r * sp, sp), :] * val

        q = qbuf_ref[:]
        kv = kvbuf_ref[slot]
        dm = dmbuf_ref[:]
        dtype = q.dtype
        dq_blocks, dk_blocks, dv_blocks = [], [], []
        for h in range(num_heads):
            qh = q[:, h * dh : (h + 1) * dh]
            kh = kv[:, h * dh : (h + 1) * dh]
            vh = kv[:, d + h * dh : d + (h + 1) * dh]
            dmh = dm[:, h * dh : (h + 1) * dh]
            scores = jax.lax.dot_general(
                qh * jnp.asarray(scale, dtype), kh,
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            if softmax:
                scores = jnp.where(block_mask, scores, -jnp.inf)
                mx = jnp.max(scores, axis=1, keepdims=True)
                ex = jnp.exp(scores - mx)
                w = ex / jnp.sum(ex, axis=1, keepdims=True)
            else:
                w = jnp.where(block_mask, scores, 0.0)
            wt = w.astype(dtype)
            dv_h = jax.lax.dot_general(
                wt, dmh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dwm = jax.lax.dot_general(
                dmh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if softmax:
                ds = w * (dwm - jnp.sum(dwm * w, axis=1, keepdims=True))
            else:
                ds = jnp.where(block_mask, dwm, 0.0)
            ds = ds.astype(dtype)
            dq_blocks.append(jax.lax.dot_general(
                ds, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale)
            dk_blocks.append(jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale)
            dv_blocks.append(dv_h)
        dq_g = jnp.concatenate(dq_blocks, axis=1)
        dkv_g = jnp.concatenate(dk_blocks + dv_blocks, axis=1)

        @pl.when(gi >= 2)
        def _():
            stream_dma(gi - 2, slot).wait()
        dkvbuf_ref[slot] = dkv_g
        stream_dma(gi, slot).start()

        for j in range(g):
            r = recv_ref[0, 0, gi * g + j]
            val = valid_ref[0, 0, gi * g + j].astype(jnp.float32)
            block = dq_g[j * sp : (j + 1) * sp, :] * val
            cur = dqacc_ref[pl.ds(r * sp, sp), :]
            dqacc_ref[pl.ds(r * sp, sp), :] = cur + block

    jax.lax.fori_loop(0, ng, body, 0)

    @pl.when(ng >= 1)
    def _():
        stream_dma(ng - 1, jax.lax.rem(ng - 1, 2)).wait()

    @pl.when(ng >= 2)
    def _():
        stream_dma(ng - 2, jax.lax.rem(ng - 2, 2)).wait()

    dq_out_ref[:] = dqacc_ref[:].astype(dq_out_ref.dtype)


def _bwd_kernel_dma_compact(
    ng_ref,        # SMEM [1, T] int32 STRUCTURAL edge-group trip counts
    senders_ref, recv_ref, valid_ref,
    q_ref,         # VMEM [TN*SP, D]
    kv_hbm,        # ANY [N_all*SP, 2D] — too big for VMEM; DMA per edge
    dsum_ref,      # VMEM [TN*SP, D]
    dq_out_ref, dkv_stream,
    dqacc_ref, qbuf_ref, kvbuf_ref,  # kvbuf [2, G*SP, 2D]
    dmbuf_ref, dkvbuf_ref,
    gsems,         # DMA sems (2, G) — K|V gathers
    ssems,         # DMA sems (2,)   — stream writes
    *,
    s: int, sp: int, d: int, num_heads: int, group: int, emax: int,
    softmax: bool,
):
    """Production-scale backward, COMPACT body: the v2 kernel's batched
    [G, SP, dh] x [G, dh, SP] per-head dots (scores/softmax-bwd linear in
    G — the block-diagonal _bwd_kernel_dma wastes (G-1)/G of that work)
    with _bwd_kernel_dma's double-buffered async K|V gathers from
    ANY/HBM. Groups are free of the G | EMAX packing contract (idx clamp
    + dup masking, as in _bwd_kernel_vmem_v2), so the stream is written
    at the GROUP-ALIGNED stride EG = ceil(EMAX/G)*G rows per tile; pass B
    masks ragged/unwritten slots via EG-padded validity."""
    g = group
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    eg = -(-emax // g) * g
    t = pl.program_id(0)
    ng = ng_ref[0, t]

    dqacc_ref[:] = jnp.zeros(dqacc_ref.shape, dqacc_ref.dtype)

    def gather_dma(gi, slot, j):
        idx = jnp.minimum(gi * g + j, emax - 1)
        ns = senders_ref[0, 0, idx]
        return pltpu.make_async_copy(
            kv_hbm.at[pl.ds(ns * sp, sp), :],
            kvbuf_ref.at[slot, pl.ds(j * sp, sp), :],
            gsems.at[slot, j],
        )

    def start_gather(gi, slot):
        for j in range(g):
            gather_dma(gi, slot, j).start()

    def wait_gather(gi, slot):
        for j in range(g):
            gather_dma(gi, slot, j).wait()

    def stream_dma(gi, slot):
        row0 = (t * eg + gi * g) * sp
        return pltpu.make_async_copy(
            dkvbuf_ref.at[slot],
            dkv_stream.at[pl.ds(row0, g * sp), :],
            ssems.at[slot],
        )

    @pl.when(ng >= 1)
    def _():
        start_gather(0, 0)

    col_tok3 = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
    kmask = col_tok3 < s

    def body(gi, _):
        slot = jax.lax.rem(gi, 2)
        nxt = jax.lax.rem(gi + 1, 2)

        @pl.when(gi + 1 < ng)
        def _():
            start_gather(gi + 1, nxt)

        wait_gather(gi, slot)
        r_cache, v_cache = [], []
        for j in range(g):
            idx = jnp.minimum(gi * g + j, emax - 1)
            r = recv_ref[0, 0, idx]
            dup = (gi * g + j) > idx
            val = jnp.where(dup, 0, valid_ref[0, 0, idx]).astype(q_ref.dtype)
            r_cache.append(r)
            v_cache.append(val)
            qbuf_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(r * sp, sp), :]
            # invalid/ragged edges contribute nothing: zero their dMsg rows
            dmbuf_ref[pl.ds(j * sp, sp), :] = dsum_ref[pl.ds(r * sp, sp), :] * val

        dtype = qbuf_ref.dtype
        q3 = qbuf_ref[:].reshape(g, sp, d)
        kv3 = kvbuf_ref[slot].reshape(g, sp, 2 * d)
        dm3 = dmbuf_ref[:].reshape(g, sp, d)
        dq_heads, dk_heads, dv_heads = [], [], []
        for h in range(num_heads):
            qh = q3[:, :, h * dh : (h + 1) * dh]
            kh = kv3[:, :, h * dh : (h + 1) * dh]
            vh = kv3[:, :, d + h * dh : d + (h + 1) * dh]
            dmh = dm3[:, :, h * dh : (h + 1) * dh]
            scores = jax.lax.dot_general(
                qh * jnp.asarray(scale, dtype), kh,
                (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
            )  # [G, SPq, SPk]
            if softmax:
                scores = jnp.where(kmask, scores, -jnp.inf)
                mx = jnp.max(scores, axis=2, keepdims=True)
                ex = jnp.exp(scores - mx)
                w = ex / jnp.sum(ex, axis=2, keepdims=True)
            else:
                w = jnp.where(kmask, scores, 0.0)
            wt = w.astype(dtype)
            dv_h = jax.lax.dot_general(
                wt, dmh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [G, SPk, dh]
            dwm = jax.lax.dot_general(
                dmh, vh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [G, SPq, SPk]
            if softmax:
                ds = w * (dwm - jnp.sum(dwm * w, axis=2, keepdims=True))
            else:
                ds = jnp.where(kmask, dwm, 0.0)
            ds = ds.astype(dtype)
            dq_heads.append(jax.lax.dot_general(
                ds, kh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale)  # [G, SPq, dh]
            dk_heads.append(jax.lax.dot_general(
                ds, qh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale)  # [G, SPk, dh]
            dv_heads.append(dv_h)
        dq_g = jnp.concatenate(dq_heads, axis=2).reshape(g * sp, d)
        dkv_g = jnp.concatenate(dk_heads + dv_heads, axis=2).reshape(
            g * sp, 2 * d
        )

        @pl.when(gi >= 2)
        def _():
            stream_dma(gi - 2, slot).wait()
        dkvbuf_ref[slot] = dkv_g
        stream_dma(gi, slot).start()

        for j in range(g):
            r = r_cache[j]
            val = v_cache[j].astype(jnp.float32)
            block = dq_g[j * sp : (j + 1) * sp, :] * val
            cur = dqacc_ref[pl.ds(r * sp, sp), :]
            dqacc_ref[pl.ds(r * sp, sp), :] = cur + block
        return 0

    jax.lax.fori_loop(0, ng, body, 0)

    @pl.when(ng >= 1)
    def _():
        stream_dma(ng - 1, jax.lax.rem(ng - 1, 2)).wait()

    @pl.when(ng >= 2)
    def _():
        stream_dma(ng - 2, jax.lax.rem(ng - 2, 2)).wait()

    dq_out_ref[:] = dqacc_ref[:].astype(dq_out_ref.dtype)


def fused_edge_bwd_v2(*args, packed=None, stacked=None, **kw):
    """Resolve env-default body flags OUTSIDE the jit boundary (static
    args resolved inside the traced function would let a flipped module
    default silently hit a stale cached program)."""
    from ampnet_tpu.ops.pallas import edge_attention_fused as _eaf

    if packed is None:
        packed = _eaf.PACKED_SOFTMAX_DEFAULT
    if stacked is None:
        stacked = _eaf.STACKED_SOFTMAX_DEFAULT
    return _fused_edge_bwd_v2_impl(*args, packed=packed, stacked=stacked, **kw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "softmax", "tile_nodes", "group", "num_tiles", "emax",
        "s", "interpret", "compact", "packed", "stacked",
    ),
)
def _fused_edge_bwd_v2_impl(
    q_rows: jnp.ndarray,      # [Nt*SP, D]
    kv_rows: jnp.ndarray,     # [Nt*SP, 2D]
    dsum_rows: jnp.ndarray,   # [Nt*SP, D]
    tile_senders: jnp.ndarray,  # [T, 1, EMAX]
    tile_recv: jnp.ndarray,
    tile_valid: jnp.ndarray,
    tile_counts: jnp.ndarray,   # [T] STRUCTURAL live-edge counts
    *,
    num_heads: int,
    softmax: bool,
    tile_nodes: int,
    group: int,
    num_tiles: int,
    emax: int,
    s: int,
    interpret: bool = False,
    compact: bool = True,
    packed: bool = False,
    stacked: bool = False,
):
    """v2 (dynamic trip counts): returns (dq_rows [Nt*SP, D] f32,
    dkv_stream [T*EG*SP, 2D] f32) with EG = ceil(EMAX/G)*G rows per tile.
    Never-executed groups leave their stream rows UNWRITTEN — pass B must
    mask by validity (padded to EG)."""
    sp = q_rows.shape[0] // (num_tiles * tile_nodes)
    d = q_rows.shape[1]
    tn = tile_nodes
    eg = -(-emax // group) * group
    ngroups = ((tile_counts.astype(jnp.int32) + group - 1) // group).reshape(
        1, num_tiles
    )
    kernel = functools.partial(
        _bwd_kernel_vmem_v2,
        s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
        softmax=softmax, compact=compact, packed=packed, stacked=stacked,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, num_tiles), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (kv_rows.shape[0], 2 * d), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles * tn * sp, d), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * eg * sp, 2 * d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tn * sp, d), jnp.float32),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.VMEM((group * sp, 2 * d), kv_rows.dtype),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.VMEM((2, group * sp, 2 * d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ngroups, tile_senders, tile_recv, tile_valid, q_rows, kv_rows, dsum_rows)


def pad_flat_to_eg(arr2d: jnp.ndarray, emax: int, group: int) -> jnp.ndarray:
    """[T, EMAX] layout array -> flat [T*EG] with zero/invalid padding in
    the ragged tail (pass-B companion of fused_edge_bwd_v2's stream)."""
    eg = -(-emax // group) * group
    if eg == emax:
        return arr2d.reshape(-1)
    t = arr2d.shape[0]
    return jnp.pad(arr2d, ((0, 0), (0, eg - emax))).reshape(t * eg)


def fused_edge_bwd(*args, dma_v1=None, **kw):
    """Resolve the env-default DMA body flag OUTSIDE the jit boundary
    (mirrors fused_edge_bwd_v2): the flag picks the kernel body AND the
    dkv_stream output stride (eg), so resolving it inside the traced
    function would let a flipped AMPNET_DMA_V1 / monkeypatched default
    silently reuse the stale compiled kernel in an in-process A/B."""
    from ampnet_tpu.ops.pallas import edge_attention_fused as _eaf

    if dma_v1 is None:
        dma_v1 = _eaf.DMA_V1_DEFAULT
    return _fused_edge_bwd_impl(*args, dma_v1=dma_v1, **kw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "softmax", "tile_nodes", "group", "num_tiles", "emax",
        "s", "gather", "interpret", "dma_v1",
    ),
)
def _fused_edge_bwd_impl(
    q_rows: jnp.ndarray,      # [Nt*SP, D]
    kv_rows: jnp.ndarray,     # [Nt*SP, 2D]
    dsum_rows: jnp.ndarray,   # [Nt*SP, D]
    tile_senders: jnp.ndarray,  # [T, 1, EMAX]
    tile_recv: jnp.ndarray,
    tile_valid: jnp.ndarray,
    *,
    num_heads: int,
    softmax: bool,
    tile_nodes: int,
    group: int,
    num_tiles: int,
    emax: int,
    s: int,
    gather: str = "vmem",
    interpret: bool = False,
    dma_v1: bool = False,
    tile_counts=None,  # [T] STRUCTURAL live-edge counts — REQUIRED when
    # tile_valid carries a runtime (dropout) mask: trip counts derived
    # from a holed mask would skip structurally-live tail groups
):
    """Returns (dq_rows [Nt*SP, D] f32, dkv_stream [T*EG*SP, 2D] f32),
    where EG = EMAX for the vmem/legacy-dma bodies (G | EMAX there) and
    EG = ceil(EMAX/G)*G for the compact dma body — compute the stride the
    same way in pass B."""
    sp = q_rows.shape[0] // (num_tiles * tile_nodes)
    d = q_rows.shape[1]
    tn = tile_nodes
    counts = (tile_counts if tile_counts is not None
              else jnp.sum((tile_valid != 0).astype(jnp.int32), axis=(1, 2)))
    ngroups = ((counts.astype(jnp.int32) + group - 1) // group).reshape(
        1, num_tiles)
    eg = emax
    if gather == "vmem":
        kernel = functools.partial(
            _bwd_kernel_vmem,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax,
        )
        kv_spec = pl.BlockSpec(
            (kv_rows.shape[0], 2 * d), lambda t: (0, 0), memory_space=pltpu.VMEM
        )
        scratch = [
            pltpu.VMEM((tn * sp, d), jnp.float32),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.VMEM((group * sp, 2 * d), kv_rows.dtype),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.VMEM((2, group * sp, 2 * d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        body = _bwd_kernel_dma if dma_v1 else _bwd_kernel_dma_compact
        if not dma_v1:
            eg = -(-emax // group) * group
        kernel = functools.partial(
            body,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax,
        )
        kv_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((tn * sp, d), jnp.float32),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.VMEM((2, group * sp, 2 * d), kv_rows.dtype),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.VMEM((2, group * sp, 2 * d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, group)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, num_tiles), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            kv_spec,
            pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles * tn * sp, d), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles * eg * sp, 2 * d), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ngroups, tile_senders, tile_recv, tile_valid, q_rows, kv_rows, dsum_rows)
