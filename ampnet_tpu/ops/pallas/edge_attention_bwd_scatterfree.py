"""Scatter-free fused backward: two transposed-layout passes, no stream.

The original backward (edge_attention_bwd.py) streams per-edge dK|dV rows
to HBM (pass A) and segment-sums them by sender in XLA (pass B). At
production scale that stream is E*SP*2D*4 bytes — 24.6 GB per step at 1M
edges — which forced the tile-chunked fold machinery, and at every scale
it pays stream write + read + scatter traffic.

This module removes the stream entirely by running the backward as two
local-accumulation kernels over TRANSPOSED layouts (the same trick the
forward uses for the message aggregation):

  Pass R (receiver-tiled, the forward's layout): recompute per-edge
    scores/softmax, then dQ = softmax-bwd(dMsg V^T) K — accumulated into
    the tile's LOCAL receiver rows. K|V gathered by global sender
    (VMEM-resident or per-edge DMA), exactly like the forward. Skips the
    dK/dV matmuls and all stream DMA.

  Pass S (sender-tiled, the transposed layout from
    format.compute_layout(sender_layout=True)): recompute the same
    scores/softmax, then dV = W^T dMsg and dK = softmax-bwd^T Q —
    accumulated into the tile's LOCAL sender rows. Q and dMsg ride one
    packed [Q | dMsg] row array gathered by global receiver
    (VMEM-resident or per-edge DMA).

Cost model vs the stream backward: one extra score matmul + softmax
(-bwd) chain per edge, in exchange for zero stream write/read and zero
pass-B scatter; at DMA scale it also deletes the chunked-fold
accumulator traffic (~140 GB/step at 1M edges). A/B'd on chip —
see RESULTS.md (r4).

Validity semantics: gathers are UNMASKED (all inputs are finite —
padded token rows of the backward's q/dsum arrays are zero by
construction); each edge's output block is scaled by its validity
scalar at accumulate time, which zeroes invalid/ragged contributions
exactly because the batched per-edge dots never mix edges.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _edge_scalars(senders_ref, recv_ref, valid_ref, gi, g, emax):
    """Clamped SMEM reads for one edge group: (sender-col ids, local rows,
    validity with ragged duplicates zeroed)."""
    ids, rows, vals = [], [], []
    for j in range(g):
        idx = jnp.minimum(gi * g + j, emax - 1)
        dup = (gi * g + j) > idx
        ids.append(senders_ref[0, 0, idx])
        rows.append(recv_ref[0, 0, idx])
        vals.append(jnp.where(dup, 0, valid_ref[0, 0, idx]).astype(jnp.float32))
    return ids, rows, vals


def _dq_group_math(qbuf_ref, kvbuf, dmbuf_ref, *, g, sp, s, d, num_heads,
                   softmax, scale):
    """Per-group dQ math (compact per-head batched dots): recompute
    scores/softmax, dW = dMsg V^T, dS = softmax-bwd, dQ = dS K * scale.
    Returns dq_g [G*SP, D] f32."""
    dh = d // num_heads
    dtype = qbuf_ref.dtype
    q3 = qbuf_ref[:].reshape(g, sp, d)
    kv3 = kvbuf.reshape(g, sp, 2 * d)
    dm3 = dmbuf_ref[:].reshape(g, sp, d)
    col_tok3 = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
    kmask = col_tok3 < s
    dq_heads = []
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
        dwm = jax.lax.dot_general(
            dmh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, SPq, SPk]
        if softmax:
            ds = w * (dwm - jnp.sum(dwm * w, axis=2, keepdims=True))
        else:
            ds = jnp.where(kmask, dwm, 0.0)
        dq_heads.append(jax.lax.dot_general(
            ds.astype(dtype), kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale)  # [G, SPq, dh]
    return jnp.concatenate(dq_heads, axis=2).reshape(g * sp, d)


def _dkv_group_math(qdmbuf, kvbuf_ref, *, g, sp, s, d, num_heads, softmax,
                    scale):
    """Per-group dK|dV math: recompute scores/softmax from the packed
    [Q | dMsg] gather, then dV = W^T dMsg, dS = softmax-bwd(dMsg V^T),
    dK = dS^T Q * scale. Returns dkv_g [G*SP, 2D] f32.

    Everything runs in the TRANSPOSED score layout [G, SPk, SPq]
    (scoresT = K Q^T, softmax over the SUBLANE axis): the sender-side
    gradients contract over the QUERY-token axis, and in the straight
    layout those dV/dW^T dots were dim1-x-dim1 contractions that Mosaic
    lowers with a 3-D relayout per head per group — measured 5.5x pass
    R's per-dot cost at Cora shapes (experiments/bwd_s_probe.py; same
    relayout class probe10/r3 measured). In the transposed layout all
    four dots are native MXU orientations and no transpose is emitted.
    """
    dh = d // num_heads
    dtype = kvbuf_ref.dtype
    qdm3 = qdmbuf.reshape(g, sp, 2 * d)
    kv3 = kvbuf_ref[:].reshape(g, sp, 2 * d)
    # k tokens are ROWS here: mask/normalize over axis 1
    row_tok3 = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 1)
    rmask = row_tok3 < s
    dk_heads, dv_heads = [], []
    for h in range(num_heads):
        qh = qdm3[:, :, h * dh : (h + 1) * dh]
        dmh = qdm3[:, :, d + h * dh : d + (h + 1) * dh]
        kh = kv3[:, :, h * dh : (h + 1) * dh]
        vh = kv3[:, :, d + h * dh : d + (h + 1) * dh]
        scores_t = jax.lax.dot_general(
            kh, qh * jnp.asarray(scale, dtype),
            (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )  # [G, SPk, SPq]
        if softmax:
            scores_t = jnp.where(rmask, scores_t, -jnp.inf)
            mx = jnp.max(scores_t, axis=1, keepdims=True)
            ex = jnp.exp(scores_t - mx)
            w_t = ex / jnp.sum(ex, axis=1, keepdims=True)
        else:
            w_t = jnp.where(rmask, scores_t, 0.0)
        dv_heads.append(jax.lax.dot_general(
            w_t.astype(dtype), dmh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))  # [G, SPk, dh]
        dwm_t = jax.lax.dot_general(
            vh, dmh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, SPk, SPq]
        if softmax:
            ds_t = w_t * (dwm_t - jnp.sum(dwm_t * w_t, axis=1, keepdims=True))
        else:
            ds_t = jnp.where(rmask, dwm_t, 0.0)
        dk_heads.append(jax.lax.dot_general(
            ds_t.astype(dtype), qh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale)  # [G, SPk, dh]
    return jnp.concatenate(dk_heads + dv_heads, axis=2).reshape(g * sp, 2 * d)


# ---------------------------------------------------------------------------
# Pass R: dQ only, receiver-tiled
# ---------------------------------------------------------------------------

def _dq_kernel_vmem(
    ng_ref,        # SMEM [1, T] int32 STRUCTURAL edge-group trip counts
    senders_ref,   # SMEM [1, 1, EMAX] global sender ids
    recv_ref,      # SMEM [1, 1, EMAX] local receiver row
    valid_ref,     # SMEM [1, 1, EMAX] (may carry RUNTIME masks)
    q_ref,         # VMEM [TN*SP, D] this tile's projected Q rows
    kv_ref,        # VMEM [Nt*SP, 2D] projected K|V rows, fully resident
    dsum_ref,      # VMEM [TN*SP, D] d(aggregated sums) rows for this tile
    dq_out_ref,    # VMEM [TN*SP, D]
    dqacc_ref,     # scratch VMEM [TN*SP, D] f32
    qbuf_ref,      # scratch VMEM [G*SP, D]
    kvbuf_ref,     # scratch VMEM [G*SP, 2D]
    dmbuf_ref,     # scratch VMEM [G*SP, D]
    *,
    s: int, sp: int, d: int, num_heads: int, group: int, emax: int,
    softmax: bool,
):
    g = group
    scale = 1.0 / ((d // num_heads) ** 0.5)
    dqacc_ref[:] = jnp.zeros(dqacc_ref.shape, dqacc_ref.dtype)

    def body(gi, _):
        ids, rows, vals = _edge_scalars(senders_ref, recv_ref, valid_ref,
                                        gi, g, emax)
        for j in range(g):
            kvbuf_ref[pl.ds(j * sp, sp), :] = kv_ref[pl.ds(ids[j] * sp, sp), :]
            qbuf_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(rows[j] * sp, sp), :]
            dmbuf_ref[pl.ds(j * sp, sp), :] = (
                dsum_ref[pl.ds(rows[j] * sp, sp), :]
                * vals[j].astype(q_ref.dtype))
        dq_g = _dq_group_math(
            qbuf_ref, kvbuf_ref[:], dmbuf_ref,
            g=g, sp=sp, s=s, d=d, num_heads=num_heads, softmax=softmax,
            scale=scale)
        for j in range(g):
            block = dq_g[j * sp : (j + 1) * sp, :] * vals[j]
            cur = dqacc_ref[pl.ds(rows[j] * sp, sp), :]
            dqacc_ref[pl.ds(rows[j] * sp, sp), :] = cur + block
        return 0

    jax.lax.fori_loop(0, ng_ref[0, pl.program_id(0)], body, 0)
    dq_out_ref[:] = dqacc_ref[:].astype(dq_out_ref.dtype)


def _dq_kernel_dma(
    ng_ref, senders_ref, recv_ref, valid_ref,
    q_ref,         # VMEM [TN*SP, D]
    kv_hbm,        # ANY [N*SP, 2D] — DMA per edge
    dsum_ref,      # VMEM [TN*SP, D]
    dq_out_ref,
    dqacc_ref, qbuf_ref,
    kvbuf_ref,     # scratch VMEM [2, G*SP, 2D] (double-buffered)
    dmbuf_ref,
    gsems,         # DMA sems (2, G)
    *,
    s: int, sp: int, d: int, num_heads: int, group: int, emax: int,
    softmax: bool,
):
    g = group
    scale = 1.0 / ((d // num_heads) ** 0.5)
    ng = ng_ref[0, pl.program_id(0)]
    dqacc_ref[:] = jnp.zeros(dqacc_ref.shape, dqacc_ref.dtype)

    def gather_dma(gi, slot, j):
        idx = jnp.minimum(gi * g + j, emax - 1)
        ns = senders_ref[0, 0, idx]
        return pltpu.make_async_copy(
            kv_hbm.at[pl.ds(ns * sp, sp), :],
            kvbuf_ref.at[slot, pl.ds(j * sp, sp), :],
            gsems.at[slot, j],
        )

    @pl.when(ng >= 1)
    def _():
        for j in range(g):
            gather_dma(0, 0, j).start()

    def body(gi, _):
        slot = jax.lax.rem(gi, 2)
        nxt = jax.lax.rem(gi + 1, 2)

        @pl.when(gi + 1 < ng)
        def _():
            for j in range(g):
                gather_dma(gi + 1, nxt, j).start()

        for j in range(g):
            gather_dma(gi, slot, j).wait()
        _, rows, vals = _edge_scalars(senders_ref, recv_ref, valid_ref,
                                      gi, g, emax)
        for j in range(g):
            qbuf_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(rows[j] * sp, sp), :]
            dmbuf_ref[pl.ds(j * sp, sp), :] = (
                dsum_ref[pl.ds(rows[j] * sp, sp), :]
                * vals[j].astype(q_ref.dtype))
        dq_g = _dq_group_math(
            qbuf_ref, kvbuf_ref[slot], dmbuf_ref,
            g=g, sp=sp, s=s, d=d, num_heads=num_heads, softmax=softmax,
            scale=scale)
        for j in range(g):
            block = dq_g[j * sp : (j + 1) * sp, :] * vals[j]
            cur = dqacc_ref[pl.ds(rows[j] * sp, sp), :]
            dqacc_ref[pl.ds(rows[j] * sp, sp), :] = cur + block
        return 0

    jax.lax.fori_loop(0, ng, body, 0)
    dq_out_ref[:] = dqacc_ref[:].astype(dq_out_ref.dtype)


# ---------------------------------------------------------------------------
# Pass S: dK|dV only, sender-tiled
# ---------------------------------------------------------------------------

def _dkv_kernel_vmem(
    ng_ref,        # SMEM [1, T] int32 STRUCTURAL edge-group trip counts
    recvg_ref,     # SMEM [1, 1, EMAXS] GLOBAL receiver ids
    sndl_ref,      # SMEM [1, 1, EMAXS] LOCAL sender row
    valid_ref,     # SMEM [1, 1, EMAXS] (may carry RUNTIME masks)
    qdm_ref,       # VMEM [Nt*SP, 2D] packed [Q | dMsg] rows, fully resident
    kv_ref,        # VMEM [TN*SP, 2D] this tile's projected K|V rows
    dkv_out_ref,   # VMEM [TN*SP, 2D]
    dkvacc_ref,    # scratch VMEM [TN*SP, 2D] f32
    qdmbuf_ref,    # scratch VMEM [G*SP, 2D]
    kvbuf_ref,     # scratch VMEM [G*SP, 2D]
    *,
    s: int, sp: int, d: int, num_heads: int, group: int, emax: int,
    softmax: bool,
):
    g = group
    scale = 1.0 / ((d // num_heads) ** 0.5)
    dkvacc_ref[:] = jnp.zeros(dkvacc_ref.shape, dkvacc_ref.dtype)

    def body(gi, _):
        ids, rows, vals = _edge_scalars(recvg_ref, sndl_ref, valid_ref,
                                        gi, g, emax)
        for j in range(g):
            qdmbuf_ref[pl.ds(j * sp, sp), :] = qdm_ref[pl.ds(ids[j] * sp, sp), :]
            kvbuf_ref[pl.ds(j * sp, sp), :] = kv_ref[pl.ds(rows[j] * sp, sp), :]
        dkv_g = _dkv_group_math(
            qdmbuf_ref[:], kvbuf_ref,
            g=g, sp=sp, s=s, d=d, num_heads=num_heads, softmax=softmax,
            scale=scale)
        for j in range(g):
            block = dkv_g[j * sp : (j + 1) * sp, :] * vals[j]
            cur = dkvacc_ref[pl.ds(rows[j] * sp, sp), :]
            dkvacc_ref[pl.ds(rows[j] * sp, sp), :] = cur + block
        return 0

    jax.lax.fori_loop(0, ng_ref[0, pl.program_id(0)], body, 0)
    dkv_out_ref[:] = dkvacc_ref[:].astype(dkv_out_ref.dtype)


def _dkv_kernel_dma(
    ng_ref, recvg_ref, sndl_ref, valid_ref,
    qdm_hbm,       # ANY [Nt*SP, 2D] — DMA per edge
    kv_ref,        # VMEM [TN*SP, 2D] this tile's K|V rows
    dkv_out_ref,
    dkvacc_ref,
    qdmbuf_ref,    # scratch VMEM [2, G*SP, 2D] (double-buffered)
    kvbuf_ref,     # scratch VMEM [G*SP, 2D]
    gsems,         # DMA sems (2, G)
    *,
    s: int, sp: int, d: int, num_heads: int, group: int, emax: int,
    softmax: bool,
):
    g = group
    scale = 1.0 / ((d // num_heads) ** 0.5)
    ng = ng_ref[0, pl.program_id(0)]
    dkvacc_ref[:] = jnp.zeros(dkvacc_ref.shape, dkvacc_ref.dtype)

    def gather_dma(gi, slot, j):
        idx = jnp.minimum(gi * g + j, emax - 1)
        r = recvg_ref[0, 0, idx]
        return pltpu.make_async_copy(
            qdm_hbm.at[pl.ds(r * sp, sp), :],
            qdmbuf_ref.at[slot, pl.ds(j * sp, sp), :],
            gsems.at[slot, j],
        )

    @pl.when(ng >= 1)
    def _():
        for j in range(g):
            gather_dma(0, 0, j).start()

    def body(gi, _):
        slot = jax.lax.rem(gi, 2)
        nxt = jax.lax.rem(gi + 1, 2)

        @pl.when(gi + 1 < ng)
        def _():
            for j in range(g):
                gather_dma(gi + 1, nxt, j).start()

        for j in range(g):
            gather_dma(gi, slot, j).wait()
        _, rows, vals = _edge_scalars(recvg_ref, sndl_ref, valid_ref,
                                      gi, g, emax)
        for j in range(g):
            kvbuf_ref[pl.ds(j * sp, sp), :] = kv_ref[pl.ds(rows[j] * sp, sp), :]
        dkv_g = _dkv_group_math(
            qdmbuf_ref[slot], kvbuf_ref,
            g=g, sp=sp, s=s, d=d, num_heads=num_heads, softmax=softmax,
            scale=scale)
        for j in range(g):
            block = dkv_g[j * sp : (j + 1) * sp, :] * vals[j]
            cur = dkvacc_ref[pl.ds(rows[j] * sp, sp), :]
            dkvacc_ref[pl.ds(rows[j] * sp, sp), :] = cur + block
        return 0

    jax.lax.fori_loop(0, ng, body, 0)
    dkv_out_ref[:] = dkvacc_ref[:].astype(dkv_out_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "softmax", "tile_nodes", "group",
                     "num_tiles", "emax", "s", "gather", "interpret",
                     "vmem_limit_mb"),
)
def fused_edge_bwd_dq(
    q_rows: jnp.ndarray,      # [Nt*SP, D]
    kv_rows: jnp.ndarray,     # [Nt*SP, 2D]
    dsum_rows: jnp.ndarray,   # [Nt*SP, D]
    tile_senders: jnp.ndarray,  # [T, 1, EMAX]
    tile_recv: jnp.ndarray,
    tile_valid: jnp.ndarray,
    tile_counts: jnp.ndarray,   # [T] STRUCTURAL live-edge counts
    *,
    num_heads: int, softmax: bool, tile_nodes: int, group: int,
    num_tiles: int, emax: int, s: int, gather: str = "vmem",
    interpret: bool = False, vmem_limit_mb: int = 100,
):
    """Pass R: dQ accumulated per local receiver row. Returns dq_rows
    [Nt*SP, D] f32 — no dK|dV stream (pass S handles that side)."""
    sp = q_rows.shape[0] // (num_tiles * tile_nodes)
    d = q_rows.shape[1]
    tn = tile_nodes
    ngroups = ((tile_counts.astype(jnp.int32) + group - 1) // group).reshape(
        1, num_tiles)
    if gather == "vmem":
        kernel = functools.partial(
            _dq_kernel_vmem,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax)
        kv_spec = pl.BlockSpec(
            (kv_rows.shape[0], 2 * d), lambda t: (0, 0),
            memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((tn * sp, d), jnp.float32),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.VMEM((group * sp, 2 * d), kv_rows.dtype),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
        ]
    else:
        kernel = functools.partial(
            _dq_kernel_dma,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax)
        kv_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((tn * sp, d), jnp.float32),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.VMEM((2, group * sp, 2 * d), kv_rows.dtype),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.SemaphoreType.DMA((2, group)),
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
        out_specs=pl.BlockSpec((tn * sp, d), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tn * sp, d), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(ngroups, tile_senders, tile_recv, tile_valid, q_rows, kv_rows,
      dsum_rows)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "softmax", "tile_nodes", "group",
                     "num_tiles", "emax", "s", "gather", "interpret",
                     "vmem_limit_mb"),
)
def fused_edge_bwd_dkv(
    qdm_rows: jnp.ndarray,    # [Nt*SP, 2D] packed [Q | dMsg]
    kv_rows: jnp.ndarray,     # [Nt*SP, 2D]
    snd_receivers: jnp.ndarray,  # [T, 1, EMAXS] GLOBAL receiver ids
    snd_local: jnp.ndarray,      # [T, 1, EMAXS] LOCAL sender rows
    snd_valid: jnp.ndarray,
    snd_counts: jnp.ndarray,     # [T] STRUCTURAL live-edge counts
    *,
    num_heads: int, softmax: bool, tile_nodes: int, group: int,
    num_tiles: int, emax: int, s: int, gather: str = "vmem",
    interpret: bool = False, vmem_limit_mb: int = 100,
):
    """Pass S: dK|dV accumulated per local SENDER row over the transposed
    layout. Returns dkv_rows [Nt*SP, 2D] f32 in global node-row order
    (sender tiles cover the node range exactly like receiver tiles)."""
    sp = kv_rows.shape[0] // (num_tiles * tile_nodes)
    d = kv_rows.shape[1] // 2
    tn = tile_nodes
    ngroups = ((snd_counts.astype(jnp.int32) + group - 1) // group).reshape(
        1, num_tiles)
    if gather == "vmem":
        kernel = functools.partial(
            _dkv_kernel_vmem,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax)
        qdm_spec = pl.BlockSpec(
            (qdm_rows.shape[0], 2 * d), lambda t: (0, 0),
            memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((tn * sp, 2 * d), jnp.float32),
            pltpu.VMEM((group * sp, 2 * d), qdm_rows.dtype),
            pltpu.VMEM((group * sp, 2 * d), kv_rows.dtype),
        ]
    else:
        kernel = functools.partial(
            _dkv_kernel_dma,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax)
        qdm_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((tn * sp, 2 * d), jnp.float32),
            pltpu.VMEM((2, group * sp, 2 * d), qdm_rows.dtype),
            pltpu.VMEM((group * sp, 2 * d), kv_rows.dtype),
            pltpu.SemaphoreType.DMA((2, group)),
        ]
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, num_tiles), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            qdm_spec,
            pl.BlockSpec((tn * sp, 2 * d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn * sp, 2 * d), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tn * sp, 2 * d),
                                       jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
        ),
        interpret=interpret,
    )(ngroups, snd_receivers, snd_local, snd_valid, qdm_rows, kv_rows)
