"""Fused Pallas TPU kernel for AMPNet edge attention.

Fuses the whole message+aggregate pipeline the reference spreads across
PyG gather / nn.MultiheadAttention / torch_scatter (amp_conv.py:24-51):

    gather K/V node tokens per edge  ->  per-edge multi-head attention
    (optional softmax)               ->  per-receiver sum aggregation

into one kernel over a node-tile grid with a tiled-CSR edge layout
(ops/pallas/format.py). Per tile:

  * the tile's Q node tokens arrive as a pipelined VMEM block;
  * K/V rows of each edge's sender are DMA-gathered straight from the
    HBM-resident projected node array, double-buffered per edge group —
    no [E, S, D] gather materialization in HBM (the XLA path's dominant
    traffic);
  * per edge group of G edges, attention runs as BATCHED (3-D)
    [G, S, dh] x [G, dh, S] dots per head on the MXU — scores/softmax
    tensors linear in G (the round-1 block-diagonal [G*S, G*S] bodies,
    which waste (G-1)/G of that work, remain only behind AMPNET_DMA_V1
    for A/Bs);
  * messages scatter-accumulate into a VMEM accumulator, written to HBM
    once per tile.

QKV/out projections and the mean division stay in XLA (pure matmuls it
already schedules optimally). Public surfaces:

  * amp_edge_attention_pallas — drop-in for
    ops.edge_attention.amp_edge_attention with a DYNAMIC tiled-CSR layout
    (one executable across GraphSAINT subgraphs) and a fused Pallas
    backward by default (edge_attention_bwd.py; forward sums stashed as
    VJP residuals);
  * fused_attention_aggregate — attention+sum over pre-projected Q/K|V
    for the edge-partitioned multi-chip path (parallel/edge_partition.py);
  * make_pallas_edge_attention — fixed-structure closure for benchmarks.

Two gather modes: 'vmem' keeps the projected K|V resident in VMEM (fast;
fits to ~100k token-rows); 'dma' streams per-edge K|V rows from HBM with
double-buffered async copies (production scale — at 200k+ edges the XLA
path cannot even materialize its gather intermediates in HBM).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ampnet_tpu.ops.edge_attention import MHAParams, amp_edge_attention
from ampnet_tpu.ops.pallas.format import TiledCSR, build_tiled_csr, DEFAULT_TILE_NODES
from ampnet_tpu.ops.segment import segment_count

# Packed-heads softmax (one elementwise chain over [G,SP,H*SP]) vs
# per-head chains. The round-2 A/B (RESULTS.md) found the packed variant
# both SLOWER at Cora scale (the head-concat relayouts outweigh the saved
# VPU passes) and ~0.5% less accurate (its denominator comes from a
# dot_general, which the backend computes with bf16 multiplies at default
# precision) — so per-head is the default. AMPNET_PACKED_SOFTMAX=1 opts in.
PACKED_SOFTMAX_DEFAULT = os.environ.get("AMPNET_PACKED_SOFTMAX", "0") == "1"
STACKED_SOFTMAX_DEFAULT = os.environ.get("AMPNET_STACKED_SOFTMAX", "0") == "1"
# Edge-groups-on-LANES softmax (VERDICT r2 #2, the last untried layout):
# transpose each head's scores from [G, SP, SP] to [SP, SP, G] so the
# elementwise softmax chain runs with G on the 128-lane axis (full lane
# utilization at G>=128 vs SP=24 -> 18.75% in every SP-on-lanes layout).
# The two relayouts per head per group are the cost under measurement.
LANES_SOFTMAX_DEFAULT = os.environ.get("AMPNET_LANES_SOFTMAX", "0") == "1"
# v6 whole-layer fusion (in-kernel QKV/out projections): default ON for
# inference/primal forwards on the vmem path when the x + projected-K|V
# residents fit the VMEM budget
FUSE_PROJ_DEFAULT = os.environ.get("AMPNET_FUSE_PROJ", "1") == "1"
_V6_VMEM_LIMIT = int(os.environ.get("AMPNET_V6_VMEM_LIMIT", 120 * 1024 * 1024))
# Production-scale 'dma' gather body: default is dma-compact (the v4
# overlap body — compact batched dots + double-buffered async K|V+Q
# copies — reading K|V from the HBM-resident array: same kernel code,
# ANY memory space). AMPNET_DMA_V1=1 restores the round-1
# block-diagonal DMA kernel (g=8, [G*SP, G*SP] scores with 1/G useful
# work) for A/Bs.
DMA_V1_DEFAULT = os.environ.get("AMPNET_DMA_V1", "0") == "1"
# Direct VMEM loads for the Q side of the v4 dma body: the per-edge Q
# rows live in the TILE's own VMEM block (q_ref is BlockSpec-pipelined),
# so fetching them with async DMAs spends scalar-core issue slots on
# copies a vector load can do in-body — and probe16 showed the dma path
# is ISSUE-bound, not bandwidth-bound (bf16 streams with 2/3 the bytes
# measured 1.10x SLOWER). Probe17 A/Bs direct loads (half the issue
# count) against the double-buffered async Q.
DMA_DIRECT_Q_DEFAULT = os.environ.get("AMPNET_DMA_DIRECT_Q", "1") == "1"
# Scatter-as-matmul accumulate (v8 epilogue): buffer each tile's per-edge
# messages token-major and segment-sum them with one-hot MXU dots instead
# of the per-edge dynamic-row RMW loop — which probe19 (dma, 200k edges)
# and probe20 (vmem/v6, Cora) both measured at ~HALF the kernel. sel is
# exactly {0,1} (validity = select, mean = per-receiver row scale), so
# only the f32 summation ORDER changes vs the loop.
MM_SCATTER_DEFAULT = os.environ.get("AMPNET_MM_SCATTER", "0") == "1"
# bf16 MXU operands for the per-edge attention dots: f32 matmuls on TPU
# MXU run as multi-pass bf16 emulation, and the compact kernels' dots are
# tiny ([SP, dh] x [dh, SP] per group per head) — casting JUST the dot
# operands to bf16 (f32 accumulation via preferred_element_type, layouts
# and softmax untouched) cuts the emulation passes. Numerics: products
# round to bf16, matching XLA's DEFAULT matmul precision on TPU (the
# parity oracles pin 'highest', so this is opt-in).
MXU_BF16_DEFAULT = os.environ.get("AMPNET_MXU_BF16", "0") == "1"

# Scatter-free two-pass backward (edge_attention_bwd_scatterfree.py):
# active when the layout carries the transposed sender-tiled arrays
# (compute_layout(sender_layout=True)). AMPNET_SCATTERFREE_BWD=0 forces
# the dK|dV-stream backward for A/Bs.
SCATTERFREE_BWD_DEFAULT = os.environ.get("AMPNET_SCATTERFREE_BWD", "1") == "1"

# bf16 per-edge streams: cast the PROJECTED q/kv (+ dsum) row arrays to
# bfloat16 before the kernels, halving the per-edge gather traffic the
# dma path is bound by at production scale (kernel_probe16 A/B). The
# kernels are dtype-generic: scores take preferred_element_type=f32,
# softmax runs in f32, and every accumulator/output stays f32 — only the
# streamed rows round to bf16. Token rows pad to a 16-row stride (SP
# 24 -> 32 at S=20) so bf16 (16, 128) VMEM tiling keeps the per-node row
# slices aligned; net traffic is still 2/3 of f32-SP24. Opt-in (numerics
# move by bf16 input rounding — see tests/test_pallas.py bf16-stream
# tolerances).
STREAM_BF16_DEFAULT = os.environ.get("AMPNET_STREAM_BF16", "0") == "1"


def _stream_align(dtype, stream_bf16: bool) -> int:
    """Sublane row-stride alignment for the [N*SP, D] row arrays: bf16
    tiling is (16, 128), f32 is (8, 128)."""
    return 16 if (stream_bf16 or dtype == jnp.bfloat16) else 8


def _softmax_stack_bytes(group: int, sp: int, num_heads: int) -> int:
    """Estimate of the attention body's peak VMEM *stack* (Mosaic
    allocates kernel temporaries on a scoped stack, on top of the
    declared scratch). The softmax chain holds ~4 f32 arrays live whose
    LAST dim is padded to 128 lanes — at SP=24 that is a 5.3x inflation
    the pre-r2 guard missed: stacked g=96 at Cora scale needs ~18.5 MiB
    of stack (measured via the compiler's scoped-vmem error: 121.21 MiB
    total vs the 104.7 MiB the old formula predicted) and overflowed the
    120 MiB limit the guard had approved."""
    lane = 128

    def padded(rows_outer, rows_inner, cols):
        return rows_outer * rows_inner * (-(-cols // lane) * lane) * 4

    if LANES_SOFTMAX_DEFAULT:
        # chain holds [SP, SP, G] f32 temporaries (G on lanes, so G itself
        # pads to 128) plus the [G, SP, SP] score/weight layouts on either
        # side of the transposes
        return 3 * padded(sp, sp, group) + 3 * padded(group, sp, sp)
    if STACKED_SOFTMAX_DEFAULT:
        geff = num_heads * group       # chain runs over [H*G, SP, SP]
    elif PACKED_SOFTMAX_DEFAULT:
        return 4 * padded(group, sp, num_heads * sp)  # [G, SP, H*SP]
    else:
        geff = group                   # per-head: [G, SP, SP], heads serial
    return 4 * padded(geff, sp, sp)


def _v6_fits(n_rows: int, d: int, itemsize: int,
             tile_rows: int = 0, group_rows: int = 0,
             sp: int = 0, num_heads: int = 1) -> bool:
    """Full v6 VMEM accounting against the raised budget: x resident
    [R, D] + kvscr scratch [R, 2D] + weight blocks + the per-tile
    scratches (qscr, f32 acc, out block, gather buffers) + the softmax
    chain's lane-padded stack temporaries + 2 MB slack for Mosaic's own
    buffers."""
    resident = n_rows * 3 * d * itemsize                  # x + kvscr
    weights = (3 * d * d + d * d + 4 * d) * itemsize      # w_qkv/b/w_out/b
    per_tile = tile_rows * d * (2 * itemsize + 4)         # qscr + out + acc
    bufs = group_rows * 3 * d * itemsize                  # qbuf + kvbuf
    group = group_rows // max(sp, 1) if sp else 0
    stack = _softmax_stack_bytes(group, sp, num_heads) if sp else 0
    total = resident + weights + per_tile + bufs + stack + 2 * 1024 * 1024
    return total <= _V6_VMEM_LIMIT


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu",)
    except Exception:
        return False


def _fused_kernel(
    senders_ref,   # SMEM [1, 1, EMAX] int32 global sender ids (this tile)
    recv_ref,      # SMEM [1, 1, EMAX] int32 local receiver row
    valid_ref,     # SMEM [1, 1, EMAX] int32 0/1
    q_ref,         # VMEM [TN*S, D] this tile's Q rows
    kv_hbm,        # ANY  [N*S, 2D] projected K|V rows for all nodes
    out_ref,       # VMEM [TN*S, D] summed messages for this tile
    acc_ref,       # scratch VMEM [TN*S, D] f32
    qbuf_ref,      # scratch VMEM [G*S, D]
    kvbuf_ref,     # scratch VMEM [2, G*S, 2D]
    sems,          # DMA sems (2, G)
    *,
    s: int,       # real tokens per node
    sp: int,      # padded tokens per node (sublane-aligned row stride)
    d: int,
    num_heads: int,
    group: int,
    emax: int,
    softmax: bool,
):
    g = group
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    n_groups = emax // g

    def start_group(gi, slot):
        for j in range(g):
            ns = senders_ref[0, 0, gi * g + j]
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(ns * sp, sp), :],
                kvbuf_ref.at[slot, pl.ds(j * sp, sp), :],
                sems.at[slot, j],
            ).start()

    def wait_group(gi, slot):
        for j in range(g):
            ns = senders_ref[0, 0, gi * g + j]
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(ns * sp, sp), :],
                kvbuf_ref.at[slot, pl.ds(j * sp, sp), :],
                sems.at[slot, j],
            ).wait()

    acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    start_group(0, 0)

    # block-diagonal mask over padded token rows: same edge block AND a
    # real (non-pad) key column
    blk_row = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 0) // sp
    blk_col = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) // sp
    col_tok = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) % sp
    block_mask = (blk_row == blk_col) & (col_tok < s)

    def body(gi, _):
        slot = jax.lax.rem(gi, 2)
        nxt = jax.lax.rem(gi + 1, 2)

        @pl.when(gi + 1 < n_groups)
        def _():
            start_group(gi + 1, nxt)

        wait_group(gi, slot)

        # gather Q rows for this group's receivers
        for j in range(g):
            r = recv_ref[0, 0, gi * g + j]
            qbuf_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(r * sp, sp), :]

        kv = kvbuf_ref[slot]
        q = qbuf_ref[:]
        dtype = q.dtype
        out_blocks = []
        for h in range(num_heads):
            qh = q[:, h * dh : (h + 1) * dh] * jnp.asarray(scale, dtype)
            kh = kv[:, h * dh : (h + 1) * dh]
            vh = kv[:, d + h * dh : d + (h + 1) * dh]
            scores = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [G*S, G*S]
            if softmax:
                scores = jnp.where(block_mask, scores, -jnp.inf)
                m = jnp.max(scores, axis=1, keepdims=True)
                e = jnp.exp(scores - m)
                w = e / jnp.sum(e, axis=1, keepdims=True)
            else:
                w = jnp.where(block_mask, scores, 0.0)
            oh = jax.lax.dot_general(
                w.astype(dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G*S, Dh]
            out_blocks.append(oh)
        msg = jnp.concatenate(out_blocks, axis=1)  # [G*S, D] f32

        # scatter-accumulate per edge into the tile accumulator
        for j in range(g):
            r = recv_ref[0, 0, gi * g + j]
            val = valid_ref[0, 0, gi * g + j].astype(jnp.float32)
            block = msg[j * sp : (j + 1) * sp, :] * val
            cur = acc_ref[pl.ds(r * sp, sp), :]
            acc_ref[pl.ds(r * sp, sp), :] = cur + block
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)




def _fused_kernel_vmem(
    senders_ref,   # SMEM [1, 1, EMAX] int32 global sender ids (this tile)
    recv_ref,      # SMEM [1, 1, EMAX] int32 local receiver row
    valid_ref,     # SMEM [1, 1, EMAX] int32 0/1
    q_ref,         # VMEM [TN*SP, D] this tile's Q rows
    kv_ref,        # VMEM [N*SP, 2D] projected K|V rows, fully resident
    out_ref,       # VMEM [TN*SP, D] summed messages for this tile
    acc_ref,       # scratch VMEM [TN*SP, D] f32
    qbuf_ref,      # scratch VMEM [G*SP, D]
    kvbuf_ref,     # scratch VMEM [G*SP, 2D]
    *,
    s: int,
    sp: int,
    d: int,
    num_heads: int,
    group: int,
    emax: int,
    softmax: bool,
):
    """v1.5: K/V stay fully VMEM-resident (fits for graphs up to ~100k
    token-rows); per-edge gathers are direct VMEM dynamic-slice copies —
    no DMA issue overhead. Larger graphs use the DMA variant."""
    g = group
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    n_groups = emax // g

    acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    blk_row = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 0) // sp
    blk_col = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) // sp
    col_tok = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) % sp
    block_mask = (blk_row == blk_col) & (col_tok < s)

    def body(gi, _):
        # edges are packed: if the group's first edge is padding, so is the
        # rest of the tile — skip the whole group
        @pl.when(valid_ref[0, 0, gi * g] != 0)
        def _run_group():
            _group_body(gi)
        return 0

    def _group_body(gi):
        for j in range(g):
            ns = senders_ref[0, 0, gi * g + j]
            r = recv_ref[0, 0, gi * g + j]
            kvbuf_ref[pl.ds(j * sp, sp), :] = kv_ref[pl.ds(ns * sp, sp), :]
            qbuf_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(r * sp, sp), :]

        kv = kvbuf_ref[:]
        q = qbuf_ref[:]
        dtype = q.dtype
        out_blocks = []
        for h in range(num_heads):
            qh = q[:, h * dh : (h + 1) * dh] * jnp.asarray(scale, dtype)
            kh = kv[:, h * dh : (h + 1) * dh]
            vh = kv[:, d + h * dh : d + (h + 1) * dh]
            scores = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if softmax:
                scores = jnp.where(block_mask, scores, -jnp.inf)
                m = jnp.max(scores, axis=1, keepdims=True)
                e = jnp.exp(scores - m)
                w = e / jnp.sum(e, axis=1, keepdims=True)
            else:
                w = jnp.where(block_mask, scores, 0.0)
            oh = jax.lax.dot_general(
                w.astype(dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_blocks.append(oh)
        msg = jnp.concatenate(out_blocks, axis=1)

        for j in range(g):
            r = recv_ref[0, 0, gi * g + j]
            val = valid_ref[0, 0, gi * g + j].astype(jnp.float32)
            block = msg[j * sp : (j + 1) * sp, :] * val
            cur = acc_ref[pl.ds(r * sp, sp), :]
            acc_ref[pl.ds(r * sp, sp), :] = cur + block

    jax.lax.fori_loop(0, n_groups, body, 0)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _tile_attention_accumulate(
    ng,            # scalar int32: live edge-group trip count for this tile
    senders_ref,   # SMEM [1, 1, EMAX] int32 global sender ids
    recv_ref,      # SMEM [1, 1, EMAX] int32 local receiver row
    valid_ref,     # SMEM [1, 1, EMAX] int32 0/1 (may carry RUNTIME masks)
    q_src,         # VMEM ref [TN*SP, D] projected Q rows (input or scratch)
    kv_src,        # VMEM ref [N*SP, 2D] projected K|V rows (input or scratch)
    acc_ref,       # scratch VMEM [TN*SP, D] f32 accumulator
    qbuf_ref,      # scratch VMEM [G*SP, D]
    kvbuf_ref,     # scratch VMEM [G*SP, 2D]
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
    lanes: bool = False,
    invdeg_ref=None,  # SMEM [1, 1, TN] f32 — when given, each edge's
    # accumulate is pre-scaled by its receiver's 1/degree so acc holds the
    # segment MEAN (the v6 fused-epilogue path); degree-0 receivers carry 0
    ablate: str = "",  # timing ablations ONLY (kernel_probe19/20)
    mm_scatter: bool = False,  # scatter-as-matmul accumulate (v8): buffer
    # messages token-major and segment-sum via one-hot MXU dots instead of
    # per-edge dynamic-row RMWs (probe20: that loop is ~50% of the kernel)
    msgT_ref=None,     # scratch VMEM [SP, EG, D] f32 (mm_scatter)
    recv_eg_ref=None,  # VMEM [1, EG] int32 (mm_scatter)
    valid_eg_ref=None,  # VMEM [1, EG] int32 (mm_scatter)
    inv_col=None,      # [TN, 1, 1] f32 per-receiver 1/degree (mm_scatter
    # form of invdeg_ref: applied as a row scale after the scatter dots)
    mxu_bf16: bool = False,  # cast dot OPERANDS to bf16 (f32 accum)
):
    """Shared tile body: gather -> per-edge attention -> accumulate.

    The group loop runs a DYNAMIC per-tile trip count (ceil(live
    edges / G) from SMEM), so

      * fully-padded groups cost zero iterations (v1 paid a branch per
        group and relied on edges being packed);
      * any group size works (indices into the edge arrays are clamped to
        EMAX-1; the validity factor zeroes the ragged tail), so G can be
        chosen purely for MXU shape — G*SP <= 128 keeps each block-diag
        matmul inside one MXU lane-group;
      * edge validity is a pure multiplier, so a RUNTIME mask (adjacency
        dropout) scattered into `valid` is honored — trip counts must
        come from the STRUCTURAL layout, validity may be runtime.
    """
    g = group
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)

    if not mm_scatter:  # the mm epilogue overwrites acc in full
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    if not compact:
        blk_row = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 0) // sp
        blk_col = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) // sp
        col_tok = jax.lax.broadcasted_iota(jnp.int32, (g * sp, g * sp), 1) % sp
        block_mask = (blk_row == blk_col) & (col_tok < s)

    def body(gi, _):
        # SMEM scalar reads are cached across the gather and scatter
        # loops (the traced values survive the Python loop boundary) —
        # re-reading idx/r/valid in the scatter loop doubled the
        # per-edge scalar-op count.
        rs, vals = [], []
        for j in range(g):
            idx = jnp.minimum(gi * g + j, emax - 1)
            ns = senders_ref[0, 0, idx]
            r = recv_ref[0, 0, idx]
            if not mm_scatter:
                # clamped duplicate slots re-read a live edge; the guard
                # zeroes them so they contribute nothing. (mm_scatter
                # needs neither: validity/dup-zeroing fold into the
                # one-hot sel, the mean into inv_col.)
                dup = (gi * g + j) > idx
                v = jnp.where(dup, 0,
                              valid_ref[0, 0, idx]).astype(jnp.float32)
                if invdeg_ref is not None:
                    # scalar x scalar: folds the mean normalization into
                    # the existing validity multiply at zero extra
                    # vector work
                    v = v * invdeg_ref[0, 0, r]
                vals.append(v)
            rs.append(r)
            if "nogather" not in ablate:
                kvbuf_ref[pl.ds(j * sp, sp), :] = kv_src[pl.ds(ns * sp, sp), :]
                qbuf_ref[pl.ds(j * sp, sp), :] = q_src[pl.ds(r * sp, sp), :]

        dtype = qbuf_ref.dtype
        mdt = jnp.bfloat16 if mxu_bf16 else dtype
        if compact and stacked:
            # HEAD-STACKED compact body: heads ride the BATCH axis of one
            # 3-D dot ([H*G, SP, dh] stacks are axis-0 concats of the same
            # per-head lane slices the per-head body feeds its dots), so
            # the whole softmax is ONE elementwise chain over
            # [H*G, SP, SP] — 4x fewer VPU op invocations than the
            # per-head loop, with none of the lane-concat relayouts that
            # sank the packed-[G,SP,H*SP] variant (those concats moved
            # data ACROSS lanes; axis-0 stacking is tile-contiguous).
            kv3 = kvbuf_ref[:].reshape(g, sp, 2 * d)
            q3 = qbuf_ref[:].reshape(g, sp, d)
            sc = jnp.asarray(scale, dtype)
            qs = jnp.concatenate(
                [q3[:, :, h * dh : (h + 1) * dh] * sc for h in range(num_heads)],
                axis=0)
            ks = jnp.concatenate(
                [kv3[:, :, h * dh : (h + 1) * dh] for h in range(num_heads)],
                axis=0)
            vs = jnp.concatenate(
                [kv3[:, :, d + h * dh : d + (h + 1) * dh] for h in range(num_heads)],
                axis=0)
            scores = jax.lax.dot_general(
                qs, ks, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [H*G, SP, SP]
            col = jax.lax.broadcasted_iota(jnp.int32, (num_heads * g, sp, sp), 2)
            if softmax:
                t = jnp.where(col < s, scores, -jnp.inf)
                m = jnp.max(t, axis=2, keepdims=True)
                e = jnp.exp(t - m)
                w = e / jnp.sum(e, axis=2, keepdims=True)
            else:
                w = jnp.where(col < s, scores, 0.0)
            out = jax.lax.dot_general(
                w.astype(dtype), vs, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [H*G, SP, dh]
            msg = jnp.concatenate(
                [out[h * g : (h + 1) * g] for h in range(num_heads)], axis=2
            ).reshape(g * sp, d)
        elif compact and lanes and softmax:
            # EDGE-GROUPS-ON-LANES softmax: same per-head batched score
            # dots as the compact body, but the elementwise chain runs in
            # the TRANSPOSED [SP(si), SP(sj), G] layout — G rides the
            # 128-lane axis at full utilization (vs SP=24 -> 18.75% when
            # SP is minor), and the sj reduction happens on sublanes.
            # Costs two 3-D relayouts per head per group; only worthwhile
            # when G is a lane multiple (pick G=128 with this flag).
            kv3 = kvbuf_ref[:].reshape(g, sp, 2 * d)
            q3 = qbuf_ref[:].reshape(g, sp, d)
            sj_tok = jax.lax.broadcasted_iota(jnp.int32, (sp, sp, g), 1)
            out_heads = []
            for h in range(num_heads):
                qh = q3[:, :, h * dh : (h + 1) * dh] * jnp.asarray(scale, dtype)
                kh = kv3[:, :, h * dh : (h + 1) * dh]
                scores = jax.lax.dot_general(
                    qh, kh, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [G, SP(si), SP(sj)]
                st = jnp.transpose(scores, (1, 2, 0))     # [SP, SP, G]
                t = jnp.where(sj_tok < s, st, -jnp.inf)
                m = jnp.max(t, axis=1, keepdims=True)
                e = jnp.exp(t - m)
                w = e / jnp.sum(e, axis=1, keepdims=True)
                wg = jnp.transpose(w, (2, 0, 1))          # back to [G, SP, SP]
                vh = kv3[:, :, d + h * dh : d + (h + 1) * dh]
                oh = jax.lax.dot_general(
                    wg.astype(dtype), vh, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                out_heads.append(oh)
            msg = jnp.concatenate(out_heads, axis=2).reshape(g * sp, d)
        elif compact:
            # COMPACT per-edge attention: Mosaic lowers batched (3-D)
            # dot_general, so scores/softmax stay [G, SP, SP] — LINEAR in
            # G. The block-diagonal formulation below pays (G*SP)^2 in
            # scores + mask + exp, which the r2 ablation measured at 86%
            # of kernel time (softmax 47%, matmuls 39%) with 7/8 waste at
            # G=8.
            kv3 = kvbuf_ref[:].reshape(g, sp, 2 * d)
            q3 = qbuf_ref[:].reshape(g, sp, d)
            col_tok = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
            kmask = col_tok < s
            score_heads = []
            for h in range(num_heads):
                qh = (q3[:, :, h * dh : (h + 1) * dh]
                      * jnp.asarray(scale, dtype)).astype(mdt)
                kh = kv3[:, :, h * dh : (h + 1) * dh].astype(mdt)
                score_heads.append(jax.lax.dot_general(
                    qh, kh, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ))  # [G, SP, SP]
            if softmax and not packed:
                # per-head softmax (exact reference order, one chain per
                # head); A/B'd against the packed variant below — keep
                # whichever measures faster on the target chip
                out_heads = []
                for h in range(num_heads):
                    sh = jnp.where(kmask, score_heads[h], -jnp.inf)
                    m = jnp.max(sh, axis=2, keepdims=True)
                    e = jnp.exp(sh - m)
                    w = e / jnp.sum(e, axis=2, keepdims=True)
                    vh = kv3[:, :, d + h * dh : d + (h + 1) * dh]
                    oh = jax.lax.dot_general(
                        w.astype(mdt), vh.astype(mdt),
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    out_heads.append(oh)
            elif softmax:
                # PACKED-HEADS softmax: a VPU op on <=128 lanes costs the
                # same at any width, so running the elementwise chain once
                # over [G, SP, H*SP] instead of per-head cuts the op count
                # ~H-fold (softmax was 45% of kernel time). One shared
                # row max is valid (any per-row constant works); the
                # per-head denominators come from one batched matmul
                # against a segment-indicator, and the 1/sum scale is
                # applied AFTER the value matmul.
                hsp = num_heads * sp
                scores_all = jnp.concatenate(score_heads, axis=2)  # [G,SP,H*SP]
                # per-head row max (exact reference semantics — a shared
                # max can underflow a dominated head's exp to an all-zero
                # denominator), broadcast back to the packed width
                m = jnp.concatenate(
                    [jnp.broadcast_to(
                        jnp.max(jnp.where(kmask, sh, -jnp.inf), axis=2,
                                keepdims=True), (g, sp, sp))
                     for sh in score_heads], axis=2)
                col_all = jax.lax.broadcasted_iota(jnp.int32, (g, sp, hsp), 2)
                kmask_all = (col_all % sp < s).astype(jnp.float32)
                e_all = jnp.exp(scores_all - m) * kmask_all
                seg = (jax.lax.broadcasted_iota(jnp.int32, (hsp, num_heads), 0) // sp
                       == jax.lax.broadcasted_iota(jnp.int32, (hsp, num_heads), 1)
                       ).astype(jnp.float32)
                sums = jax.lax.dot_general(
                    e_all, seg, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [G, SP, H]
                inv = 1.0 / sums
                out_heads = []
                for h in range(num_heads):
                    vh = kv3[:, :, d + h * dh : d + (h + 1) * dh]
                    eh = e_all[:, :, h * sp : (h + 1) * sp]
                    oh = jax.lax.dot_general(
                        eh.astype(dtype), vh, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )  # [G, SP, dh]
                    out_heads.append(oh * inv[:, :, h : h + 1])
            else:
                out_heads = []
                for h in range(num_heads):
                    vh = kv3[:, :, d + h * dh : d + (h + 1) * dh]
                    w = jnp.where(kmask, score_heads[h], 0.0)
                    oh = jax.lax.dot_general(
                        w.astype(dtype), vh, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    out_heads.append(oh)
            msg = jnp.concatenate(out_heads, axis=2).reshape(g * sp, d)
        else:
            kv = kvbuf_ref[:]
            q = qbuf_ref[:]
            out_blocks = []
            for h in range(num_heads):
                qh = q[:, h * dh : (h + 1) * dh] * jnp.asarray(scale, dtype)
                kh = kv[:, h * dh : (h + 1) * dh]
                vh = kv[:, d + h * dh : d + (h + 1) * dh]
                scores = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                if softmax:
                    scores = jnp.where(block_mask, scores, -jnp.inf)
                    m = jnp.max(scores, axis=1, keepdims=True)
                    e = jnp.exp(scores - m)
                    w = e / jnp.sum(e, axis=1, keepdims=True)
                else:
                    w = jnp.where(block_mask, scores, 0.0)
                oh = jax.lax.dot_general(
                    w.astype(dtype), vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out_blocks.append(oh)
            msg = jnp.concatenate(out_blocks, axis=1)

        if mm_scatter:
            if "mmnotrans" in ablate:  # timing: store w/o the transpose
                msgT_ref[:, pl.ds(gi * g, g), :] = jnp.broadcast_to(
                    jnp.sum(msg.reshape(g, sp, d), axis=1)[None]
                    .astype(msgT_ref.dtype), (sp, g, d))
            elif "mmfixed" in ablate:  # timing: fixed-slot store
                msgT_ref[:, pl.ds(0, g), :] = jnp.transpose(
                    msg.reshape(g, sp, d).astype(msgT_ref.dtype), (1, 0, 2))
            else:
                msgT_ref[:, pl.ds(gi * g, g), :] = jnp.transpose(
                    msg.reshape(g, sp, d).astype(msgT_ref.dtype), (1, 0, 2))
            return 0
        if "noacc" in ablate:  # timing ablation: one fixed-row RMW
            acc_ref[pl.ds(0, sp), :] = acc_ref[pl.ds(0, sp), :] + msg[0:sp, :]
            return 0
        for j in range(g):
            block = msg[j * sp : (j + 1) * sp, :] * vals[j]
            cur = acc_ref[pl.ds(rs[j] * sp, sp), :]
            acc_ref[pl.ds(rs[j] * sp, sp), :] = cur + block
        return 0

    jax.lax.fori_loop(0, ng, body, 0)
    if mm_scatter:
        if "mmnoepi" in ablate:  # timing: skip the scatter dots
            acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
            return
        acc_ref[:] = _mm_scatter_epilogue(
            msgT_ref, recv_eg_ref, valid_eg_ref, ng,
            tn=acc_ref.shape[0] // sp, sp=sp, d=d, g=g,
            ngmax=msgT_ref.shape[1] // g, inv_col=inv_col,
        ).astype(acc_ref.dtype)


def _fused_kernel_vmem_v2(
    ng_ref,        # SMEM [1, T] int32: live edge-group counts (ALL tiles;
    #                a (1,1) blocked scalar violates Mosaic's SMEM block
    #                rules — index by program_id instead)
    senders_ref,   # SMEM [1, 1, EMAX] int32 global sender ids
    recv_ref,      # SMEM [1, 1, EMAX] int32 local receiver row
    valid_ref,     # SMEM [1, 1, EMAX] int32 0/1 (may carry RUNTIME masks)
    q_ref,         # VMEM [TN*SP, D]
    kv_ref,        # VMEM [N*SP, 2D] resident
    out_ref,       # VMEM [TN*SP, D]
    acc_ref,       # scratch VMEM [TN*SP, D] f32
    qbuf_ref,      # scratch VMEM [G*SP, D]
    kvbuf_ref,     # scratch VMEM [G*SP, 2D]
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
    lanes: bool = False,
    ablate: str = "",
    mxu_bf16: bool = False,
):
    """v2: per-edge attention + segment-SUM over projected q/kv inputs
    (see _tile_attention_accumulate for the tile-body contract)."""
    _tile_attention_accumulate(
        ng_ref[0, pl.program_id(0)], senders_ref, recv_ref, valid_ref,
        q_ref, kv_ref, acc_ref, qbuf_ref, kvbuf_ref,
        s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
        softmax=softmax, compact=compact, packed=packed, stacked=stacked,
        lanes=lanes, ablate=ablate, mxu_bf16=mxu_bf16,
    )
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _fused_kernel_vmem_v2_mm(
    ng_ref,        # SMEM [1, T] int32 live edge-group counts
    senders_ref,   # SMEM [1, 1, EMAX]
    recv_ref,      # SMEM [1, 1, EMAX]
    valid_ref,     # SMEM [1, 1, EMAX]
    recv_eg_ref,   # VMEM [1, EG] int32 local receiver rows (EG-padded)
    valid_eg_ref,  # VMEM [1, EG] int32 validity (EG-padded; may be RUNTIME)
    q_ref,         # VMEM [TN*SP, D]
    kv_ref,        # VMEM [N*SP, 2D] resident
    out_ref,       # VMEM [TN*SP, D]
    acc_ref,       # scratch VMEM [TN*SP, D] f32
    qbuf_ref,      # scratch VMEM [G*SP, D]
    kvbuf_ref,     # scratch VMEM [G*SP, 2D]
    msgT_ref,      # scratch VMEM [SP, EG, D] f32
    *,
    s: int, sp: int, d: int, num_heads: int, group: int, emax: int,
    softmax: bool, compact: bool = True, packed: bool = True,
    stacked: bool = False, lanes: bool = False, mxu_bf16: bool = False,
):
    """v2 body with the scatter-as-matmul accumulate (v8 epilogue)."""
    _tile_attention_accumulate(
        ng_ref[0, pl.program_id(0)], senders_ref, recv_ref, valid_ref,
        q_ref, kv_ref, acc_ref, qbuf_ref, kvbuf_ref,
        s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
        softmax=softmax, compact=compact, packed=packed, stacked=stacked,
        lanes=lanes, mm_scatter=True, msgT_ref=msgT_ref,
        recv_eg_ref=recv_eg_ref, valid_eg_ref=valid_eg_ref,
        mxu_bf16=mxu_bf16,
    )
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _fused_kernel_vmem_v6(
    ng_ref,        # SMEM [1, T] int32 live edge-group counts (all tiles)
    senders_ref,   # SMEM [1, 1, EMAX] int32 global sender ids
    recv_ref,      # SMEM [1, 1, EMAX] int32 local receiver row
    valid_ref,     # SMEM [1, 1, EMAX] int32 0/1 (may carry RUNTIME masks)
    invdeg_ref,    # SMEM [1, 1, TN] f32 1/degree per local node (0 if deg 0)
    x_ref,         # VMEM [NT*SP, D] resident RAW token rows (pre-projection)
    wqkv_ref,      # VMEM [D, 3D]
    bqkv_ref,      # VMEM [1, 3D]
    wout_ref,      # VMEM [D, D]
    bout_ref,      # VMEM [1, D]
    out_ref,       # VMEM [TN*SP, D] per tile — FINAL layer output rows
    kvscr_ref,     # scratch VMEM [NT*SP, 2D] projected K|V — built at grid
    #                step 0 and PERSISTS across the sequential tile grid
    qscr_ref,      # scratch VMEM [TN*SP, D] this tile's projected Q
    acc_ref,       # scratch VMEM [TN*SP, D] f32
    qbuf_ref,      # scratch VMEM [G*SP, D]
    kvbuf_ref,     # scratch VMEM [G*SP, 2D]
    *,
    s: int,
    sp: int,
    d: int,
    num_heads: int,
    group: int,
    emax: int,
    softmax: bool,
    tile_nodes: int,
    compact: bool = True,
    packed: bool = True,
    stacked: bool = False,
    lanes: bool = False,
    ablate: str = "",
    mxu_bf16: bool = False,
):
    """v6: the WHOLE layer in one kernel — QKV in-projection, per-edge
    attention, mean aggregation, and the output projection.

    v2/v3 read XLA-materialized q/kv rows from HBM; at Cora scale that
    projection round-trips ~200 MB of qkv through HBM (measured ~0.3 ms
    of the 1.43 ms full op) and the mean/out-proj epilogue another
    ~100 MB. v6's inputs are the RAW token rows (one 33 MB resident
    block):

      * grid step 0 projects K|V for ALL nodes into a persistent VMEM
        scratch (tile-chunked matmul; the grid is sequential on one core,
        so later tiles see the full projection);
      * each tile projects its OWN Q rows (exactly-once overall);
      * the mean normalization folds into the per-edge validity scalar
        (invdeg = 1/degree, computed host/XLA-side from the runtime edge
        mask) — acc holds the segment MEAN at no extra vector work;
      * the epilogue right-multiplies by w_out on the MXU and adds b_out
        per live node (degree-0 receivers stay exactly 0, matching the
        XLA path's where(count>0) semantics).

    Replaces the op at reference amp_conv.py:35-49 end-to-end."""
    t = pl.program_id(0)
    tn = tile_nodes
    rows = tn * sp

    @pl.when(t == 0)
    def _project_kv():
        # tile-row-chunked so each dot is MXU-sized; one pass over x
        def chunk(i, _):
            xc = x_ref[pl.ds(i * rows, rows), :]
            kv = jax.lax.dot_general(
                xc, wqkv_ref[:, d:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bqkv_ref[0:1, d:]
            kvscr_ref[pl.ds(i * rows, rows), :] = kv.astype(kvscr_ref.dtype)
            return 0
        jax.lax.fori_loop(0, pl.num_programs(0), chunk, 0)

    xq = x_ref[pl.ds(t * rows, rows), :]
    q = jax.lax.dot_general(
        xq, wqkv_ref[:, :d], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0:1, :d]
    qscr_ref[:] = q.astype(qscr_ref.dtype)

    _tile_attention_accumulate(
        ng_ref[0, t], senders_ref, recv_ref, valid_ref,
        qscr_ref, kvscr_ref, acc_ref, qbuf_ref, kvbuf_ref,
        s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
        softmax=softmax, compact=compact, packed=packed, stacked=stacked,
        lanes=lanes, invdeg_ref=invdeg_ref, ablate=ablate,
        mxu_bf16=mxu_bf16,
    )

    mean = acc_ref[:].astype(x_ref.dtype)
    out = jax.lax.dot_general(
        mean, wout_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = out.astype(out_ref.dtype)
    for j in range(tn):
        # bias only for live nodes: degree-0 rows hold acc==0 -> out==0,
        # and skipping their bias keeps the XLA path's exact zeros
        flag = (invdeg_ref[0, 0, j] > 0.0).astype(out_ref.dtype)
        blk = out_ref[pl.ds(j * sp, sp), :]
        out_ref[pl.ds(j * sp, sp), :] = blk + bout_ref[0:1, :] * flag


def _fused_kernel_vmem_v6_mm(
    ng_ref,        # SMEM [1, T] int32 live edge-group counts (all tiles)
    senders_ref,   # SMEM [1, 1, EMAX]
    recv_ref,      # SMEM [1, 1, EMAX]
    valid_ref,     # SMEM [1, 1, EMAX]
    recv_eg_ref,   # VMEM [1, EG] int32 local receiver rows (EG-padded)
    valid_eg_ref,  # VMEM [1, EG] int32 validity (EG-padded; may be RUNTIME)
    invdeg_ref,    # VMEM [1, TN] f32 1/degree per local node (0 if deg 0)
    x_ref,         # VMEM [NT*SP, D] resident RAW token rows
    wqkv_ref,      # VMEM [D, 3D]
    bqkv_ref,      # VMEM [1, 3D]
    wout_ref,      # VMEM [D, D]
    bout_ref,      # VMEM [1, D]
    out_ref,       # VMEM [TN*SP, D]
    kvscr_ref,     # scratch VMEM [NT*SP, 2D] persistent projected K|V
    qscr_ref,      # scratch VMEM [TN*SP, D]
    acc_ref,       # scratch VMEM [TN*SP, D] f32
    qbuf_ref,      # scratch VMEM [G*SP, D]
    kvbuf_ref,     # scratch VMEM [G*SP, 2D]
    msgT_ref,      # scratch VMEM [SP, EG, D] f32
    *,
    s: int, sp: int, d: int, num_heads: int, group: int, emax: int,
    softmax: bool, tile_nodes: int, compact: bool = True,
    packed: bool = False, stacked: bool = False, lanes: bool = False,
    mxu_bf16: bool = False,
):
    """v6 whole-layer body with the scatter-as-matmul accumulate: the
    mean folds in as a per-receiver row scale (inv_col) after the
    scatter dots instead of per-edge scalar multiplies, and the
    live-node bias epilogue is vectorized off the same inv column
    (replacing v6's per-node bias RMW loop)."""
    t = pl.program_id(0)
    tn = tile_nodes
    rows = tn * sp

    @pl.when(t == 0)
    def _project_kv():
        def chunk(i, _):
            xc = x_ref[pl.ds(i * rows, rows), :]
            kv = jax.lax.dot_general(
                xc, wqkv_ref[:, d:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bqkv_ref[0:1, d:]
            kvscr_ref[pl.ds(i * rows, rows), :] = kv.astype(kvscr_ref.dtype)
            return 0
        jax.lax.fori_loop(0, pl.num_programs(0), chunk, 0)

    xq = x_ref[pl.ds(t * rows, rows), :]
    q = jax.lax.dot_general(
        xq, wqkv_ref[:, :d], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0:1, :d]
    qscr_ref[:] = q.astype(qscr_ref.dtype)

    # [1, TN] (row 0 of the 8-replicated block) -> [TN, 1, 1] column
    inv_col = jnp.transpose(invdeg_ref[0, 0:1, :], (1, 0))[:, :, None]

    _tile_attention_accumulate(
        ng_ref[0, t], senders_ref, recv_ref, valid_ref,
        qscr_ref, kvscr_ref, acc_ref, qbuf_ref, kvbuf_ref,
        s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
        softmax=softmax, compact=compact, packed=packed, stacked=stacked,
        lanes=lanes, mm_scatter=True, msgT_ref=msgT_ref,
        recv_eg_ref=recv_eg_ref, valid_eg_ref=valid_eg_ref,
        inv_col=inv_col, mxu_bf16=mxu_bf16,
    )

    mean = acc_ref[:].astype(x_ref.dtype)
    out = jax.lax.dot_general(
        mean, wout_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    live = (inv_col > 0.0).astype(jnp.float32)          # [TN, 1, 1]
    out3 = out.reshape(tn, sp, d) + bout_ref[0:1, :][None] * live
    out_ref[:] = out3.reshape(rows, d).astype(out_ref.dtype)


def _fused_kernel_vmem_v4(
    ng_ref,        # SMEM [1, T] int32 live edge-group counts
    senders_ref,   # SMEM [1, 1, EMAX]
    recv_ref,      # SMEM [1, 1, EMAX]
    valid_ref,     # SMEM [1, 1, EMAX]
    q_ref,         # VMEM [TN*SP, D]
    kv_ref,        # VMEM [N*SP, 2D] resident
    out_ref,       # VMEM [TN*SP, D]
    acc_ref,       # scratch VMEM [TN*SP, D] f32
    qbuf_ref,      # scratch VMEM [2, G*SP, D]
    kvbuf_ref,     # scratch VMEM [2, G*SP, 2D]
    ksems,         # DMA sems (2, G)
    qsems,         # DMA sems (2, G)
    *,
    s: int,
    sp: int,
    d: int,
    num_heads: int,
    group: int,
    emax: int,
    softmax: bool,
    direct_q: bool = True,
    ablate: str = "",
):
    """v4 = v3 compact attention + DOUBLE-BUFFERED ASYNC gathers: the
    per-edge K|V row copies for group gi+1 run as async DMAs while group
    gi computes, hiding the gather floor (r2 ablation: ~45% of v3 time)
    under the batched-dot attention. The Q rows live in the tile's own
    VMEM block, so with direct_q (default; probe17) they are plain
    vector loads in-body — HALF the per-edge DMA issues, which is what
    the dma path is bound by (probe16: bf16 streams with 2/3 the bytes
    measured 1.10x slower, so issues, not bytes). direct_q=False keeps
    the double-buffered async Q for A/Bs."""
    g = group
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)

    def edge_copies(gi, slot, j):
        idx = jnp.minimum(gi * g + j, emax - 1)
        ns = senders_ref[0, 0, idx]
        kc = pltpu.make_async_copy(
            kv_ref.at[pl.ds(ns * sp, sp), :],
            kvbuf_ref.at[slot, pl.ds(j * sp, sp), :],
            ksems.at[slot, j],
        )
        if direct_q:
            return (kc,)
        r = recv_ref[0, 0, idx]
        qc = pltpu.make_async_copy(
            q_ref.at[pl.ds(r * sp, sp), :],
            qbuf_ref.at[slot, pl.ds(j * sp, sp), :],
            qsems.at[slot, j],
        )
        return kc, qc

    def start_group(gi, slot):
        if "nodma" in ablate:
            return
        for j in range(g):
            for c in edge_copies(gi, slot, j):
                c.start()

    def wait_group(gi, slot):
        if "nodma" in ablate:
            return
        for j in range(g):
            for c in edge_copies(gi, slot, j):
                c.wait()

    acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    ng = ng_ref[0, pl.program_id(0)]

    @pl.when(ng > 0)
    def _():
        start_group(0, 0)

    col_tok = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
    kmask = col_tok < s

    def body(gi, _):
        slot = jax.lax.rem(gi, 2)
        nxt = jax.lax.rem(gi + 1, 2)

        @pl.when(gi + 1 < ng)
        def _():
            start_group(gi + 1, nxt)

        wait_group(gi, slot)
        if direct_q and "noq" not in ablate:
            for j in range(g):
                idx = jnp.minimum(gi * g + j, emax - 1)
                r = recv_ref[0, 0, idx]
                qbuf_ref[slot, pl.ds(j * sp, sp), :] = (
                    q_ref[pl.ds(r * sp, sp), :])

        kv3 = kvbuf_ref[slot].reshape(g, sp, 2 * d)
        q3 = qbuf_ref[slot].reshape(g, sp, d)
        dtype = q3.dtype
        out_heads = []
        for h in range(num_heads):
            qh = q3[:, :, h * dh : (h + 1) * dh] * jnp.asarray(scale, dtype)
            kh = kv3[:, :, h * dh : (h + 1) * dh]
            vh = kv3[:, :, d + h * dh : d + (h + 1) * dh]
            scores = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
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
            )
            out_heads.append(oh)
        msg = jnp.concatenate(out_heads, axis=2).reshape(g * sp, d)

        if "noacc" in ablate:  # timing ablation: one fixed-row RMW
            acc_ref[pl.ds(0, sp), :] = acc_ref[pl.ds(0, sp), :] + msg[0:sp, :]
            return 0
        for j in range(g):
            idx = jnp.minimum(gi * g + j, emax - 1)
            r = recv_ref[0, 0, idx]
            dup = (gi * g + j) > idx
            val = jnp.where(dup, 0, valid_ref[0, 0, idx]).astype(jnp.float32)
            block = msg[j * sp : (j + 1) * sp, :] * val
            cur = acc_ref[pl.ds(r * sp, sp), :]
            acc_ref[pl.ds(r * sp, sp), :] = cur + block
        return 0

    jax.lax.fori_loop(0, ng, body, 0)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _rep8(arr2d):
    """[T, EG] -> [T, 8, EG]: Mosaic requires VMEM block sublane dims
    divisible by 8, so the per-tile id/validity row vectors ride in
    8-replicated blocks (kernels read row 0)."""
    t, eg = arr2d.shape
    return jnp.broadcast_to(arr2d[:, None, :], (t, 8, eg))


def _mm_scatter_epilogue(msgT_ref, recv_eg_ref, valid_eg_ref, ng, *,
                         tn, sp, d, g, ngmax, inv_col=None):
    """Scatter-as-matmul: per-edge messages were buffered token-major in
    msgT_ref [SP, EG, D]; one exact {0,1} one-hot sel [TN, EG] built from
    the tile's receiver ids turns the per-receiver segment-SUM into SP
    [TN, EG] x [EG, D] MXU dots — replacing the per-edge dynamic-row
    read-add-write loop that probe19/20 measured at ~half the kernel.
    sel entries are exactly 0/1 (validity folds in as a select, the v6
    mean as a per-receiver row scale after the dot), so the only numeric
    change vs the loop is float summation ORDER. Returns [TN*SP, D] f32.
    """
    eg = ngmax * g

    def zero_tail(gi, _):
        # groups beyond the live trip count were never written — zero
        # them so sel's 0 columns never multiply uninitialized VMEM
        msgT_ref[:, pl.ds(gi * g, g), :] = jnp.zeros(
            (sp, g, d), msgT_ref.dtype)
        return 0

    jax.lax.fori_loop(ng, ngmax, zero_tail, 0)

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tn, eg), 0)
    recv_row = recv_eg_ref[0, 0:1, :]
    live = valid_eg_ref[0, 0:1, :] != 0
    sel = jnp.where((iota_n == recv_row) & live, 1.0, 0.0)  # [TN, EG] f32
    outs = []
    for s_ in range(sp):
        outs.append(jax.lax.dot_general(
            sel, msgT_ref[s_], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))  # [TN, D]
    acc = jnp.stack(outs, axis=1)  # [TN, SP, D]
    if inv_col is not None:
        acc = acc * inv_col
    return acc.reshape(tn * sp, d)


def _fused_kernel_dma_v8(
    ng_ref,        # SMEM [1, T] int32 live edge-group counts
    senders_ref,   # SMEM [1, 1, EMAX]
    recv_ref,      # SMEM [1, 1, EMAX]
    recv_eg_ref,   # VMEM [1, EG] int32 local receiver rows (EG-padded)
    valid_eg_ref,  # VMEM [1, EG] int32 validity (EG-padded; may be RUNTIME)
    q_ref,         # VMEM [TN*SP, D]
    kv_ref,        # ANY [N*SP, 2D] — DMA per edge
    out_ref,       # VMEM [TN*SP, D]
    msgT_ref,      # scratch VMEM [SP, EG, D] f32 token-major message buffer
    qbuf_ref,      # scratch VMEM [G*SP, D]
    kvbuf_ref,     # scratch VMEM [2, G*SP, 2D]
    ksems,         # DMA sems (2, G)
    *,
    s: int,
    sp: int,
    d: int,
    num_heads: int,
    group: int,
    emax: int,
    softmax: bool,
):
    """v8 = v4's double-buffered K|V DMA + direct Q loads, but the
    accumulate is the scatter-as-matmul epilogue instead of per-edge
    dynamic-row RMWs (probe19: that loop was 47% of the v4 forward)."""
    g = group
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    ng = ng_ref[0, pl.program_id(0)]

    def gather_dma(gi, slot, j):
        idx = jnp.minimum(gi * g + j, emax - 1)
        ns = senders_ref[0, 0, idx]
        return pltpu.make_async_copy(
            kv_ref.at[pl.ds(ns * sp, sp), :],
            kvbuf_ref.at[slot, pl.ds(j * sp, sp), :],
            ksems.at[slot, j],
        )

    @pl.when(ng > 0)
    def _():
        for j in range(g):
            gather_dma(0, 0, j).start()

    col_tok = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
    kmask = col_tok < s

    def body(gi, _):
        slot = jax.lax.rem(gi, 2)
        nxt = jax.lax.rem(gi + 1, 2)

        @pl.when(gi + 1 < ng)
        def _():
            for j in range(g):
                gather_dma(gi + 1, nxt, j).start()

        for j in range(g):
            gather_dma(gi, slot, j).wait()
        for j in range(g):
            idx = jnp.minimum(gi * g + j, emax - 1)
            r = recv_ref[0, 0, idx]
            qbuf_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(r * sp, sp), :]

        kv3 = kvbuf_ref[slot].reshape(g, sp, 2 * d)
        q3 = qbuf_ref[:].reshape(g, sp, d)
        dtype = q3.dtype
        out_heads = []
        for h in range(num_heads):
            qh = q3[:, :, h * dh : (h + 1) * dh] * jnp.asarray(scale, dtype)
            kh = kv3[:, :, h * dh : (h + 1) * dh]
            vh = kv3[:, :, d + h * dh : d + (h + 1) * dh]
            scores = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
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
            )
            out_heads.append(oh)
        msg3 = jnp.concatenate(out_heads, axis=2)  # [G, SP, D] f32
        msgT_ref[:, pl.ds(gi * g, g), :] = jnp.transpose(msg3, (1, 0, 2))
        return 0

    jax.lax.fori_loop(0, ng, body, 0)
    tn_sp = out_ref.shape[0]
    out_ref[:] = _mm_scatter_epilogue(
        msgT_ref, recv_eg_ref, valid_eg_ref, ng,
        tn=tn_sp // sp, sp=sp, d=d, g=g, ngmax=msgT_ref.shape[1] // g,
    ).astype(out_ref.dtype)


def _fused_kernel_chunked(
    nc_ref,        # SMEM [1, T] int32: live CHUNK counts (all tiles)
    senders_ref,   # SMEM [1, 1, NCMAX*C] int32 global sender ids
    recvc_ref,     # SMEM [1, 1, NCMAX] int32 chunk receiver row (tile-local)
    valid_ref,     # SMEM [1, 1, NCMAX*C] int32 0/1 (may carry RUNTIME masks)
    q_ref,         # VMEM [TN*SP, D]
    kv_ref,        # VMEM [N*SP, 2D] resident
    out_ref,       # VMEM [TN*SP, D]
    acc_ref,       # scratch VMEM [TN*SP, D] f32
    kvbuf_ref,     # scratch VMEM [C*SP, 2D]
    *,
    s: int,
    sp: int,
    d: int,
    num_heads: int,
    chunk: int,
    softmax: bool,
):
    """v5: RECEIVER-CENTRIC chunks (<= C edges sharing one receiver).

    vs the edge-group kernels (v2/v3):
      * ONE Q read serves the whole chunk (Q gather traffic / C);
      * the value matmul over the chunk's concatenated [C*SP, 2D] K|V sums
        the chunk's per-edge messages directly -> ONE accumulate per chunk
        instead of a read-modify-write per edge;
      * heads stack along SUBLANES: every softmax tensor is [H*SP, C*SP]
        at full lane width (~5x fewer VPU ops than [G*SP, SP] at SP=24),
        with no lane-axis concats (sublane concats are cheap);
      * K|V copies are PREDICATED on slot validity, so padded slots of
        partial chunks (low-degree receivers) cost no gather traffic;
      * per-edge softmax denominators come from tiny 0/1 seg/expander
        dot_generals at HIGHEST precision (exact in f32 — see the packed-
        softmax A/B note above for why default MXU precision is not OK).

    Per-edge softmax semantics are preserved: the shared per-row max is
    just a softmax shift constant, and the seg matmul separates each
    edge's denominator.
    """
    c = chunk
    h = num_heads
    dh = d // h
    scale = 1.0 / (dh ** 0.5)
    csp = c * sp
    hsp = h * sp

    acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    # predicated copies skip invalid slots, so the buffer must start
    # FINITE: the value dot contracts over every column and 0 * NaN from
    # uninitialized scratch would poison the chunk sum (w is exactly 0 on
    # invalid columns, so any finite stale value contributes nothing)
    kvbuf_ref[:] = jnp.zeros(kvbuf_ref.shape, kvbuf_ref.dtype)

    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, csp), 1)
    tok_ok = (col1 % sp) < s
    if softmax:
        seg = (jax.lax.broadcasted_iota(jnp.int32, (csp, c), 0) // sp
               == jax.lax.broadcasted_iota(jnp.int32, (csp, c), 1)
               ).astype(jnp.float32)
        expander = (jax.lax.broadcasted_iota(jnp.int32, (c, csp), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (c, csp), 1) // sp
                    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (sp, d), 1)

    def body(ci, _):
        r = recvc_ref[0, 0, ci]
        for j in range(c):
            vj = valid_ref[0, 0, ci * c + j]

            @pl.when(vj != 0)
            def _():
                ns = senders_ref[0, 0, ci * c + j]
                kvbuf_ref[pl.ds(j * sp, sp), :] = kv_ref[pl.ds(ns * sp, sp), :]

        qv = q_ref[pl.ds(r * sp, sp), :]          # [SP, D]
        dtype = qv.dtype
        kvb = kvbuf_ref[:]
        k2 = kvb[:, :d]                            # [C*SP, D]
        v2 = kvb[:, d:]                            # [C*SP, D]

        rows = []
        for hh in range(h):
            qh = qv[:, hh * dh : (hh + 1) * dh] * jnp.asarray(scale, dtype)
            kh = k2[:, hh * dh : (hh + 1) * dh]
            rows.append(jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))                                     # [SP, C*SP]
        scores = jnp.concatenate(rows, axis=0)     # [H*SP, C*SP] sublane concat

        # slot validity vector (stale kvbuf data in unwritten slots — and
        # the scratch's initial garbage — is neutralized HERE, via where,
        # never via arithmetic on the garbage scores)
        okv = tok_ok
        for j in range(c):
            vj = valid_ref[0, 0, ci * c + j] != 0
            okv = okv & ((col1 // sp != j) | vj)

        if softmax:
            sm = jnp.where(okv, scores, -jnp.inf)
            mx = jnp.max(sm, axis=1, keepdims=True)   # shared row shift
            e = jnp.exp(sm - mx)                      # masked cols -> 0
            sums = jax.lax.dot_general(
                e, seg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                          # [H*SP, C]
            inv = jnp.where(sums > 0, 1.0 / sums, 0.0)
            invb = jax.lax.dot_general(
                inv, expander, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                          # [H*SP, C*SP]
            w = e * invb
        else:
            w = jnp.where(okv, scores, 0.0)

        op = jax.lax.dot_general(
            w.astype(dtype), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [H*SP, D]
        # row-group hh holds head hh's correct output in its own dh lanes
        # (cross-head lanes are garbage sums) — extract by lane mask
        outv = jnp.zeros((sp, d), jnp.float32)
        for hh in range(h):
            outv = outv + op[hh * sp : (hh + 1) * sp, :] * (lane // dh == hh)

        cur = acc_ref[pl.ds(r * sp, sp), :]
        acc_ref[pl.ds(r * sp, sp), :] = cur + outv
        return 0

    jax.lax.fori_loop(0, nc_ref[0, pl.program_id(0)], body, 0)
    out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "softmax", "tile_nodes", "chunk",
                     "num_tiles", "ncmax", "s", "interpret"),
)
def _fused_edge_sums_chunked(
    q_rows: jnp.ndarray,         # [NT*SP, D]
    kv_rows: jnp.ndarray,        # [N*SP, 2D]
    senders: jnp.ndarray,        # [T, 1, NCMAX*C] int32
    chunk_recv: jnp.ndarray,     # [T, 1, NCMAX] int32
    valid: jnp.ndarray,          # [T, 1, NCMAX*C] int32
    counts: jnp.ndarray,         # [T] int32 live CHUNKS per tile
    *,
    num_heads: int,
    softmax: bool,
    tile_nodes: int,
    chunk: int,
    num_tiles: int,
    ncmax: int,
    s: int,
    interpret: bool = False,
):
    sp = q_rows.shape[0] // (num_tiles * tile_nodes)
    d = q_rows.shape[1]
    tn = tile_nodes
    ncounts = counts.astype(jnp.int32).reshape(1, num_tiles)
    kernel = functools.partial(
        _fused_kernel_chunked,
        s=s, sp=sp, d=d, num_heads=num_heads, chunk=chunk, softmax=softmax,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, num_tiles), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ncmax * chunk), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ncmax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ncmax * chunk), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kv_rows.shape[0], 2 * d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tn * sp, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tn * sp, d), jnp.float32),
            pltpu.VMEM((chunk * sp, 2 * d), kv_rows.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ncounts, senders, chunk_recv, valid, q_rows, kv_rows)


def _fused_edge_sums_v2(*args, packed=None, stacked=None, lanes=None,
                        direct_q=None, ablate=None, **kw):
    """Resolve the env-default body flags OUTSIDE the jit boundary: they
    are static args, and resolving a None default inside the traced
    function would let a flipped module default silently hit the stale
    cached program."""
    if packed is None:
        packed = PACKED_SOFTMAX_DEFAULT
    if stacked is None:
        stacked = STACKED_SOFTMAX_DEFAULT
    if lanes is None:
        lanes = LANES_SOFTMAX_DEFAULT
    if direct_q is None:
        direct_q = DMA_DIRECT_Q_DEFAULT
    if ablate is None:
        # timing ablations ONLY (kernel_probe19): never parity-safe
        ablate = os.environ.get("AMPNET_ABLATE", "")
    if kw.get("mm_scatter") is None:
        kw["mm_scatter"] = MM_SCATTER_DEFAULT
    if kw.get("mxu_bf16") is None:
        kw["mxu_bf16"] = MXU_BF16_DEFAULT
    return _fused_edge_sums_v2_impl(
        *args, packed=packed, stacked=stacked, lanes=lanes,
        direct_q=direct_q, ablate=ablate, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "softmax", "tile_nodes", "group", "num_tiles", "emax", "s", "interpret", "compact", "overlap", "packed", "stacked", "lanes", "gather", "direct_q", "ablate", "mm_scatter", "mxu_bf16"),
)
def _fused_edge_sums_v2_impl(
    q_rows: jnp.ndarray,         # [NT*SP, D]
    kv_rows: jnp.ndarray,        # [N*SP, 2D]
    tile_senders: jnp.ndarray,   # [T, 1, EMAX] int32
    tile_recv: jnp.ndarray,      # [T, 1, EMAX]
    tile_valid: jnp.ndarray,     # [T, 1, EMAX] (structural & runtime)
    tile_counts: jnp.ndarray,    # [T] int32 STRUCTURAL live-edge counts
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
    overlap: bool = False,
    packed: bool = False,
    stacked: bool = False,
    lanes: bool = False,
    gather: str = "vmem",
    direct_q: bool = True,
    ablate: str = "",
    mm_scatter: bool = False,
    mxu_bf16: bool = False,
):
    sp = q_rows.shape[0] // (num_tiles * tile_nodes)
    d = q_rows.shape[1]
    tn = tile_nodes
    ngroups = ((tile_counts.astype(jnp.int32) + group - 1) // group).reshape(
        1, num_tiles
    )
    if gather == "dma" and mm_scatter:
        # v8: scatter-as-matmul accumulate (probe19: the per-edge RMW
        # loop is 47% of the v4 forward). The one-hot needs the receiver
        # ids and validity as EG-padded VMEM vectors per tile.
        ngmax = -(-emax // group)
        eg = ngmax * group
        recv_eg = _rep8(jnp.pad(
            tile_recv.reshape(num_tiles, emax), ((0, 0), (0, eg - emax))))
        valid_eg = _rep8(jnp.pad(
            tile_valid.reshape(num_tiles, emax), ((0, 0), (0, eg - emax))))
        kernel = functools.partial(
            _fused_kernel_dma_v8,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax,
        )
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((1, num_tiles), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, eg), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, eg), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn * sp, d), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((tn * sp, d), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_tiles * tn * sp, d),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((sp, eg, d), jnp.float32),          # msgT
                pltpu.VMEM((group * sp, d), q_rows.dtype),     # qbuf
                pltpu.VMEM((2, group * sp, 2 * d), kv_rows.dtype),
                pltpu.SemaphoreType.DMA((2, group)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(ngroups, tile_senders, tile_recv, recv_eg, valid_eg,
          q_rows, kv_rows)
    if gather == "vmem" and mm_scatter:
        ngmax = -(-emax // group)
        eg = ngmax * group
        recv_eg = _rep8(jnp.pad(
            tile_recv.reshape(num_tiles, emax), ((0, 0), (0, eg - emax))))
        valid_eg = _rep8(jnp.pad(
            tile_valid.reshape(num_tiles, emax), ((0, 0), (0, eg - emax))))
        kernel = functools.partial(
            _fused_kernel_vmem_v2_mm,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax, compact=compact, packed=packed,
            stacked=stacked, lanes=lanes, mxu_bf16=mxu_bf16,
        )
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((1, num_tiles), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, eg), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, eg), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn * sp, d), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kv_rows.shape[0], 2 * d), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tn * sp, d), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_tiles * tn * sp, d),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tn * sp, d), jnp.float32),         # acc
                pltpu.VMEM((group * sp, d), q_rows.dtype),     # qbuf
                pltpu.VMEM((group * sp, 2 * d), kv_rows.dtype),
                pltpu.VMEM((sp, eg, d), jnp.float32),          # msgT
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(ngroups, tile_senders, tile_recv, tile_valid, recv_eg, valid_eg,
          q_rows, kv_rows)
    if gather == "dma":
        # dma-compact: the v4 overlap body gathers via async copies,
        # which read from ANY (HBM) exactly as from resident VMEM — so
        # the production-scale path gets the compact batched-dot
        # attention (scores linear in G) instead of the v1
        # block-diagonal body, with the K|V stream double-buffered
        # under the group's compute.
        overlap = True
    if overlap:
        kernel = functools.partial(
            _fused_kernel_vmem_v4,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax, direct_q=direct_q, ablate=ablate,
        )
        scratch = [
            pltpu.VMEM((tn * sp, d), jnp.float32),
            pltpu.VMEM((2, group * sp, d), q_rows.dtype),
            pltpu.VMEM((2, group * sp, 2 * d), kv_rows.dtype),
            pltpu.SemaphoreType.DMA((2, group)),
            pltpu.SemaphoreType.DMA((2, group)),
        ]
    else:
        kernel = functools.partial(
            _fused_kernel_vmem_v2,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax, compact=compact, packed=packed, stacked=stacked,
            lanes=lanes, ablate=ablate, mxu_bf16=mxu_bf16,
        )
        scratch = [
            pltpu.VMEM((tn * sp, d), jnp.float32),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.VMEM((group * sp, 2 * d), kv_rows.dtype),
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
            pl.BlockSpec(memory_space=pl.ANY) if gather == "dma"
            else pl.BlockSpec((kv_rows.shape[0], 2 * d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tn * sp, d), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ngroups, tile_senders, tile_recv, tile_valid, q_rows, kv_rows)


def _fused_attention_out_v6(*args, packed=None, stacked=None, lanes=None, **kw):
    """Env-default body flags resolved outside jit (see _fused_edge_sums_v2)."""
    if packed is None:
        packed = PACKED_SOFTMAX_DEFAULT
    if stacked is None:
        stacked = STACKED_SOFTMAX_DEFAULT
    if lanes is None:
        lanes = LANES_SOFTMAX_DEFAULT
    kw.setdefault("ablate", os.environ.get("AMPNET_ABLATE", ""))
    if kw.get("mm_scatter") is None:
        kw["mm_scatter"] = MM_SCATTER_DEFAULT
    if kw.get("mxu_bf16") is None:
        kw["mxu_bf16"] = MXU_BF16_DEFAULT
    return _fused_attention_out_v6_impl(
        *args, packed=packed, stacked=stacked, lanes=lanes, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "softmax", "tile_nodes", "group",
                     "num_tiles", "emax", "s", "interpret", "compact",
                     "packed", "stacked", "lanes", "ablate", "mm_scatter",
                     "mxu_bf16"),
)
def _fused_attention_out_v6_impl(
    x_rows: jnp.ndarray,         # [NT*SP, D] raw token rows (pre-projection)
    w_qkv: jnp.ndarray,          # [D, 3D]
    b_qkv: jnp.ndarray,          # [1, 3D]
    w_out: jnp.ndarray,          # [D, D]
    b_out: jnp.ndarray,          # [1, D]
    tile_senders: jnp.ndarray,   # [T, 1, EMAX] int32
    tile_recv: jnp.ndarray,      # [T, 1, EMAX]
    tile_valid: jnp.ndarray,     # [T, 1, EMAX]
    tile_counts: jnp.ndarray,    # [T] int32 STRUCTURAL live-edge counts
    invdeg: jnp.ndarray,         # [T, 1, TN] f32 1/degree (0 where deg 0)
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
    lanes: bool = False,
    ablate: str = "",
    mm_scatter: bool = False,
    mxu_bf16: bool = False,
):
    """Whole-layer fused op (v6 kernel): raw rows in, layer output rows out."""
    sp = x_rows.shape[0] // (num_tiles * tile_nodes)
    d = x_rows.shape[1]
    tn = tile_nodes
    ngroups = ((tile_counts.astype(jnp.int32) + group - 1) // group).reshape(
        1, num_tiles
    )
    if mm_scatter:
        ngmax = -(-emax // group)
        eg = ngmax * group
        recv_eg = _rep8(jnp.pad(
            tile_recv.reshape(num_tiles, emax), ((0, 0), (0, eg - emax))))
        valid_eg = _rep8(jnp.pad(
            tile_valid.reshape(num_tiles, emax), ((0, 0), (0, eg - emax))))
        invdeg_vm = _rep8(invdeg.reshape(num_tiles, tn))
        kernel = functools.partial(
            _fused_kernel_vmem_v6_mm,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax, tile_nodes=tn, compact=compact, packed=packed,
            stacked=stacked, lanes=lanes, mxu_bf16=mxu_bf16,
        )
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((1, num_tiles), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, eg), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, eg), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, tn), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((x_rows.shape[0], d), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3 * d), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * d), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tn * sp, d), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_tiles * tn * sp, d),
                                           x_rows.dtype),
            scratch_shapes=[
                pltpu.VMEM((num_tiles * tn * sp, 2 * d), x_rows.dtype),
                pltpu.VMEM((tn * sp, d), x_rows.dtype),
                pltpu.VMEM((tn * sp, d), jnp.float32),
                pltpu.VMEM((group * sp, d), x_rows.dtype),
                pltpu.VMEM((group * sp, 2 * d), x_rows.dtype),
                pltpu.VMEM((sp, eg, d), jnp.float32),          # msgT
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_V6_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(ngroups, tile_senders, tile_recv, tile_valid, recv_eg, valid_eg,
          invdeg_vm, x_rows, w_qkv, b_qkv, w_out, b_out)
    kernel = functools.partial(
        _fused_kernel_vmem_v6,
        s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
        softmax=softmax, tile_nodes=tn, compact=compact, packed=packed,
        stacked=stacked, lanes=lanes, ablate=ablate, mxu_bf16=mxu_bf16,
    )
    scratch = [
        pltpu.VMEM((num_tiles * tn * sp, 2 * d), x_rows.dtype),  # kvscr
        pltpu.VMEM((tn * sp, d), x_rows.dtype),                  # qscr
        pltpu.VMEM((tn * sp, d), jnp.float32),                   # acc
        pltpu.VMEM((group * sp, d), x_rows.dtype),               # qbuf
        pltpu.VMEM((group * sp, 2 * d), x_rows.dtype),           # kvbuf
    ]
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, num_tiles), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tn), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((x_rows.shape[0], d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tn * sp, d), x_rows.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_V6_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(ngroups, tile_senders, tile_recv, tile_valid, invdeg,
      x_rows, w_qkv, b_qkv, w_out, b_out)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "softmax", "tile_nodes", "group", "num_tiles", "emax", "s", "gather", "interpret"),
)
def _fused_edge_sums(
    q_rows: jnp.ndarray,      # [N*S, D]
    kv_rows: jnp.ndarray,     # [N*S, 2D]
    tile_senders: jnp.ndarray,   # [T, EMAX] int32
    tile_recv: jnp.ndarray,      # [T, EMAX]
    tile_valid: jnp.ndarray,     # [T, EMAX]
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
):
    sp = q_rows.shape[0] // (num_tiles * tile_nodes)
    d = q_rows.shape[1]
    tn = tile_nodes

    if gather == "vmem":
        kernel = functools.partial(
            _fused_kernel_vmem,
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
        ]
    else:
        kernel = functools.partial(
            _fused_kernel,
            s=s, sp=sp, d=d, num_heads=num_heads, group=group, emax=emax,
            softmax=softmax,
        )
        kv_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((tn * sp, d), jnp.float32),
            pltpu.VMEM((group * sp, d), q_rows.dtype),
            pltpu.VMEM((2, group * sp, 2 * d), kv_rows.dtype),
            pltpu.SemaphoreType.DMA((2, group)),
        ]
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            kv_spec,
        ],
        out_specs=pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * tn * sp, d), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tile_senders, tile_recv, tile_valid, q_rows, kv_rows)


def amp_edge_attention_pallas_core(
    x: jnp.ndarray,              # [N, S, D]
    params: MHAParams,
    tcsr: TiledCSR,
    receivers: jnp.ndarray,      # [E] (for degree counts)
    edge_mask: Optional[jnp.ndarray],
    num_heads: int,
    softmax: bool = True,
    gather: str = "auto",
    group: int = 0,
    interpret: bool = False,
    stream_bf16: Optional[bool] = None,
) -> jnp.ndarray:
    """Projection (XLA) -> fused kernel (Pallas) -> mean + out-proj (XLA)."""
    if stream_bf16 is None:
        stream_bf16 = STREAM_BF16_DEFAULT
    n, s, d = x.shape
    # pad tokens-per-node to a sublane-aligned row stride so the kernel's
    # dynamic HBM/VMEM slices meet Mosaic's (8/16, 128) tiling rules.
    # Padding BEFORE the projection costs 3x less copy traffic; pad rows
    # become b_qkv, which the kernel's masking nulls (see above).
    align = _stream_align(x.dtype, stream_bf16)
    sp = -(-s // align) * align
    if sp != s:
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    n_tiles_nodes = tcsr.num_tiles * tcsr.tile_nodes
    # v2/dma kv_rows carry the PROMOTED dtype (bf16 x against f32 params
    # projects to f32), so size the resident-K|V estimate on that, not on
    # x.dtype alone
    kv_itemsize = (2 if stream_bf16 else jnp.dtype(
        jnp.result_type(x.dtype, params.w_qkv.dtype)).itemsize)
    gather = _resolve_gather(gather, max(n, n_tiles_nodes) * sp, d,
                             kv_itemsize, tile_rows=tcsr.tile_nodes * sp)

    g6 = group if group else _auto_group(sp, tcsr.edges_per_tile, gather)
    if _v6_usable(n, n_tiles_nodes, sp, d, x.dtype, tcsr.tile_nodes, g6,
                  gather, num_heads=num_heads):
        counts = (jnp.asarray(tcsr.counts) if tcsr.counts is not None
                  else _structural_counts(jnp.asarray(tcsr.valid)[:, None, :]))
        return _v6_call(
            x, params,
            jnp.asarray(tcsr.senders)[:, None, :],
            jnp.asarray(tcsr.recv_local)[:, None, :],
            jnp.asarray(tcsr.valid)[:, None, :], counts,
            receivers, edge_mask, num_heads=num_heads, softmax=softmax,
            tile_nodes=tcsr.tile_nodes, group=g6, num_tiles=tcsr.num_tiles,
            emax=tcsr.edges_per_tile, s=s, interpret=interpret,
        )

    qkv = x @ params.w_qkv + params.b_qkv
    q_rows = qkv[..., :d].reshape(n * sp, d)
    kv_rows = qkv[..., d:].reshape(n * sp, 2 * d)
    if n_tiles_nodes > n:  # pad node rows so the tile grid covers them
        pad = (n_tiles_nodes - n) * sp
        q_rows = jnp.pad(q_rows, ((0, pad), (0, 0)))
        kv_rows = jnp.pad(kv_rows, ((0, pad), (0, 0)))
    if stream_bf16:
        q_rows = q_rows.astype(jnp.bfloat16)
        kv_rows = kv_rows.astype(jnp.bfloat16)

    if gather == "vmem" or not DMA_V1_DEFAULT:
        counts = (jnp.asarray(tcsr.counts) if tcsr.counts is not None
                  else _structural_counts(jnp.asarray(tcsr.valid)[:, None, :]))
        sums = _fused_edge_sums_v2(
            q_rows, kv_rows,
            jnp.asarray(tcsr.senders)[:, None, :],
            jnp.asarray(tcsr.recv_local)[:, None, :],
            jnp.asarray(tcsr.valid)[:, None, :], counts,
            num_heads=num_heads, softmax=softmax,
            tile_nodes=tcsr.tile_nodes,
            group=group if group else _auto_group(sp, tcsr.edges_per_tile, gather),
            num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile, s=s,
            gather=gather, interpret=interpret,
        )
    else:
        sums = _fused_edge_sums(
            q_rows, kv_rows,
            jnp.asarray(tcsr.senders)[:, None, :], jnp.asarray(tcsr.recv_local)[:, None, :],
            jnp.asarray(tcsr.valid)[:, None, :],
            num_heads=num_heads, softmax=softmax,
            tile_nodes=tcsr.tile_nodes, group=8 if tcsr.edges_per_tile % 8 == 0 else 1,
            num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile, s=s,
            gather=gather, interpret=interpret,
        )
    sums = sums[: n * sp].reshape(n, sp, d)[:, :s, :]
    count = segment_count(receivers, n, edge_mask)
    mean = sums / jnp.maximum(count, 1.0)[:, None, None]
    out = mean.astype(x.dtype) @ params.w_out + params.b_out
    return jnp.where((count > 0)[:, None, None], out, 0.0)


def amp_edge_attention_pallas(
    x: jnp.ndarray,                 # [N, S, D]
    params: MHAParams,
    senders: jnp.ndarray,           # [E] (backward pass + degree counts)
    receivers: jnp.ndarray,         # [E]
    edge_mask: Optional[jnp.ndarray],
    tile_senders: jnp.ndarray,      # [T, EMAX] from build_tiled_csr
    tile_recv: jnp.ndarray,         # [T, EMAX]
    tile_valid: jnp.ndarray,        # [T, EMAX]
    num_heads: int,
    softmax: bool = True,
    tile_nodes: int = DEFAULT_TILE_NODES,
    gather: str = "auto",
    fused_bwd: bool = True,
    interpret: bool = False,
    tile_counts: Optional[jnp.ndarray] = None,  # [T] STRUCTURAL counts —
    # REQUIRED when tile_valid carries a runtime mask (edge dropout): trip
    # counts must cover all structural slots even if some are dropped
    snd_receivers: Optional[jnp.ndarray] = None,  # [T, EMAXS] transposed
    snd_local: Optional[jnp.ndarray] = None,      # (sender-tiled) layout —
    snd_valid: Optional[jnp.ndarray] = None,      # STRUCTURAL validity —
    snd_counts: Optional[jnp.ndarray] = None,     # enables the scatter-
    snd_edge_slot: Optional[jnp.ndarray] = None,  # free backward (pass S)
    scatterfree: Optional[bool] = None,  # None = AMPNET_SCATTERFREE_BWD
    stream_bf16: Optional[bool] = None,  # None = AMPNET_STREAM_BF16
    direct_q: Optional[bool] = None,     # None = AMPNET_DMA_DIRECT_Q
    mm_scatter: Optional[bool] = None,   # None = AMPNET_MM_SCATTER
    mxu_bf16: Optional[bool] = None,     # None = AMPNET_MXU_BF16
    group: int = 0,                      # 0 = _auto_group (fwd kernel only)
    compact: bool = True,                # False = legacy block-diag body
) -> jnp.ndarray:
    """Jittable fused edge attention with a DYNAMIC tiled-CSR layout.

    The layout arrays are data (built per subgraph on host by
    build_tiled_csr with a fixed edges_per_tile budget), so GraphSAINT
    subgraphs with differing edges share one compiled executable.
    custom VJP: fused Pallas backward by default — scatter-free two-pass
    (edge_attention_bwd_scatterfree.py) when the transposed snd_* layout
    is provided, else the dK|dV-stream backward (edge_attention_bwd.py);
    fused_bwd=False falls back to recompute through the XLA path.
    """
    num_tiles, emax = tile_senders.shape
    n, s, d = x.shape
    # tile_nodes must MATCH the value the layout arrays were built with
    # (recv_local = receiver % tile_nodes at build time); a mismatch reads
    # wrong rows silently. Static check: the tile grid must cover x's rows
    # exactly (t = ceil(n / tile_nodes) at build, so (t-1)*tn < n <= t*tn).
    if not ((num_tiles - 1) * tile_nodes < n <= num_tiles * tile_nodes):
        raise ValueError(
            f"tile_nodes={tile_nodes} inconsistent with layout: {num_tiles} "
            f"tiles x {tile_nodes} vs {n} node rows — pass the tile_nodes "
            f"the layout was built with (build_tiled_csr/compute_layout)"
        )
    tcsr_like = TiledCSR(
        tile_senders[:, None, :], tile_recv[:, None, :], tile_valid[:, None, :],
        tile_nodes, num_tiles, emax, counts=tile_counts,
    )
    if scatterfree is None:
        scatterfree = SCATTERFREE_BWD_DEFAULT
    snd_tcsr = None
    if scatterfree and snd_receivers is not None:
        t_s, emax_s = snd_receivers.shape
        if t_s != num_tiles:
            raise ValueError(
                f"sender layout has {t_s} tiles vs receiver layout's "
                f"{num_tiles} — both must be built with the same "
                f"tile_nodes over the same padded node count"
            )
        sv = snd_valid
        if edge_mask is not None and snd_edge_slot is not None:
            # scatter the RUNTIME edge mask (adjacency dropout) into the
            # sender layout's validity slots, mirroring what the caller
            # does for the receiver layout; trip counts stay STRUCTURAL
            slot = jnp.where(snd_edge_slot < 0, t_s * emax_s, snd_edge_slot)
            flat = jnp.zeros((t_s * emax_s + 1,), jnp.int32).at[slot].set(
                edge_mask.astype(jnp.int32))
            sv = flat[:-1].reshape(t_s, emax_s)
        scounts = (snd_counts if snd_counts is not None
                   else jnp.sum((snd_valid != 0).astype(jnp.int32), axis=-1))
        snd_tcsr = TiledCSR(
            snd_receivers[:, None, :], snd_local[:, None, :], sv[:, None, :],
            tile_nodes, t_s, emax_s, counts=scounts,
        )
    if stream_bf16 is None:
        stream_bf16 = STREAM_BF16_DEFAULT
    if direct_q is None:
        direct_q = DMA_DIRECT_Q_DEFAULT
    if mm_scatter is None:
        mm_scatter = MM_SCATTER_DEFAULT
    if mxu_bf16 is None:
        mxu_bf16 = MXU_BF16_DEFAULT
    align = _stream_align(x.dtype, stream_bf16)
    sp = -(-s // align) * align
    gather = _resolve_gather(
        gather, max(n, num_tiles * tile_nodes) * sp, d,
        # kv rows carry the PROMOTED projection dtype (bf16 x vs f32
        # params -> f32) — size the resident estimate on that; bf16
        # streams halve it
        2 if stream_bf16 else
        jnp.dtype(jnp.result_type(x.dtype, params.w_qkv.dtype)).itemsize,
        tile_rows=tile_nodes * sp,
    )  # resolved ONCE so fwd and bwd agree

    @jax.custom_vjp
    def fused(x, params):
        return _pallas_core_dynamic(
            x, params, tcsr_like, receivers, edge_mask, num_heads, softmax,
            gather, interpret, stream_bf16=stream_bf16, direct_q=direct_q,
            group=group, mm_scatter=mm_scatter, mxu_bf16=mxu_bf16,
            compact=compact,
        )

    def fwd(x, params):
        # stash the aggregation sums + counts so the fused backward skips
        # the forward-kernel recompute
        out, sums, count = _pallas_core_dynamic(
            x, params, tcsr_like, receivers, edge_mask, num_heads, softmax,
            gather, interpret, return_parts=True, stream_bf16=stream_bf16,
            direct_q=direct_q, group=group, mm_scatter=mm_scatter,
            mxu_bf16=mxu_bf16, compact=compact,
        )
        return out, (x, params, sums, count)

    def bwd_xla(res, g):
        x_, params_ = res[0], res[1]

        def ref_fn(x_, params_):
            out, _ = amp_edge_attention(
                x_, senders, receivers, edge_mask, params_, num_heads,
                softmax=softmax, return_weights=False,
            )
            return out

        _, vjp = jax.vjp(ref_fn, x_, params_)
        return vjp(g)

    def bwd_fused(res, g):
        x_, params_, sums_, count_ = res
        return _pallas_bwd_dynamic(
            x_, params_, g, tcsr_like, receivers, edge_mask, num_heads,
            softmax, gather, interpret, sums=sums_, count=count_,
            snd_tcsr=snd_tcsr, stream_bf16=stream_bf16,
        )

    fused.defvjp(fwd, bwd_fused if fused_bwd else bwd_xla)
    return fused(x, params)


def _pallas_bwd_dynamic(
    x, params, gout, tcsr, receivers, edge_mask, num_heads, softmax,
    gather, interpret, sums=None, count=None, snd_tcsr=None,
    stream_bf16=False,
):
    """Full backward: out-proj/mean grads (XLA) -> pass A kernel
    (recompute + dQ/dK/dV) -> sender segment-sum + projection grads (XLA).
    See ops/pallas/edge_attention_bwd.py. With snd_tcsr (the transposed
    sender-tiled layout), the scatter-free two-pass backward replaces
    both the dK|dV stream and pass B's segment-sum/chunked fold — see
    ops/pallas/edge_attention_bwd_scatterfree.py."""
    from ampnet_tpu.ops.pallas.edge_attention_bwd import (
        fused_edge_bwd,
        fused_edge_bwd_v2,
        pad_flat_to_eg,
    )
    from ampnet_tpu.ops.segment import segment_sum

    n, s, d = x.shape
    align = _stream_align(x.dtype, stream_bf16)
    sp = -(-s // align) * align
    qkv = x @ params.w_qkv + params.b_qkv
    if sp != s:
        qkv = jnp.pad(qkv, ((0, 0), (0, sp - s), (0, 0)))
    q_rows = qkv[..., :d].reshape(n * sp, d)
    kv_rows = qkv[..., d:].reshape(n * sp, 2 * d)
    nt = tcsr.num_tiles * tcsr.tile_nodes
    if nt > n:
        pad = (nt - n) * sp
        q_rows = jnp.pad(q_rows, ((0, pad), (0, 0)))
        kv_rows = jnp.pad(kv_rows, ((0, pad), (0, 0)))
    if stream_bf16:
        # the dsum/qdm streams follow via the existing
        # .astype(q_rows.dtype) casts at every kernel call below
        q_rows = q_rows.astype(jnp.bfloat16)
        kv_rows = kv_rows.astype(jnp.bfloat16)

    if count is None:
        count = segment_count(receivers, n, edge_mask)
    m0 = (count > 0)[:, None, None]
    gm = jnp.where(m0, gout, 0.0)
    vmem = gather == "vmem"
    # _auto_group handles both modes: compact groups everywhere except
    # the legacy v1 dma body (AMPNET_DMA_V1=1), which keeps G | EMAX
    group = _auto_group(sp, tcsr.edges_per_tile, gather)
    counts = (tcsr.counts if getattr(tcsr, "counts", None) is not None
              else _structural_counts(tcsr.valid))

    if sums is None:
        # no residuals available: recompute via one extra forward pass.
        # Routing mirrors _pallas_core_dynamic: the compact v2 body serves
        # both gather modes unless the legacy v1 dma body is forced —
        # `group` above came from _auto_group's compact branch, which
        # breaks the v1 body's G | EMAX packing contract (unclamped
        # gi*g+j SMEM indexing past EMAX).
        if vmem or not DMA_V1_DEFAULT:
            sums_rows = _fused_edge_sums_v2(
                q_rows, kv_rows, tcsr.senders, tcsr.recv_local, tcsr.valid,
                counts,
                num_heads=num_heads, softmax=softmax, tile_nodes=tcsr.tile_nodes,
                group=group, num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile,
                s=s, gather=gather, interpret=interpret,
            )
        else:
            sums_rows = _fused_edge_sums(
                q_rows, kv_rows, tcsr.senders, tcsr.recv_local, tcsr.valid,
                num_heads=num_heads, softmax=softmax, tile_nodes=tcsr.tile_nodes,
                group=group, num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile, s=s,
                gather=gather, interpret=interpret,
            )
        sums = sums_rows[: n * sp].reshape(n, sp, d)[:, :s, :]
    mean = sums / jnp.maximum(count, 1.0)[:, None, None]

    # out-projection grads
    d_wout = jnp.einsum("nsd,nse->de", mean, gm, preferred_element_type=jnp.float32)
    d_bout = jnp.sum(gm, axis=(0, 1))
    # gradient w.r.t. the per-receiver SUM of messages
    dsum = (gm @ params.w_out.T) / jnp.maximum(count, 1.0)[:, None, None]
    dsum_rows = dsum
    if sp != s:
        dsum_rows = jnp.pad(dsum_rows, ((0, 0), (0, sp - s), (0, 0)))
    dsum_rows = dsum_rows.reshape(n * sp, d)
    if nt > n:
        dsum_rows = jnp.pad(dsum_rows, ((0, (nt - n) * sp), (0, 0)))

    emax = tcsr.edges_per_tile
    if snd_tcsr is not None:
        # SCATTER-FREE two-pass backward: pass R (receiver-tiled) locally
        # accumulates dQ, pass S (sender-tiled) locally accumulates
        # dK|dV — no per-edge stream, no pass-B scatter, no chunked fold.
        from ampnet_tpu.ops.pallas.edge_attention_bwd_scatterfree import (
            fused_edge_bwd_dq,
            fused_edge_bwd_dkv,
        )

        dq_rows = fused_edge_bwd_dq(
            q_rows, kv_rows, dsum_rows.astype(q_rows.dtype),
            tcsr.senders, tcsr.recv_local, tcsr.valid, counts,
            num_heads=num_heads, softmax=softmax,
            tile_nodes=tcsr.tile_nodes, group=group,
            num_tiles=tcsr.num_tiles, emax=emax, s=s, gather=gather,
            interpret=interpret,
        )
        qdm_rows = jnp.concatenate(
            [q_rows, dsum_rows.astype(q_rows.dtype)], axis=1)
        scounts = (snd_tcsr.counts if snd_tcsr.counts is not None
                   else _structural_counts(snd_tcsr.valid))
        group_s = _auto_group(sp, snd_tcsr.edges_per_tile, gather)
        dkv_rows = fused_edge_bwd_dkv(
            qdm_rows, kv_rows,
            snd_tcsr.senders, snd_tcsr.recv_local, snd_tcsr.valid, scounts,
            num_heads=num_heads, softmax=softmax,
            tile_nodes=snd_tcsr.tile_nodes, group=group_s,
            num_tiles=snd_tcsr.num_tiles, emax=snd_tcsr.edges_per_tile,
            s=s, gather=gather, interpret=interpret,
        )
        dq_nodes = dq_rows[: n * sp].reshape(n, sp, d)[:, :s, :]
        dkv_nodes = dkv_rows[: n * sp].reshape(n, sp, 2 * d)[:, :s, :]
        return _finish_bwd(x, params, dq_nodes, dkv_nodes, d_wout, d_bout)
    if vmem:
        dq_rows, dkv_stream = fused_edge_bwd_v2(
            q_rows, kv_rows, dsum_rows.astype(q_rows.dtype),
            tcsr.senders, tcsr.recv_local, tcsr.valid, counts,
            num_heads=num_heads, softmax=softmax, tile_nodes=tcsr.tile_nodes,
            group=group, num_tiles=tcsr.num_tiles, emax=emax, s=s,
            interpret=interpret,
        )
        flat_senders = pad_flat_to_eg(tcsr.senders.reshape(tcsr.num_tiles, emax),
                                      emax, group)
        flat_valid = pad_flat_to_eg(tcsr.valid.reshape(tcsr.num_tiles, emax),
                                    emax, group) != 0
        eg = -(-emax // group) * group
        stream = dkv_stream.reshape(tcsr.num_tiles * eg, sp, 2 * d)
    else:
        # Tile-chunked pass A + B: the per-edge dK|dV stream at production
        # scale is E*SP*2D*4 bytes (1M edges, S=20, D=128 -> ~25 GB — more
        # than the chip's HBM, VERDICT r1 weak-#9). Running pass A on a
        # slice of tiles and folding its stream into the dkv accumulator
        # before the next slice caps the live stream at
        # AMPNET_STREAM_CHUNK_BYTES; total FLOPs/traffic are unchanged.
        # the compact dma body writes its stream at the GROUP-ALIGNED
        # stride EG = ceil(EMAX/G)*G (free of the v1 G | EMAX contract);
        # under the legacy body group divides emax, so EG == EMAX
        ebg = -(-emax // group) * group
        stream_rows_total = tcsr.num_tiles * ebg * sp
        chunk_budget = _STREAM_CHUNK_BYTES
        n_chunks = max(1, -(-stream_rows_total * 2 * d * 4 // chunk_budget))
        tc = -(-tcsr.num_tiles // n_chunks)          # tiles per chunk
        n_chunks = -(-tcsr.num_tiles // tc)
        rows_per_tile = tcsr.tile_nodes * sp
        dsum_cast = dsum_rows.astype(q_rows.dtype)
        dq_parts = []
        dkv_nodes_rows = jnp.zeros((nt, sp, 2 * d), jnp.float32)
        for ci in range(n_chunks):
            t0, t1 = ci * tc, min((ci + 1) * tc, tcsr.num_tiles)
            ntc = t1 - t0
            dq_c, stream_c = fused_edge_bwd(
                q_rows[t0 * rows_per_tile : t1 * rows_per_tile],
                kv_rows,
                dsum_cast[t0 * rows_per_tile : t1 * rows_per_tile],
                tcsr.senders[t0:t1], tcsr.recv_local[t0:t1], tcsr.valid[t0:t1],
                num_heads=num_heads, softmax=softmax, tile_nodes=tcsr.tile_nodes,
                group=group, num_tiles=ntc, emax=emax, s=s,
                gather=gather, interpret=interpret,
                tile_counts=counts[t0:t1],
            )
            dq_parts.append(dq_c)
            fs = pad_flat_to_eg(tcsr.senders[t0:t1].reshape(ntc, emax),
                                emax, group)
            fv = pad_flat_to_eg(tcsr.valid[t0:t1].reshape(ntc, emax),
                                emax, group) != 0
            # fold IN PLACE (scatter-add into the accumulator, which XLA
            # can alias) rather than `acc + segment_sum(...)`: the latter
            # let the scheduler materialize every chunk's [nt, SP, 2D]
            # partial before the adds — 6x 2.29 GB live at 1M edges, OOM.
            contrib = jnp.where(
                fv[:, None, None], stream_c.reshape(ntc * ebg, sp, 2 * d), 0.0
            )
            dkv_nodes_rows = dkv_nodes_rows.at[fs].add(contrib)
            # serialize the chunks: the next pass A reads the barriered
            # kv_rows, so it cannot be hoisted ahead of this fold — only
            # one chunk's dK|dV stream is ever live.
            dkv_nodes_rows, kv_rows = jax.lax.optimization_barrier(
                (dkv_nodes_rows, kv_rows))
        dq_rows = jnp.concatenate(dq_parts, axis=0) if len(dq_parts) > 1 else dq_parts[0]
        dkv_nodes = dkv_nodes_rows[:n, :s, :]
        dq_nodes = dq_rows[: n * sp].reshape(n, sp, d)[:, :s, :]
        return _finish_bwd(x, params, dq_nodes, dkv_nodes, d_wout, d_bout)
    dq_nodes = dq_rows[: n * sp].reshape(n, sp, d)[:, :s, :]

    # pass B: scatter dK|dV to sender nodes via masked segment-sum over the
    # layout's flattened sender ids (never-written rows of skipped padded
    # groups are excluded by the validity mask)
    dkv_nodes = segment_sum(stream, flat_senders, nt, flat_valid)
    dkv_nodes = dkv_nodes[:n, :s, :]                   # [N, S, 2D]
    return _finish_bwd(x, params, dq_nodes, dkv_nodes, d_wout, d_bout)


def _finish_bwd(x, params, dq_nodes, dkv_nodes, d_wout, d_bout):
    """In-projection grads WITHOUT materializing the [N, S, 3D] concat
    (at N=100k/S=20/D=128 that buffer alone is 3.7 GB): dq and dkv flow
    through separate matmuls against the split w_qkv columns."""
    d = dq_nodes.shape[-1]
    w_q, w_kv = params.w_qkv[:, :d], params.w_qkv[:, d:]
    dx = (dq_nodes @ w_q.T + dkv_nodes @ w_kv.T).astype(x.dtype)
    d_wq = jnp.einsum("nsd,nse->de", x, dq_nodes, preferred_element_type=jnp.float32)
    d_wkv = jnp.einsum("nsd,nse->de", x, dkv_nodes, preferred_element_type=jnp.float32)
    d_wqkv = jnp.concatenate([d_wq, d_wkv], axis=1)
    d_bqkv = jnp.concatenate(
        [jnp.sum(dq_nodes, axis=(0, 1)), jnp.sum(dkv_nodes, axis=(0, 1))]
    )
    return dx, MHAParams(
        w_qkv=d_wqkv.astype(params.w_qkv.dtype),
        b_qkv=d_bqkv.astype(params.b_qkv.dtype),
        w_out=d_wout.astype(params.w_out.dtype),
        b_out=d_bout.astype(params.b_out.dtype),
    )


# VMEM-resident K|V budget: the kernel pins the whole projected [rows, 2D]
# block in VMEM (~128 MB/core, 100 MB compiler scoped limit; leave room
# for the acc/out/q scratch). Above this, fall back to the per-edge
# DMA-gather kernel (HBM-resident K|V) — slower at Cora scale but the
# only single-chip option at large N*S (RESULTS.md production-scale row).
_VMEM_KV_BUDGET = int(os.environ.get("AMPNET_VMEM_KV_BUDGET", 80 * 1024 * 1024))

# Combined K|V + tile-working-set ceiling for the residency decision
# (_resolve_gather): must stay under the 100 MB compiler scoped limit
# with margin for the softmax stack temporaries.
_VMEM_TOTAL_BUDGET = int(
    os.environ.get("AMPNET_VMEM_TOTAL_BUDGET", 96 * 1024 * 1024)
)

# Cap on the LIVE portion of the backward dK|dV edge stream (pass A output
# consumed by pass B). Tiles are processed in chunks sized to keep the
# stream under this many bytes, so the 1M-edge train step fits single-chip
# (full stream would be ~25 GB > HBM).
_STREAM_CHUNK_BYTES = int(
    os.environ.get("AMPNET_STREAM_CHUNK_BYTES", 1024 * 1024 * 1024)
)


def _v6_usable(n: int, n_tiles_nodes: int, sp: int, d: int, dtype,
               tile_nodes: int, group: int, gather: str,
               num_heads: int = 1) -> bool:
    """v6 preconditions: enabled, vmem gather, the tile grid covers every
    node (kvscr is sized to the grid; senders index all N nodes), and the
    full VMEM accounting fits the raised budget."""
    itemsize = jnp.dtype(dtype).itemsize
    return (FUSE_PROJ_DEFAULT and gather == "vmem"
            and n_tiles_nodes >= n
            and _v6_fits(n_tiles_nodes * sp, d, itemsize,
                         tile_rows=tile_nodes * sp,
                         group_rows=group * sp,
                         sp=sp, num_heads=num_heads))


def _v6_call(x, params, senders3, recv3, valid3, counts, receivers,
             edge_mask, *, num_heads, softmax, tile_nodes, group,
             num_tiles, emax, s, interpret, mm_scatter=None,
             mxu_bf16=None, compact=True):
    """Shared v6 dispatch: pad raw rows to the tile grid, fold runtime
    degrees into invdeg tiles, cast params to the compute dtype, call the
    whole-layer kernel, and slice the output back to [N, S, D]."""
    n, sp, d = x.shape
    nt = num_tiles * tile_nodes
    x_rows = x.reshape(n * sp, d)
    if nt > n:
        x_rows = jnp.pad(x_rows, ((0, (nt - n) * sp), (0, 0)))
    count = segment_count(receivers, n, edge_mask)
    invdeg = jnp.where(count > 0, 1.0 / jnp.maximum(count, 1.0), 0.0)
    invdeg = jnp.pad(invdeg.astype(jnp.float32), (0, nt - n)).reshape(
        num_tiles, 1, tile_nodes)
    dt = x.dtype
    rows = _fused_attention_out_v6(
        x_rows, params.w_qkv.astype(dt),
        params.b_qkv.reshape(1, 3 * d).astype(dt),
        params.w_out.astype(dt), params.b_out.reshape(1, d).astype(dt),
        senders3, recv3, valid3, counts, invdeg,
        num_heads=num_heads, softmax=softmax, tile_nodes=tile_nodes,
        group=group, num_tiles=num_tiles, emax=emax, s=s,
        interpret=interpret, mm_scatter=mm_scatter, mxu_bf16=mxu_bf16,
        compact=compact,
    )
    return rows[: n * sp].reshape(n, sp, d)[:, :s, :]


def _resolve_gather(gather: str, n_rows: int, d: int, itemsize: int,
                    tile_rows: int = 0) -> str:
    """gather='auto' -> 'vmem' while the resident K|V block (vs
    _VMEM_KV_BUDGET) AND the total per-core working set (K|V + pipelined
    q/out tile windows + acc scratch + group buffers, vs
    _VMEM_TOTAL_BUDGET under the 100 MB scoped limit) both fit, else
    'dma'. Explicit 'vmem'/'dma' are honored as given.

    tile_rows = tile_nodes * sp. Mosaic double-buffers the q and out tile
    windows, so the tile working set is ~5 x tile_rows x D f32 plus group
    buffers and the lane-padded softmax stack — at tn=512/Cora that is
    what pushed an approved-resident config to 102 MB > the 100 MB scoped
    limit (measured r3 probe); the residency decision now charges it."""
    if gather != "auto":
        return gather
    kv_bytes = n_rows * 2 * d * itemsize
    tile_overhead = 5 * tile_rows * d * 4 + 6 * 1024 * 1024
    return ("vmem"
            if (kv_bytes <= _VMEM_KV_BUDGET
                and kv_bytes + tile_overhead <= _VMEM_TOTAL_BUDGET)
            else "dma")


def _auto_group(sp: int, emax: int, gather: str) -> int:
    """v2 ('vmem') groups are free of the divisibility constraint; the
    COMPACT (batched-dot) bodies keep softmax/score tensors linear in G,
    so bigger groups amortize per-group overhead with no quadratic
    penalty; the measured optimum at Cora scale is G*SP ~= 768
    (kernel_probe3/3b r2: g=32 1.43 ms, g=64 1.64, g=16 1.74, g=8 2.53 —
    vs the block-diag bodies' best of 2.29 ms at g=8). The dma path's v5
    body shares the compact-group contract; only the legacy v1 DMA body
    (AMPNET_DMA_V1=1) keeps its packed-group constraint (G | EMAX)."""
    if gather == "vmem" or not DMA_V1_DEFAULT:
        return max(1, 768 // sp)
    return 8 if emax % 8 == 0 else 1


def _structural_counts(tile_valid: jnp.ndarray) -> jnp.ndarray:
    """[T, 1, EMAX] validity -> [T] live-edge counts (packed layouts)."""
    return jnp.sum((tile_valid != 0).astype(jnp.int32), axis=(1, 2))


def _pallas_core_dynamic(
    x, params, tcsr, receivers, edge_mask, num_heads, softmax, gather,
    interpret, return_parts=False, stream_bf16=False, direct_q=None,
    group=0, mm_scatter=None, mxu_bf16=None, compact=True,
):
    """Like amp_edge_attention_pallas_core but tcsr leaves are traced
    arrays already shaped [T, 1, EMAX]. return_parts=True also returns
    (sums, count) for custom-VJP residuals."""
    n, s, d = x.shape
    align = _stream_align(x.dtype, stream_bf16)
    sp = -(-s // align) * align
    if sp != s:
        # pad BEFORE projecting: 3x less pad traffic than padding the
        # [N, SP, 3D] projection. Pad rows become b_qkv (bias on zeros) —
        # harmless: the kernel masks pad K columns, masked-zero weights
        # null pad V rows, and pad Q rows are sliced off after.
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    n_tiles_nodes = tcsr.num_tiles * tcsr.tile_nodes
    if not group:
        group = _auto_group(sp, tcsr.edges_per_tile, gather)

    if (not return_parts
            and _v6_usable(n, n_tiles_nodes, sp, d, x.dtype,
                           tcsr.tile_nodes, group, gather,
                           num_heads=num_heads)):
        # v6 whole-layer kernel: raw rows in, layer output out — the QKV
        # and output projections run in-kernel, skipping the ~300 MB/layer
        # (Cora scale) of qkv + mean/out-proj HBM round-trips. Training
        # forwards (return_parts) keep the v2 split so the backward's
        # sums/count residuals stay materialized.
        counts = (tcsr.counts if tcsr.counts is not None
                  else _structural_counts(tcsr.valid))
        return _v6_call(
            x, params, tcsr.senders, tcsr.recv_local, tcsr.valid, counts,
            receivers, edge_mask, num_heads=num_heads, softmax=softmax,
            tile_nodes=tcsr.tile_nodes, group=group,
            num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile, s=s,
            interpret=interpret, mm_scatter=mm_scatter, mxu_bf16=mxu_bf16,
            compact=compact,
        )

    qkv = x @ params.w_qkv + params.b_qkv
    q_rows = qkv[..., :d].reshape(n * sp, d)
    kv_rows = qkv[..., d:].reshape(n * sp, 2 * d)
    if n_tiles_nodes > n:
        pad = (n_tiles_nodes - n) * sp
        q_rows = jnp.pad(q_rows, ((0, pad), (0, 0)))
        kv_rows = jnp.pad(kv_rows, ((0, pad), (0, 0)))
    if stream_bf16:
        q_rows = q_rows.astype(jnp.bfloat16)
        kv_rows = kv_rows.astype(jnp.bfloat16)
    if gather == "vmem" or not DMA_V1_DEFAULT:
        counts = (tcsr.counts if tcsr.counts is not None
                  else _structural_counts(tcsr.valid))
        sums = _fused_edge_sums_v2(
            q_rows, kv_rows, tcsr.senders, tcsr.recv_local, tcsr.valid, counts,
            num_heads=num_heads, softmax=softmax, tile_nodes=tcsr.tile_nodes,
            group=group, num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile,
            s=s, gather=gather, interpret=interpret, direct_q=direct_q,
            mm_scatter=mm_scatter, mxu_bf16=mxu_bf16, compact=compact,
        )
    else:
        sums = _fused_edge_sums(
            q_rows, kv_rows, tcsr.senders, tcsr.recv_local, tcsr.valid,
            num_heads=num_heads, softmax=softmax, tile_nodes=tcsr.tile_nodes,
            group=group, num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile, s=s,
            gather=gather, interpret=interpret,
        )
    sums = sums[: n * sp].reshape(n, sp, d)[:, :s, :]
    count = segment_count(receivers, n, edge_mask)
    mean = sums / jnp.maximum(count, 1.0)[:, None, None]
    out = mean.astype(x.dtype) @ params.w_out + params.b_out
    out = jnp.where((count > 0)[:, None, None], out, 0.0)
    if return_parts:
        return out, sums, count
    return out


def fused_attention_aggregate(
    q_tokens: jnp.ndarray,        # [N_loc, S, D] PROJECTED queries (local nodes)
    kv_tokens: jnp.ndarray,       # [N_all, S, 2D] PROJECTED packed K|V (global nodes)
    tile_senders: jnp.ndarray,    # [T, EMAX] GLOBAL sender ids (local receiver tiles)
    tile_recv: jnp.ndarray,       # [T, EMAX] LOCAL receiver rows
    tile_valid: jnp.ndarray,      # [T, EMAX]
    num_heads: int,
    softmax: bool = True,
    tile_nodes: int = DEFAULT_TILE_NODES,
    interpret: bool = False,
    snd_receivers: Optional[jnp.ndarray] = None,  # [Tg, EMAXS] LOCAL recv ids
    snd_local: Optional[jnp.ndarray] = None,      # [Tg, EMAXS] sender row in
    snd_valid: Optional[jnp.ndarray] = None,      # its GLOBAL tile — enables
    snd_counts: Optional[jnp.ndarray] = None,     # the scatter-free backward
    scatterfree: Optional[bool] = None,  # None = AMPNET_SCATTERFREE_BWD
) -> jnp.ndarray:
    """Fused per-edge attention + per-receiver SUM on projected tensors.

    The building block for the edge-partitioned multi-chip path
    (parallel/edge_partition.py): Q comes from the shard's local nodes,
    K|V from the all-gathered global projection, the tiled-CSR layout
    covers the shard's local receivers with global sender ids. Keeping the
    all-gather OUTSIDE this op means reverse-mode AD through shard_map
    turns it into the reduce-scatter of boundary-token gradients.

    Returns the SUM of messages per local receiver [N_loc, S, D]
    (mean-normalization, out-projection, and zero-degree masking are the
    caller's, as are the in-projections). Custom VJP: fused backward
    kernel + segment-sum of the dK|dV stream by global sender.
    """
    num_tiles, emax = tile_senders.shape
    n_loc, s, d = q_tokens.shape
    # Same hazard as amp_edge_attention_pallas: tile_nodes must match the
    # value the layout was built with (recv_local = receiver % tile_nodes
    # at build time) or recv_local maps to wrong local rows silently.
    # Static check: the tile grid must cover the local rows exactly.
    if not ((num_tiles - 1) * tile_nodes < n_loc <= num_tiles * tile_nodes):
        raise ValueError(
            f"tile_nodes={tile_nodes} inconsistent with layout: {num_tiles} "
            f"tiles x {tile_nodes} vs {n_loc} local node rows — pass the "
            f"tile_nodes the layout was built with (partition_layouts)"
        )
    n_all = kv_tokens.shape[0]
    align = 16 if q_tokens.dtype == jnp.bfloat16 else 8
    sp = -(-s // align) * align
    nt = num_tiles * tile_nodes
    group = 8 if emax % 8 == 0 else 1
    ts3 = tile_senders[:, None, :]
    tr3 = tile_recv[:, None, :]
    tv3 = tile_valid[:, None, :]
    if scatterfree is None:
        scatterfree = SCATTERFREE_BWD_DEFAULT
    use_scatterfree = scatterfree and snd_receivers is not None
    if use_scatterfree:
        t_g, emax_s = snd_receivers.shape
        # the sender grid tiles the GLOBAL (all-gathered) node axis
        if not ((t_g - 1) * tile_nodes < n_all <= t_g * tile_nodes):
            raise ValueError(
                f"sender layout grid {t_g} x {tile_nodes} inconsistent with "
                f"{n_all} global node rows — build it over the all-gathered "
                f"axis with the same tile_nodes (partition_layouts)"
            )
        ss3 = snd_receivers[:, None, :]
        sl3 = snd_local[:, None, :]
        sv3 = snd_valid[:, None, :]
        scounts = (snd_counts if snd_counts is not None
                   else jnp.sum((snd_valid != 0).astype(jnp.int32), axis=-1))

    def to_rows(t, n_rows):
        if sp != t.shape[1]:
            t = jnp.pad(t, ((0, 0), (0, sp - t.shape[1]), (0, 0)))
        rows = t.reshape(t.shape[0] * sp, t.shape[2])
        if n_rows > t.shape[0]:
            rows = jnp.pad(rows, ((0, (n_rows - t.shape[0]) * sp), (0, 0)))
        return rows

    @jax.custom_vjp
    def op(q_tokens, kv_tokens):
        q_rows = to_rows(q_tokens, nt)
        kv_rows = to_rows(kv_tokens, n_all)
        sums = _fused_edge_sums_v2(
            q_rows, kv_rows, ts3, tr3, tv3, _structural_counts(tv3),
            num_heads=num_heads, softmax=softmax, tile_nodes=tile_nodes,
            group=_auto_group(sp, emax, "vmem"), num_tiles=num_tiles,
            emax=emax, s=s, interpret=interpret,
        )
        return sums[: n_loc * sp].reshape(n_loc, sp, d)[:, :s, :]

    def fwd(q_tokens, kv_tokens):
        # layouts threaded through residuals — closing over traced arrays
        # in bwd leaks tracers across the transform boundary
        extras = (ss3, sl3, sv3, scounts) if use_scatterfree else ()
        return op(q_tokens, kv_tokens), (q_tokens, kv_tokens, ts3, tr3, tv3,
                                         *extras)

    def bwd(res, g):
        from ampnet_tpu.ops.pallas.edge_attention_bwd import (
            fused_edge_bwd_v2,
            pad_flat_to_eg,
        )
        from ampnet_tpu.ops.segment import segment_sum

        q_tokens_, kv_tokens_, ts3_, tr3_, tv3_, *extras = res
        gv2 = _auto_group(sp, emax, "vmem")
        q_rows = to_rows(q_tokens_, nt)
        kv_rows = to_rows(kv_tokens_, n_all)
        dsum_rows = to_rows(g.astype(q_rows.dtype), nt)
        if use_scatterfree:
            # scatter-free: dQ by local receiver tile, dK|dV accumulated
            # per GLOBAL sender tile over the transposed layout — no
            # stream, no segment-sum over the all-gathered axis. AD
            # through shard_map still reduce-scatters the boundary grads.
            from ampnet_tpu.ops.pallas.edge_attention_bwd_scatterfree import (
                fused_edge_bwd_dq,
                fused_edge_bwd_dkv,
            )

            ss3_, sl3_, sv3_, scounts_ = extras
            dq_rows = fused_edge_bwd_dq(
                q_rows, kv_rows, dsum_rows, ts3_, tr3_, tv3_,
                _structural_counts(tv3_),
                num_heads=num_heads, softmax=softmax, tile_nodes=tile_nodes,
                group=gv2, num_tiles=num_tiles, emax=emax, s=s,
                gather="vmem", interpret=interpret,
            )
            qdm_rows = jnp.concatenate([q_rows, dsum_rows], axis=1)
            ntg = t_g * tile_nodes
            kv_rows_g = kv_rows
            if ntg > n_all:
                kv_rows_g = jnp.pad(kv_rows, ((0, (ntg - n_all) * sp), (0, 0)))
            dkv_rows = fused_edge_bwd_dkv(
                qdm_rows, kv_rows_g, ss3_, sl3_, sv3_, scounts_,
                num_heads=num_heads, softmax=softmax, tile_nodes=tile_nodes,
                group=_auto_group(sp, emax_s, "vmem"), num_tiles=t_g,
                emax=emax_s, s=s, gather="vmem", interpret=interpret,
            )
            dq = dq_rows[: n_loc * sp].reshape(n_loc, sp, d)[:, :s, :]
            dkv = dkv_rows[: n_all * sp].reshape(n_all, sp, 2 * d)[:, :s, :]
            return dq.astype(q_tokens_.dtype), dkv.astype(kv_tokens_.dtype)
        dq_rows, dkv_stream = fused_edge_bwd_v2(
            q_rows, kv_rows, dsum_rows, ts3_, tr3_, tv3_,
            _structural_counts(tv3_),
            num_heads=num_heads, softmax=softmax, tile_nodes=tile_nodes,
            group=gv2, num_tiles=num_tiles, emax=emax, s=s,
            interpret=interpret,
        )
        dq = dq_rows[: n_loc * sp].reshape(n_loc, sp, d)[:, :s, :]
        flat_senders = pad_flat_to_eg(ts3_.reshape(num_tiles, emax), emax, gv2)
        flat_valid = pad_flat_to_eg(tv3_.reshape(num_tiles, emax), emax, gv2) != 0
        eg = -(-emax // gv2) * gv2
        stream = dkv_stream.reshape(num_tiles * eg, sp, 2 * d)
        dkv = segment_sum(stream, flat_senders, n_all, flat_valid)[:, :s, :]
        return dq.astype(q_tokens_.dtype), dkv.astype(kv_tokens_.dtype)

    op.defvjp(fwd, bwd)
    return op(q_tokens, kv_tokens)


def make_pallas_edge_attention(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes_padded: int,
    num_heads: int,
    softmax: bool = True,
    tile_nodes: int = DEFAULT_TILE_NODES,
    group: int = 0,   # 0 = auto (v2: largest G with G*SP <= 128)
    gather: str = "auto",
    interpret: bool = False,
):
    """Build a fused edge-attention closure for a FIXED graph structure
    (edge layout is precomputed host-side; sampler graphs reuse pad shapes).

    Returns fn(x [N,S,D], params) -> out [N,S,D] with custom VJP: the
    backward pass recomputes gradients through the XLA reference path.
    """
    tcsr = build_tiled_csr(
        senders, receivers, edge_mask, num_nodes_padded, tile_nodes,
        max(group, 1),  # v2 needs no group|EMAX divisibility; keep EMAX%128==0
    )
    receivers_j = jnp.asarray(receivers)
    mask_j = None if edge_mask is None else jnp.asarray(edge_mask)
    senders_j = jnp.asarray(senders)

    @jax.custom_vjp
    def fused(x, params):
        return amp_edge_attention_pallas_core(
            x, params, tcsr, receivers_j, mask_j, num_heads, softmax,
            gather, group, interpret,
        )

    def fwd(x, params):
        return fused(x, params), (x, params)

    def bwd(res, g):
        x, params = res

        def ref_fn(x, params):
            out, _ = amp_edge_attention(
                x, senders_j, receivers_j, mask_j, params, num_heads,
                softmax=softmax, return_weights=False,
            )
            return out

        _, vjp = jax.vjp(ref_fn, x, params)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused
