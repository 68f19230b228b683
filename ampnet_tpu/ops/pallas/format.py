"""Tiled-CSR edge format for the fused Pallas edge-attention kernel.

Receiver-sorted edges are bucketed by node tile (TN receivers per tile)
and padded to a common per-tile edge budget (multiple of the kernel's
edge-group size G), so the kernel runs a static grid over node tiles with
a static inner loop over edge groups. Built once per padded graph on host
(replacing torch_sparse's CSR machinery — SURVEY §2.7) and reused every
step.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

# Library-wide default node-tile size. 256 measured faster than 64 at
# Cora scale with exact parity — fewer partial edge groups per tile
# (probe11 fwd 0.955x; probe12 full train step 0.940-0.951x, r3). Layouts
# carry their tile_nodes, so consumers follow whatever the builder used.
DEFAULT_TILE_NODES = 256


class TiledCSR(NamedTuple):
    senders: np.ndarray      # [T, EMAX] int32 global sender node id
    recv_local: np.ndarray   # [T, EMAX] int32 receiver row within tile
    valid: np.ndarray        # [T, EMAX] int32 0/1 edge validity
    tile_nodes: int          # TN
    num_tiles: int           # T
    edges_per_tile: int      # EMAX (multiple of group size)
    counts: Optional[np.ndarray] = None     # [T] int32 live edges per tile
    edge_slot: Optional[np.ndarray] = None  # [E] int32 flat layout slot of
    #                                         each input edge (-1 = masked):
    #                                         slot = tile * EMAX + position.
    #                                         Enables scattering a RUNTIME
    #                                         edge mask (dropout_adj) into
    #                                         the kernel's validity array.


def build_tiled_csr(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes_padded: int,
    tile_nodes: int = DEFAULT_TILE_NODES,
    group: int = 8,
    edges_per_tile: int = 0,
) -> TiledCSR:
    """Pass edges_per_tile > 0 to FIX the per-tile edge budget so layouts
    for different subgraphs share one static shape (one compiled kernel);
    raises if any tile overflows the budget."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    edge_mask = np.asarray(edge_mask).astype(bool)

    n_pad = num_nodes_padded
    tn = tile_nodes
    t = -(-n_pad // tn)

    sel = edge_mask
    s, r = senders[sel], receivers[sel]
    tile_of_edge = r // tn
    counts = np.bincount(tile_of_edge, minlength=t)
    need = int(counts.max()) if counts.size and counts.max() > 0 else group
    # multiple of the group size AND of 128 (TPU SMEM block lane constraint)
    step = int(np.lcm(group, 128))
    if edges_per_tile:
        if need > edges_per_tile:
            raise ValueError(
                f"tile edge budget {edges_per_tile} < required {need}; "
                f"raise edges_per_tile or lower tile_nodes"
            )
        if edges_per_tile % step:
            raise ValueError(f"edges_per_tile must be a multiple of {step}")
        emax = edges_per_tile
    else:
        emax = ((need + step - 1) // step) * step

    out_s = np.zeros((t, emax), np.int32)
    out_r = np.zeros((t, emax), np.int32)
    out_v = np.zeros((t, emax), np.int32)
    order = np.argsort(tile_of_edge, kind="stable")
    s, r, tile_of_edge = s[order], r[order], tile_of_edge[order]
    starts = np.zeros(t + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    # slot of each SELECTED edge (in sorted order), then scattered back to
    # original edge ids so callers can map runtime edge masks into layout
    # positions
    sel_ids = np.nonzero(sel)[0][order]
    slot_sorted = np.empty(len(sel_ids), np.int64)
    for ti in range(t):
        a, b = starts[ti], starts[ti + 1]
        k = b - a
        out_s[ti, :k] = s[a:b]
        out_r[ti, :k] = r[a:b] % tn
        out_v[ti, :k] = 1
        slot_sorted[a:b] = ti * emax + np.arange(k)
    edge_slot = np.full(len(senders), -1, np.int64)
    edge_slot[sel_ids] = slot_sorted
    if t * emax >= 2**31:
        # slots are int32 downstream (SMEM scalars); a wrapped negative
        # slot would be treated as MASKED by the runtime-mask scatter and
        # silently drop the edge from attention — fail loudly instead
        raise ValueError(
            f"layout slot space {t}x{emax} overflows int32; lower "
            f"edges_per_tile or raise tile_nodes")
    return TiledCSR(
        out_s, out_r, out_v, tn, t, emax,
        counts=counts.astype(np.int32), edge_slot=edge_slot.astype(np.int32),
    )

class ChunkedCSR(NamedTuple):
    """Receiver-centric chunked layout (kernel v5).

    Edges are grouped into CHUNKS of up to C edges sharing ONE receiver
    (high-degree receivers span several chunks). The kernel then processes
    a chunk per inner step: one Q read serves C edges, the value matmul
    over the chunk's concatenated K|V sums the chunk's messages directly
    (no per-edge scatter), and softmax runs on [H*SP, C*SP] at full lane
    width. Replaces the edge-group layout's 2 copies + 1 RMW per edge with
    ~1 guarded copy per edge + 1 RMW per chunk.
    """

    senders: np.ndarray      # [T, NCMAX*C] int32 global sender (chunk-major)
    chunk_recv: np.ndarray   # [T, NCMAX] int32 receiver row within tile
    valid: np.ndarray        # [T, NCMAX*C] int32 0/1 (may carry runtime masks)
    tile_nodes: int          # TN
    num_tiles: int           # T
    chunk_edges: int         # C
    chunks_per_tile: int     # NCMAX (multiple of 128)
    counts: Optional[np.ndarray] = None     # [T] int32 live chunks per tile
    edge_slot: Optional[np.ndarray] = None  # [E] int32 flat slot
    #                          tile * (NCMAX*C) + chunk*C + j (-1 = masked)


def build_chunked_csr(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes_padded: int,
    tile_nodes: int = DEFAULT_TILE_NODES,
    chunk_edges: int = 8,
    chunks_per_tile: int = 0,
) -> ChunkedCSR:
    """Pass chunks_per_tile > 0 to FIX the per-tile chunk budget so
    layouts for different subgraphs share one static shape."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    edge_mask = np.asarray(edge_mask).astype(bool)

    tn = tile_nodes
    c = chunk_edges
    t = -(-num_nodes_padded // tn)

    sel = np.nonzero(edge_mask)[0]
    s, r = senders[sel], receivers[sel]
    order = np.argsort(r, kind="stable")   # receiver-major
    s, r, sel = s[order], r[order], sel[order]

    # chunk index within each receiver run: ceil(deg/C) chunks per receiver
    deg = np.bincount(r, minlength=num_nodes_padded)
    chunks_of_recv = -(-deg // c)          # [N]
    tile_of_recv = np.arange(num_nodes_padded) // tn
    chunk_counts = np.bincount(tile_of_recv, weights=chunks_of_recv,
                               minlength=t).astype(np.int64)
    need = int(chunk_counts.max()) if chunk_counts.size else 1
    if chunks_per_tile:
        if need > chunks_per_tile:
            raise ValueError(
                f"tile chunk budget {chunks_per_tile} < required {need}; "
                f"raise chunks_per_tile or lower tile_nodes"
            )
        if chunks_per_tile % 128:
            raise ValueError("chunks_per_tile must be a multiple of 128")
        ncmax = chunks_per_tile
    else:
        ncmax = ((max(need, 1) + 127) // 128) * 128

    out_s = np.zeros((t, ncmax * c), np.int32)
    out_r = np.zeros((t, ncmax), np.int32)
    out_v = np.zeros((t, ncmax * c), np.int32)
    edge_slot = np.full(len(senders), -1, np.int64)

    # walk receiver runs in order; chunks land consecutively per tile
    run_starts = np.nonzero(np.diff(r, prepend=-1))[0]
    run_ends = np.append(run_starts[1:], len(r))
    next_chunk = np.zeros(t, np.int64)
    for a, b in zip(run_starts, run_ends):
        recv = int(r[a])
        ti = recv // tn
        for off in range(a, b, c):
            k = min(c, b - off)
            ci = int(next_chunk[ti])
            next_chunk[ti] += 1
            out_r[ti, ci] = recv % tn
            out_s[ti, ci * c : ci * c + k] = s[off : off + k]
            out_v[ti, ci * c : ci * c + k] = 1
            edge_slot[sel[off : off + k]] = ti * (ncmax * c) + ci * c + np.arange(k)
    counts = next_chunk.astype(np.int32)
    return ChunkedCSR(
        out_s, out_r, out_v, tn, t, c, ncmax,
        counts=counts, edge_slot=edge_slot.astype(np.int32),
    )


try:
    from flax import struct as _struct

    @_struct.dataclass
    class EdgeLayout:
        """Device-side tiled-CSR layout arrays — the data handed to the
        fused kernel (one executable across GraphSAINT subgraphs sharing a
        budget). tile_nodes is static metadata: the kernel grid geometry
        must match the builder's. tile_counts carries the STRUCTURAL
        live-edge count per tile (the v2 kernel's dynamic trip counts);
        edge_slot maps edge id -> flat layout slot for scattering runtime
        edge masks (adjacency dropout) into tile_valid."""

        tile_senders: "np.ndarray"  # [T, EMAX] (jnp or np)
        tile_recv: "np.ndarray"
        tile_valid: "np.ndarray"
        tile_counts: "np.ndarray" = None   # [T] int32
        edge_slot: "np.ndarray" = None     # [E] int32 (-1 = masked out)
        # TRANSPOSED (sender-tiled) layout for the scatter-free backward:
        # the same edges bucketed by SENDER tile, so the dK|dV backward
        # kernel accumulates into local sender rows exactly like the
        # forward accumulates messages into local receiver rows — no
        # per-edge dK|dV stream, no pass-B scatter. All None on layouts
        # built with sender_layout=False (the stream backward is used).
        snd_receivers: "np.ndarray" = None  # [T, EMAXS] GLOBAL receiver ids
        snd_local: "np.ndarray" = None      # [T, EMAXS] local sender row
        snd_valid: "np.ndarray" = None      # [T, EMAXS] structural 0/1
        snd_counts: "np.ndarray" = None     # [T] int32
        snd_edge_slot: "np.ndarray" = None  # [E] int32 (-1 = masked out)
        tile_nodes: int = _struct.field(pytree_node=False,
                                        default=DEFAULT_TILE_NODES)
except ImportError:  # pragma: no cover
    class EdgeLayout(NamedTuple):
        tile_senders: "np.ndarray"
        tile_recv: "np.ndarray"
        tile_valid: "np.ndarray"
        tile_counts: "np.ndarray" = None
        edge_slot: "np.ndarray" = None
        snd_receivers: "np.ndarray" = None
        snd_local: "np.ndarray" = None
        snd_valid: "np.ndarray" = None
        snd_counts: "np.ndarray" = None
        snd_edge_slot: "np.ndarray" = None
        tile_nodes: int = DEFAULT_TILE_NODES


def default_edge_budget(num_edges_padded: int, num_tiles: int,
                        slack: float = 2.0, group: int = 1) -> int:
    """A safe fixed per-tile budget: slack * average edges per tile,
    rounded to the SMEM-block multiple — and to lcm(group, 128) when a
    non-128-dividing group is used, so build_tiled_csr accepts its own
    companion helper's output."""
    import math

    avg = max(1, num_edges_padded // max(1, num_tiles))
    budget = int(avg * slack) + 128
    step = (128 * group) // math.gcd(128, max(group, 1))
    return ((budget + step - 1) // step) * step


def compute_layout(graph, tile_nodes: int = DEFAULT_TILE_NODES,
                   edges_per_tile: int = 0, sender_layout: bool = True,
                   snd_edges_per_tile: int = 0) -> EdgeLayout:
    """Host-side layout build for a padded Graph (numpy). Use a fixed
    edges_per_tile budget to share one executable across subgraphs
    (snd_edges_per_tile fixes the sender-tiled budget the same way; it
    is independent because it is bounded by per-tile OUT-degree where
    edges_per_tile is bounded by IN-degree)."""
    import jax.numpy as jnp

    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    mask = np.asarray(graph.edge_mask)
    tcsr = build_tiled_csr(
        senders, receivers, mask, graph.num_nodes_padded,
        tile_nodes=tile_nodes, edges_per_tile=edges_per_tile,
    )
    snd = {}
    if sender_layout and edges_per_tile and not snd_edges_per_tile:
        # a FIXED receiver budget means the caller wants one executable
        # across subgraphs — the sender layout must hold a fixed shape
        # too (avg out-degree per tile == avg in-degree per tile, so the
        # same budget is the right scale; overflow raises loudly and the
        # caller's regrow path covers both sides)
        snd_edges_per_tile = edges_per_tile
    if sender_layout:
        # the SAME edges bucketed by sender: build_tiled_csr with the
        # roles swapped — "senders" column gets the global receiver ids,
        # rows are bucketed by (and local to) the sender tile
        stcsr = build_tiled_csr(
            receivers, senders, mask, graph.num_nodes_padded,
            tile_nodes=tile_nodes, edges_per_tile=snd_edges_per_tile,
        )
        snd = dict(
            snd_receivers=jnp.asarray(stcsr.senders),
            snd_local=jnp.asarray(stcsr.recv_local),
            snd_valid=jnp.asarray(stcsr.valid),
            snd_counts=jnp.asarray(stcsr.counts),
            snd_edge_slot=jnp.asarray(stcsr.edge_slot),
        )
    return EdgeLayout(
        jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
        jnp.asarray(tcsr.valid), tile_counts=jnp.asarray(tcsr.counts),
        edge_slot=jnp.asarray(tcsr.edge_slot), tile_nodes=tile_nodes,
        **snd,
    )
