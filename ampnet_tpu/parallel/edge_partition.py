"""Edge-partitioned (graph-sharded) AMPGCN training — the scale-out path.

The reference never partitions the graph (whole graph or subgraph per
device — SURVEY §2.6); this is the framework's north-star strategy for
graphs that outgrow one chip:

  * nodes are partitioned into contiguous blocks over the mesh 'graph'
    axis (global id = shard * N_loc + local id);
  * each edge lives on the shard that OWNS ITS RECEIVER, so mean
    aggregation is entirely local (a streaming segment reduction);
  * the halo/boundary exchange moves K/V-projected node tokens over
    ICI — gathering K/V *after* projection, not raw features, keeps
    traffic proportional to D (not F) and lets XLA overlap the
    collective with the local QKV matmuls. Two exchange strategies:
      - all-gather (small graphs): every shard materializes all N_tot
        projected rows; per-chip memory O(N_tot);
      - boundary-only halo (build_halo_plan, the scale-out default,
        SURVEY §2.6 north star): each shard-pair exchanges ONLY the
        sender rows the destination's edges actually reference, via one
        lax.ppermute per live ring offset (host-precomputed per-offset
        budgets — traffic tracks the true cut at any shard count);
        per-chip memory O(N_loc + cut) — graphs whose projected K/V
        exceed one chip's HBM remain shardable;
  * reverse-mode AD through shard_map turns the collective into its
    transpose automatically (all-gather -> reduce-scatter; ppermute ->
    inverse ppermute + scatter-add of boundary-token grads) — no
    hand-written comm.

The local forward mirrors models/amp_gcn.py math parameter-for-parameter
(same pytree), so checkpoints are interchangeable between the
single-chip and partitioned paths; parity is tested in
tests/test_edge_partition.py.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.core.graph import Graph
from ampnet_tpu.ops.edge_attention import MHAParams, attention_core
from ampnet_tpu.ops.pallas.format import DEFAULT_TILE_NODES
from ampnet_tpu.ops.segment import segment_count, segment_sum
from ampnet_tpu.ops.tokenize import gather_tokens, sample_present_features

try:  # jax>=0.6 stable location
    from jax import shard_map as _shard_map_mod
    shard_map = _shard_map_mod.shard_map if hasattr(_shard_map_mod, "shard_map") else _shard_map_mod
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


class PartitionedGraph(NamedTuple):
    """Per-shard arrays, stacked on a leading shard axis."""

    x: jnp.ndarray              # [P, N_loc, F]
    y: jnp.ndarray              # [P, N_loc]
    node_mask: jnp.ndarray      # [P, N_loc]
    train_mask: jnp.ndarray     # [P, N_loc]
    test_mask: jnp.ndarray      # [P, N_loc]
    node_norm: jnp.ndarray      # [P, N_loc]
    senders_global: jnp.ndarray   # [P, E_loc] int32 (global node ids)
    receivers_local: jnp.ndarray  # [P, E_loc] int32 (local node ids)
    edge_mask: jnp.ndarray        # [P, E_loc]

    @property
    def num_shards(self) -> int:
        return self.x.shape[0]


def partition_graph(g: Graph, n_shards: int) -> PartitionedGraph:
    """Host-side partitioner: contiguous node blocks; edges by receiver."""
    n_pad = g.num_nodes_padded
    n_loc = -(-n_pad // n_shards)
    n_tot = n_loc * n_shards

    def pad_nodes(a, fill):
        a = np.asarray(a)
        out = np.full((n_tot,) + a.shape[1:], fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return out.reshape((n_shards, n_loc) + a.shape[1:])

    senders = np.asarray(g.senders)
    receivers = np.asarray(g.receivers)
    emask = np.asarray(g.edge_mask)
    shard_of_edge = receivers // n_loc
    counts = np.bincount(shard_of_edge[emask], minlength=n_shards)
    e_loc = max(int(counts.max()) if counts.size else 1, 1)
    e_loc = ((e_loc + 127) // 128) * 128

    sg = np.zeros((n_shards, e_loc), np.int32)
    rl = np.zeros((n_shards, e_loc), np.int32)
    em = np.zeros((n_shards, e_loc), bool)
    for p in range(n_shards):
        sel = emask & (shard_of_edge == p)
        k = int(sel.sum())
        sg[p, :k] = senders[sel]
        rl[p, :k] = receivers[sel] % n_loc
        em[p, :k] = True

    zeros = np.zeros(n_pad, np.int32)
    return PartitionedGraph(
        x=jnp.asarray(pad_nodes(g.x, 0.0)),
        y=jnp.asarray(pad_nodes(np.asarray(g.y) if g.y is not None else zeros, 0)),
        node_mask=jnp.asarray(pad_nodes(g.node_mask, False)),
        train_mask=jnp.asarray(
            pad_nodes(np.asarray(g.train_mask) if g.train_mask is not None else zeros.astype(bool), False)
        ),
        test_mask=jnp.asarray(
            pad_nodes(np.asarray(g.test_mask) if g.test_mask is not None else zeros.astype(bool), False)
        ),
        node_norm=jnp.asarray(
            pad_nodes(np.asarray(g.node_norm) if g.node_norm is not None else np.ones(n_pad, np.float32), 0.0)
        ),
        senders_global=jnp.asarray(sg),
        receivers_local=jnp.asarray(rl),
        edge_mask=jnp.asarray(em),
    )


@jax.tree_util.register_pytree_node_class
class HaloPlan:
    """Host-precomputed boundary-exchange plan (array leaves stacked on a
    leading shard axis, sharded over 'graph' like PartitionedGraph;
    offset structure is STATIC pytree aux, so jit specializes on it).

    For each ordered shard pair (src p -> dst q), the rows of p that q's
    edges actually reference are enumerated once (sorted unique). Pairs
    are grouped by ring OFFSET o = (q - p) mod P, and each offset gets
    its OWN static budget H_o = max over its P pairs (rounded to
    pad_to); offsets nobody needs are dropped entirely. The exchange is
    one lax.ppermute per live offset — on a locality-partitioned graph
    only the near offsets survive, so bytes moved track the TRUE cut at
    any P (a single uniform budget over all pairs degrades toward
    all-gather traffic as P grows: the max pair pads every pair —
    measured in experiments/halo_comm_accounting.py). Receivers index
    halo rows through `senders_ext`, which remaps every edge's global
    sender id into the [N_loc + sum(H_o)) local+halo space (offset-major
    blocks after the local rows). Per-chip memory/traffic is
    O(N_loc + cut), not O(N_tot) — the SURVEY §2.6 boundary-exchange
    contract.
    """

    def __init__(self, send_idx, senders_ext, pair_counts, offsets, sizes):
        self.send_idx = send_idx        # [P, sum(H_o)] int32: my local rows,
                                        # offset-major (0-padded; padded
                                        # slots are never referenced)
        self.senders_ext = senders_ext  # [P, E_loc] int32 into local+halo
        self.pair_counts = pair_counts  # [P, P] int32 [dst, src] TRUE sizes
                                        # (device-unused; comm accounting)
        self.offsets = tuple(int(o) for o in offsets)  # static: live offsets
        self.sizes = tuple(int(s) for s in sizes)      # static: budgets H_o

    def tree_flatten(self):
        return ((self.send_idx, self.senders_ext, self.pair_counts),
                (self.offsets, self.sizes))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def halo_width(self) -> int:
        """Total halo rows per shard (sum of all offset blocks)."""
        return int(sum(self.sizes))

    @property
    def meta(self):
        return (self.offsets, self.sizes)


def build_halo_plan(
    pg: PartitionedGraph,
    pad_to: int = 8,
    force_meta=None,
) -> HaloPlan:
    """Host-side: enumerate, per ordered shard pair, the boundary rows the
    destination's edges reference (from senders_global), budget per ring
    offset, and remap senders into the local+halo index space.

    force_meta=(offsets, sizes) pins the static structure (e.g. to make
    per-replica plans stackable for the DP x graph path — stack_halos);
    raises if any pair outgrows its forced budget or needs an offset the
    forced meta lacks."""
    p_shards = pg.num_shards
    n_loc = pg.x.shape[1]
    sg = np.asarray(pg.senders_global)
    em = np.asarray(pg.edge_mask)

    needed = [[np.zeros(0, np.int64)] * p_shards for _ in range(p_shards)]
    off_need = np.zeros(p_shards, np.int64)  # per-offset max pair size
    for q in range(p_shards):
        s_q = sg[q][em[q]]
        owners = s_q // n_loc
        for p in range(p_shards):
            if p == q:
                continue
            rows = np.unique(s_q[owners == p] % n_loc)
            needed[q][p] = rows
            o = (q - p) % p_shards
            off_need[o] = max(off_need[o], rows.size)

    if force_meta is not None:
        offsets = tuple(int(o) for o in force_meta[0])
        sizes = tuple(int(s) for s in force_meta[1])
        budget = dict(zip(offsets, sizes))
        for o in range(1, p_shards):
            if off_need[o] > budget.get(o, 0):
                raise ValueError(
                    f"force_meta budget too small for offset {o}: need "
                    f"{int(off_need[o])}, have {budget.get(o, 0)}"
                )
    else:
        offsets = tuple(o for o in range(1, p_shards) if off_need[o] > 0)
        sizes = tuple(-(-int(off_need[o]) // pad_to) * pad_to for o in offsets)
    h_sum = int(sum(sizes))
    base = {}  # offset -> start of its block within the halo region
    acc = 0
    for o, hh in zip(offsets, sizes):
        base[o] = acc
        acc += hh

    send_idx = np.zeros((p_shards, max(h_sum, 1)), np.int32)
    pair_counts = np.zeros((p_shards, p_shards), np.int32)
    for q in range(p_shards):
        for p in range(p_shards):
            rows = needed[q][p]
            pair_counts[q, p] = rows.size
            if p == q or rows.size == 0:
                continue
            o = (q - p) % p_shards
            send_idx[p, base[o]: base[o] + rows.size] = rows

    senders_ext = np.zeros_like(sg)
    for q in range(p_shards):
        s_q = sg[q]
        owners = s_q // n_loc
        loc = s_q % n_loc
        ext = np.where(owners == q, loc, 0).astype(np.int32)
        for p in range(p_shards):
            if p == q:
                continue
            sel = em[q] & (owners == p)
            if sel.any():
                o = (q - p) % p_shards
                # needed[q][p] is sorted unique -> searchsorted gives the
                # halo slot of each referenced row exactly
                pos = np.searchsorted(needed[q][p], loc[sel])
                ext[sel] = (n_loc + base[o] + pos).astype(np.int32)
        senders_ext[q] = ext

    return HaloPlan(
        send_idx=jnp.asarray(send_idx),
        senders_ext=jnp.asarray(senders_ext),
        pair_counts=jnp.asarray(pair_counts),
        offsets=offsets,
        sizes=sizes,
    )


def halo_exchange(
    x_local: jnp.ndarray,        # [N_loc, ...]
    send_idx_local: jnp.ndarray, # [sum(H_o)] — my rows, offset-major
    meta,                        # (offsets, sizes) static — HaloPlan.meta
    p_shards: int,
    axis: str = "graph",
) -> jnp.ndarray:
    """Boundary-only exchange: gather my boundary rows once, then one
    lax.ppermute per live ring offset (shard i -> shard (i+o) mod P);
    received blocks concatenate offset-major after the local rows ->
    [N_loc + sum(H_o), ...]. On TPU each ppermute rides ICI
    point-to-point; dead offsets cost nothing, so traffic tracks the
    cut. AD reverses the route (inverse permutes, then scatter-add into
    the local rows via the gather's transpose) — boundary-token
    gradients flow back to their owner with the same O(cut) traffic as
    the forward."""
    offsets, sizes = meta
    buf = jnp.take(x_local, send_idx_local, axis=0)   # [sum(H_o), ...]
    parts = [x_local]
    start = 0
    for o, h in zip(offsets, sizes):
        perm = [(i, (i + o) % p_shards) for i in range(p_shards)]
        parts.append(jax.lax.ppermute(buf[start: start + h], axis, perm=perm))
        start += h
    return jnp.concatenate(parts, axis=0)


class ShardLayout(NamedTuple):
    """Per-shard tiled-CSR layouts (leaves stacked on a leading shard
    axis) for running the fused Pallas kernel inside the edge-partitioned
    path: receivers are LOCAL rows; senders index the K|V buffer the
    exchange produced — GLOBAL node ids for the all-gather path, or
    [N_loc + sum(H_o)) local+halo ids when built with a halo_plan. The
    snd_* leaves are the TRANSPOSED layout — the same edges bucketed by
    sender tile with local receiver ids in the gather column — for the
    scatter-free backward's dK|dV pass."""

    tile_senders: jnp.ndarray  # [P, T, EMAX]
    tile_recv: jnp.ndarray     # [P, T, EMAX]
    tile_valid: jnp.ndarray    # [P, T, EMAX]
    snd_receivers: jnp.ndarray  # [P, Tg, EMAXS] LOCAL receiver ids
    snd_local: jnp.ndarray      # [P, Tg, EMAXS] sender row in GLOBAL tile
    snd_valid: jnp.ndarray      # [P, Tg, EMAXS]


def partition_layouts(
    pg: PartitionedGraph,
    tile_nodes: int = DEFAULT_TILE_NODES,
    edges_per_tile: int = 0,
    halo_plan: Optional[HaloPlan] = None,
) -> ShardLayout:
    """Host-side: build each shard's tiled CSR from its
    (senders_global, receivers_local) edge list, plus the transposed
    (sender-tiled) layout for the scatter-free backward. A fixed
    edges_per_tile keeps one static shape across shards (it serves both
    bucketings; the builder raises on overflow).

    With halo_plan, the gather column indexes the [N_loc + P*H)
    local+halo space (plan.senders_ext) instead of [N_tot) — the fused
    kernel then runs against the boundary-exchanged K/V buffer and its
    scatter-free backward tiles the compact halo axis, not the full
    gathered node axis."""
    from ampnet_tpu.ops.pallas.format import build_tiled_csr

    p = pg.num_shards
    n_loc = pg.x.shape[1]
    if halo_plan is not None:
        n_all = n_loc + halo_plan.halo_width
        senders_arr = np.asarray(halo_plan.senders_ext)
    else:
        n_all = p * n_loc
        senders_arr = np.asarray(pg.senders_global)
    if not edges_per_tile:
        # common budget = max per-shard need over BOTH bucketings
        # (receiver-local tiles and sender tiles), SMEM-aligned
        need = 0
        for i in range(p):
            em = np.asarray(pg.edge_mask[i])
            r = np.asarray(pg.receivers_local[i])[em]
            sg = senders_arr[i][em]
            if r.size:
                counts = np.bincount(r // tile_nodes, minlength=-(-n_loc // tile_nodes))
                scounts = np.bincount(sg // tile_nodes, minlength=-(-n_all // tile_nodes))
                need = max(need, int(counts.max()), int(scounts.max()))
        edges_per_tile = max(128, -(-max(need, 1) // 128) * 128)
    ts, tr, tv = [], [], []
    ss, sl, sv = [], [], []
    for i in range(p):
        tcsr = build_tiled_csr(
            senders_arr[i], np.asarray(pg.receivers_local[i]),
            np.asarray(pg.edge_mask[i]), n_loc,
            tile_nodes=tile_nodes, edges_per_tile=edges_per_tile,
        )
        ts.append(tcsr.senders)
        tr.append(tcsr.recv_local)
        tv.append(tcsr.valid)
        stcsr = build_tiled_csr(
            np.asarray(pg.receivers_local[i]), senders_arr[i],
            np.asarray(pg.edge_mask[i]), n_all,
            tile_nodes=tile_nodes, edges_per_tile=edges_per_tile,
        )
        ss.append(stcsr.senders)
        sl.append(stcsr.recv_local)
        sv.append(stcsr.valid)
    return ShardLayout(
        jnp.asarray(np.stack(ts)), jnp.asarray(np.stack(tr)),
        jnp.asarray(np.stack(tv)),
        jnp.asarray(np.stack(ss)), jnp.asarray(np.stack(sl)),
        jnp.asarray(np.stack(sv)),
    )


def _mha_params(conv_params) -> MHAParams:
    return MHAParams(
        w_qkv=conv_params["w_qkv"],
        b_qkv=conv_params["b_qkv"],
        w_out=conv_params["w_out"],
        b_out=conv_params["b_out"],
    )


def _sharded_amp_conv(
    tokens_local: jnp.ndarray,     # [N_loc, S, D]
    senders_global: jnp.ndarray,   # [E_loc]
    receivers_local: jnp.ndarray,  # [E_loc]
    edge_mask: jnp.ndarray,        # [E_loc]
    params: MHAParams,
    num_heads: int,
    softmax: bool,
    axis: str = "graph",
    layout=None,                   # (tile_senders, tile_recv, tile_valid) [T, EMAX]
    tile_nodes: int = DEFAULT_TILE_NODES,
    interpret: bool = False,
    halo=None,                     # (send_idx [P, H], senders_ext [E_loc])
) -> jnp.ndarray:
    """One AMPConv with boundary exchange over `axis`.

    halo=None: all-gather of all projected K/V rows (per-chip O(N_tot) —
    the small-graph fast path). halo=(send_idx, senders_ext): boundary-
    only all_to_all per build_halo_plan (per-chip O(N_loc + cut)); the
    edge gather column and any fused layout must index the local+halo
    space (partition_layouts(halo_plan=...)).

    With `layout` set, the local attention+aggregation runs in the fused
    Pallas kernel (ops.pallas.fused_attention_aggregate); AD through the
    collective still produces the boundary-token gradient exchange
    (reduce-scatter, or reverse all_to_all + owner scatter-add).
    """
    n_loc, s, d = tokens_local.shape
    qkv = tokens_local @ params.w_qkv + params.b_qkv
    q_nodes = qkv[..., :d]
    kv_local = qkv[..., d:]                       # [N_loc, S, 2D] packed k|v
    if halo is not None:
        send_idx, senders_ref, meta, p_shards = halo
        kv_all = halo_exchange(kv_local, send_idx, meta, p_shards, axis)
        # -> [N_loc + sum(H_o), S, 2D]
    else:
        senders_ref = senders_global
        # projected K/V for every node, concatenated shard-major
        kv_all = jax.lax.all_gather(kv_local, axis, axis=0, tiled=True)  # [N_tot, S, 2D]

    count = segment_count(receivers_local, n_loc, edge_mask)
    if layout is not None:
        from ampnet_tpu.ops.pallas.edge_attention_fused import (
            fused_attention_aggregate,
        )

        snd = {}
        if len(layout) >= 6 and layout[3] is not None:
            snd = dict(snd_receivers=layout[3], snd_local=layout[4],
                       snd_valid=layout[5])
        total = fused_attention_aggregate(
            q_nodes, kv_all, layout[0], layout[1], layout[2],
            num_heads=num_heads, softmax=softmax, tile_nodes=tile_nodes,
            interpret=interpret, **snd,
        )
    else:
        q = q_nodes[receivers_local]
        kv_e = kv_all[senders_ref]
        k, v = kv_e[..., :d], kv_e[..., d:]
        msg, _ = attention_core(q, k, v, num_heads, softmax=softmax)
        total = segment_sum(msg, receivers_local, n_loc, edge_mask)

    mean = total / jnp.maximum(count, 1.0)[:, None, None]
    out = mean @ params.w_out + params.b_out
    return jnp.where((count > 0)[:, None, None], out, 0.0)


def _sharded_gcn_conv(
    x_local: jnp.ndarray,          # [N_loc, F] transformed input features
    kernel: jnp.ndarray,           # [F, D] GCNConv Dense kernel
    bias: jnp.ndarray,             # [D]
    senders_global: jnp.ndarray,   # [E_loc]
    receivers_local: jnp.ndarray,  # [E_loc]
    edge_mask: jnp.ndarray,        # [E_loc]
    axis: str = "graph",
    halo=None,                     # (send_idx [P, H], senders_ext [E_loc])
) -> jnp.ndarray:
    """One Kipf-Welling GCN hop on a receiver-owned edge partition:
    transform locally (F->D BEFORE the boundary exchange — D << F),
    exchange the transformed rows + the degree vector (all-gather, or
    boundary-only halo when `halo` is set), weighted segment-sum with
    the symmetric D^-1/2(A+I)D^-1/2 normalization (ops/gcn.py::gcn_norm
    semantics: in-degrees counted with self-loops; every local row gets a
    self-loop, like the single-device path appends loops for all rows)."""
    n_loc = x_local.shape[0]
    h_local = x_local @ kernel
    deg_local = segment_count(receivers_local, n_loc, edge_mask) + 1.0
    dinv_local = 1.0 / jnp.sqrt(deg_local)
    if halo is not None:
        send_idx, senders_ref, meta, p_shards = halo
        h_all = halo_exchange(h_local, send_idx, meta, p_shards, axis)
        dinv_all = halo_exchange(dinv_local, send_idx, meta, p_shards, axis)
    else:
        senders_ref = senders_global
        h_all = jax.lax.all_gather(h_local, axis, axis=0, tiled=True)
        dinv_all = jax.lax.all_gather(dinv_local, axis, axis=0, tiled=True)
    w = dinv_all[senders_ref] * dinv_local[receivers_local]
    msgs = h_all[senders_ref] * w[:, None]
    agg = segment_sum(msgs, receivers_local, n_loc, edge_mask)
    agg = agg + h_local * (dinv_local ** 2)[:, None]   # self-loop term
    return agg + bias


def amp_gcn_forward_local(
    params: Dict,
    shard: PartitionedGraph,   # leaves WITHOUT the leading shard axis
    cfg: AMPGCNConfig,
    sample_key: jax.Array,
    axis: str = "graph",
    layout=None,               # per-shard (tile_senders, tile_recv, tile_valid)
    tile_nodes: int = DEFAULT_TILE_NODES,
    interpret: bool = False,
    scaler_stats=None,         # (mean, std) for cfg.scaler='precomputed'
    halo=None,                 # per-shard (send_idx, senders_ext, meta, P)
    remat: bool = False,       # jax.checkpoint each conv: recompute the
                               # projected/exchanged K-V in the backward
                               # instead of keeping it live — trades one
                               # extra conv fwd for O(N_loc*S*D) residual
                               # memory per conv (the large-graph lever)
) -> jnp.ndarray:
    """Per-shard AMPGCN forward (deterministic path: dropouts off), with
    boundary-exchanged convs (all-gather, or halo-only when `halo` is
    set — build_halo_plan). Mirrors models/amp_gcn.py / reference
    amp_gcn.py:239-276, honoring the frontend config the checkpoint was
    trained with: cfg.scaler ('batch' = global z-scoring via psum,
    'precomputed' = dataset-level stats) and cfg.token_sampling
    ('uniform' | 'tfidf' with psum'd document frequencies)."""
    x = shard.x
    if cfg.scaler == "precomputed":
        if scaler_stats is None:
            raise ValueError(
                "cfg.scaler='precomputed' requires scaler_stats — a silent "
                "batch-stats fallback would diverge from the checkpoint's "
                "training normalization"
            )
        mean, std = (jnp.asarray(scaler_stats[0]), jnp.asarray(scaler_stats[1]))
        x_norm = (x - mean) / jnp.where(std == 0.0, 1.0, std)
    else:
        # global batch stats via psum (the reference z-scores per batch)
        w = shard.node_mask.astype(x.dtype)[:, None]
        n_glob = jax.lax.psum(jnp.sum(w), axis)
        mean = jax.lax.psum(jnp.sum(x * w, axis=0), axis) / jnp.maximum(n_glob, 1.0)
        var = jax.lax.psum(jnp.sum(w * (x - mean) ** 2, axis=0), axis) / jnp.maximum(n_glob, 1.0)
        std = jnp.sqrt(var)
        x_norm = (x - mean) / jnp.where(std == 0.0, 1.0, std)

    if cfg.token_sampling == "tfidf":
        # ops/tokenize.py::tfidf_sample_features with GLOBAL document
        # frequencies (df/n psum'd across shards; pad rows are all-zero
        # and contribute nothing, as on the single-device path)
        present = x != 0
        df = jax.lax.psum(jnp.sum(present, axis=0), axis)
        # REAL node count (pad rows would add log(N_pad/N_real) to every
        # idf — see ops/tokenize.py::tfidf_sample_features)
        n_rows = jax.lax.psum(jnp.sum(shard.node_mask.astype(jnp.float32)), axis)
        idf = jnp.log(n_rows / (1.0 + df))
        weights = jnp.abs(x) * jnp.maximum(idf, 1e-3)[None, :]
        any_present = jnp.any(present, axis=1, keepdims=True)
        logw = jnp.where(present, jnp.log(jnp.maximum(weights, 1e-30)), -1e30)
        logw = jnp.where(any_present, logw, 0.0)
        sidx = jax.random.categorical(
            sample_key, logw[:, None, :], axis=-1,
            shape=(x.shape[0], cfg.num_sampled_vectors),
        ).astype(jnp.int32)
    else:
        sidx = sample_present_features(sample_key, x, cfg.num_sampled_vectors)
    table = params["tokenizer"]["feature_embedding_table"]
    tokens = gather_tokens(x_norm, sidx, table)

    def conv(tokens_in, mha):
        return _sharded_amp_conv(
            tokens_in, shard.senders_global, shard.receivers_local,
            shard.edge_mask, mha, cfg.num_heads, cfg.attn_softmax, axis,
            layout=layout, tile_nodes=tile_nodes, interpret=interpret,
            halo=halo,
        )

    if remat:
        conv = jax.checkpoint(conv)

    h = conv(tokens, _mha_params(params["conv1"]))
    h = jax.nn.relu(h)
    h = conv(h, _mha_params(params["conv2"]))
    h = jax.nn.relu(h)
    pooled = jnp.mean(h, axis=1)

    if cfg.raw_residual:
        # hybrid raw-residual head (models/amp_gcn.py): GCN hops over the
        # z-scored raw features, halo-exchanged like the convs
        mode = (cfg.raw_residual if isinstance(cfg.raw_residual, str)
                else "mlp")
        if mode == "mlp":
            p = params["raw_residual_proj"]
            xr = jax.nn.relu(x_norm @ p["kernel"] + p["bias"])
        elif mode in ("gcn", "gcn2"):
            p = params["raw_residual_conv1"]
            xr = jax.nn.relu(_sharded_gcn_conv(
                x_norm, p["Dense_0"]["kernel"], p["bias"],
                shard.senders_global, shard.receivers_local,
                shard.edge_mask, axis, halo=halo))
            if mode == "gcn2":
                p = params["raw_residual_conv2"]
                xr = jax.nn.relu(_sharded_gcn_conv(
                    xr, p["Dense_0"]["kernel"], p["bias"],
                    shard.senders_global, shard.receivers_local,
                    shard.edge_mask, axis, halo=halo))
        else:
            raise ValueError(f"unknown raw_residual mode: {mode!r}")
        pooled = jnp.concatenate([pooled, xr], axis=-1)

    logits = pooled @ params["final_linear_out"]["kernel"] + params["final_linear_out"]["bias"]
    return jax.nn.log_softmax(logits, axis=-1)


def _graph_axis_loss(nll, node_norm, m, loss_mode: str, axis: str = "graph"):
    """Per-replica loss reduced over the graph axis. Modes match
    train/losses.py: 'saint' = the reference's node_norm-weighted SUM
    (cora_benchmark_graphsaint.py:105-106), 'saint_mean' = the stabilized
    weight-normalized variant (losses.py::saint_weighted_mean_nll),
    'full' = masked mean NLL. Unknown modes raise — a silent fallthrough
    would train the stabilized recipe with the wrong objective."""
    if loss_mode == "saint":
        return jax.lax.psum(jnp.sum(nll * node_norm * m), axis)
    if loss_mode == "saint_mean":
        tw = jax.lax.psum(jnp.sum(nll * node_norm * m), axis)
        ws = jax.lax.psum(jnp.sum(node_norm * m), axis)
        return tw / jnp.maximum(ws, 1e-12)
    if loss_mode == "full":
        total = jax.lax.psum(jnp.sum(nll * m), axis)
        count = jax.lax.psum(jnp.sum(m), axis)
        return total / jnp.maximum(count, 1.0)
    raise ValueError(f"unknown loss_mode {loss_mode!r}")


def _make_step(learning_rate_tx, sharded_loss):
    """Shared jitted step body: value_and_grad -> optimizer update.
    Extra positional args (e.g. fused-kernel layouts) pass through."""

    @jax.jit
    def step(params, opt_state, pg: PartitionedGraph, key, *extra):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: sharded_loss(p, pg, key, *extra), has_aux=True
        )(params)
        updates, opt_state = learning_rate_tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "train_acc": acc}

    return step


def make_partitioned_train_step(
    cfg: AMPGCNConfig,
    mesh: Mesh,
    learning_rate_tx,
    loss_mode: str = "full",
    use_pallas: bool = False,
    tile_nodes: int = DEFAULT_TILE_NODES,
    interpret: bool = False,
    scaler_stats=None,   # (mean, std) for cfg.scaler='precomputed'
    use_halo: bool = False,
    remat: bool = False,
):
    """Jitted edge-partitioned training step over the 'graph' mesh axis.

    use_pallas=True runs each shard's convs in the fused kernel; pass the
    per-shard layouts (partition_layouts) as the step's 4th argument.
    use_halo=True switches the K/V exchange from all-gather to the
    boundary-only all_to_all; pass the HaloPlan (build_halo_plan) as the
    next positional argument after the layouts (or 4th if no layouts) —
    layouts must then be built with the same plan
    (partition_layouts(halo_plan=...))."""

    pspec = PartitionedGraph(
        x=P("graph"), y=P("graph"), node_mask=P("graph"), train_mask=P("graph"),
        test_mask=P("graph"), node_norm=P("graph"), senders_global=P("graph"),
        receivers_local=P("graph"), edge_mask=P("graph"),
    )
    lspec = ShardLayout(*(P("graph") for _ in ShardLayout._fields))
    hspec = P("graph")  # tree-prefix: shards every HaloPlan array leaf
    n_graph = mesh.shape["graph"]

    def local_loss(params, pg: PartitionedGraph, key, *extra):
        shard = PartitionedGraph(*(leaf[0] for leaf in pg))  # strip shard axis
        my_key = jax.random.fold_in(key, jax.lax.axis_index("graph"))
        rest = list(extra)
        layout = tuple(l[0] for l in rest.pop(0)) if use_pallas else None
        halo = None
        if use_halo:
            plan = rest.pop(0)
            halo = (plan.send_idx[0], plan.senders_ext[0], plan.meta, n_graph)
        logp = amp_gcn_forward_local(
            params, shard, cfg, my_key,
            layout=layout, tile_nodes=tile_nodes, interpret=interpret,
            scaler_stats=scaler_stats, halo=halo, remat=remat,
        )
        m = (shard.train_mask & shard.node_mask).astype(logp.dtype)
        nll = -jnp.take_along_axis(logp, shard.y[:, None].astype(jnp.int32), axis=1)[:, 0]
        loss = _graph_axis_loss(nll, shard.node_norm, m, loss_mode)
        correct = jax.lax.psum(
            jnp.sum((jnp.argmax(logp, -1) == shard.y).astype(jnp.float32) * m), "graph"
        )
        n = jax.lax.psum(jnp.sum(m), "graph")
        return loss, correct / jnp.maximum(n, 1.0)

    in_specs = (P(), pspec, P())
    if use_pallas:
        in_specs = in_specs + (lspec,)
    if use_halo:
        in_specs = in_specs + (hspec,)
    sharded_loss = shard_map(
        local_loss, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )
    return _make_step(learning_rate_tx, sharded_loss)


def make_dp_partitioned_train_step(
    cfg: AMPGCNConfig,
    mesh: Mesh,
    learning_rate_tx,
    loss_mode: str = "saint",
    use_pallas: bool = False,
    tile_nodes: int = DEFAULT_TILE_NODES,
    interpret: bool = False,
    scaler_stats=None,   # (mean, std) for cfg.scaler='precomputed'
    use_halo: bool = False,
    remat: bool = False,
):
    """Combined data-parallel x graph-partitioned training step.

    PartitionedGraph leaves carry TWO leading shard axes [data, graph, ...]:
    each 'data' replica trains on its own (GraphSAINT) subgraph, itself
    edge-partitioned over 'graph' with boundary exchange. Losses are
    summed per replica over 'graph' then averaged over 'data'; gradient
    all-reduce over both axes is inserted by shard_map's transpose of the
    replicated params.

    use_pallas=True runs every shard's convs through the fused kernel;
    pass per-replica-per-shard layouts (ShardLayout leaves stacked
    [data, graph, ...], e.g. stack_layouts(partition_layouts(...) per
    replica)) as the step's 5th argument. use_halo=True additionally
    takes the stacked HaloPlan (stack_halos) as the next argument, and
    per-replica plans must share one halo width (build with a common
    pad_to or pad to the max)."""
    pspec = PartitionedGraph(*(P("data", "graph") for _ in range(9)))
    lspec = ShardLayout(*(P("data", "graph") for _ in ShardLayout._fields))
    hspec = P("data", "graph")  # tree-prefix over HaloPlan array leaves
    n_graph = mesh.shape["graph"]

    def local_loss(params, pg: PartitionedGraph, key, *extra):
        shard = PartitionedGraph(*(leaf[0, 0] for leaf in pg))
        rest = list(extra)
        layout = tuple(l[0, 0] for l in rest.pop(0)) if use_pallas else None
        halo = None
        if use_halo:
            plan = rest.pop(0)
            halo = (plan.send_idx[0, 0], plan.senders_ext[0, 0], plan.meta,
                    n_graph)
        di = jax.lax.axis_index("data")
        gi = jax.lax.axis_index("graph")
        my_key = jax.random.fold_in(jax.random.fold_in(key, di), gi)
        logp = amp_gcn_forward_local(
            params, shard, cfg, my_key, axis="graph",
            layout=layout, tile_nodes=tile_nodes, interpret=interpret,
            scaler_stats=scaler_stats, halo=halo, remat=remat,
        )
        m = (shard.train_mask & shard.node_mask).astype(logp.dtype)
        nll = -jnp.take_along_axis(logp, shard.y[:, None].astype(jnp.int32), axis=1)[:, 0]
        replica_loss = _graph_axis_loss(nll, shard.node_norm, m, loss_mode)
        n_data = jax.lax.axis_size("data")
        loss = jax.lax.psum(replica_loss, "data") / n_data
        correct = jax.lax.psum(
            jnp.sum((jnp.argmax(logp, -1) == shard.y).astype(jnp.float32) * m),
            ("data", "graph"),
        )
        n = jax.lax.psum(jnp.sum(m), ("data", "graph"))
        return loss, correct / jnp.maximum(n, 1.0)

    in_specs = (P(), pspec, P())
    if use_pallas:
        in_specs = in_specs + (lspec,)
    if use_halo:
        in_specs = in_specs + (hspec,)
    sharded_loss = shard_map(
        local_loss, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False,
    )
    return _make_step(learning_rate_tx, sharded_loss)


def stack_partitioned(pgs) -> PartitionedGraph:
    """Stack per-replica PartitionedGraphs into [data, graph, ...] leaves."""
    return PartitionedGraph(*(jnp.stack(leaves) for leaves in zip(*pgs)))


def stack_layouts(layouts) -> ShardLayout:
    """Stack per-replica ShardLayouts into [data, graph, ...] leaves.

    Replicas may have different per-tile budgets (different subgraphs) —
    use a common edges_per_tile in partition_layouts so leaves stack."""
    return ShardLayout(*(jnp.stack(leaves) for leaves in zip(*layouts)))


def stack_halos(plans) -> HaloPlan:
    """Stack per-replica HaloPlans into [data, graph, ...] leaves.

    All replicas must share one STATIC offset structure: senders_ext
    encodes the offset-block bases, so differing metas cannot be padded
    post-hoc — rebuild every plan with build_halo_plan(pg,
    force_meta=common_halo_meta(pgs)) first."""
    metas = {pl.meta for pl in plans}
    if len(metas) != 1:
        raise ValueError(
            f"stack_halos: replicas have different halo metas {sorted(metas)}"
            " — rebuild each plan with build_halo_plan(pg, force_meta=...)"
            " (see common_halo_meta) so the ext index spaces agree"
        )
    meta = plans[0].meta
    return HaloPlan(
        jnp.stack([pl.send_idx for pl in plans]),
        jnp.stack([pl.senders_ext for pl in plans]),
        jnp.stack([pl.pair_counts for pl in plans]),
        *meta,
    )


def common_halo_meta(pgs, pad_to: int = 8):
    """(offsets, sizes) covering every replica's needs — the force_meta
    that makes per-replica plans stackable (stack_halos)."""
    need = {}
    for pg in pgs:
        p_shards = pg.num_shards
        n_loc = pg.x.shape[1]
        sg = np.asarray(pg.senders_global)
        em = np.asarray(pg.edge_mask)
        for q in range(p_shards):
            s_q = sg[q][em[q]]
            owners = s_q // n_loc
            for p in range(p_shards):
                if p == q:
                    continue
                k = len(np.unique(s_q[owners == p]))
                o = (q - p) % p_shards
                need[o] = max(need.get(o, 0), k)
    offsets = tuple(sorted(o for o in need if need[o] > 0))
    sizes = tuple(-(-need[o] // pad_to) * pad_to for o in offsets)
    return offsets, sizes
