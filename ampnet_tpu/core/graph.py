"""Static-shape graph containers.

The reference carries graphs as PyG `Data` objects with dynamic sizes
(reference: experiments/cora_benchmark_graphsaint.py:101,
visualization/visualize_graphsaint_subgraphs.py:112-135). XLA wants static
shapes, so every graph here is padded to a fixed (num_nodes, num_edges)
bucket with validity masks; padded edges point at node 0 and are masked out
of every aggregation.

Edge convention (matches PyG flow='source_to_target'):
  senders[e]   = source node  (x_j in the reference's message())
  receivers[e] = destination node (x_i; messages are aggregated per receiver)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Graph:
    """A padded, fixed-shape graph.

    Shapes: N = padded node count, E = padded edge count, F = feature dim.
    """

    x: jnp.ndarray            # [N, F] node features
    senders: jnp.ndarray      # [E] int32 source node per edge
    receivers: jnp.ndarray    # [E] int32 destination node per edge
    node_mask: jnp.ndarray    # [N] bool, True for real nodes
    edge_mask: jnp.ndarray    # [E] bool, True for real edges
    y: Optional[jnp.ndarray] = None            # [N] int32 labels
    train_mask: Optional[jnp.ndarray] = None   # [N] bool
    val_mask: Optional[jnp.ndarray] = None     # [N] bool
    test_mask: Optional[jnp.ndarray] = None    # [N] bool
    node_norm: Optional[jnp.ndarray] = None    # [N] f32 GraphSAINT norm
    edge_norm: Optional[jnp.ndarray] = None    # [E] f32 GraphSAINT norm

    @property
    def num_nodes_padded(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[0]

    @property
    def num_nodes(self) -> jnp.ndarray:
        return jnp.sum(self.node_mask.astype(jnp.int32))

    @property
    def num_edges(self) -> jnp.ndarray:
        return jnp.sum(self.edge_mask.astype(jnp.int32))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def from_arrays(
    x: np.ndarray,
    edge_index: np.ndarray,
    y: Optional[np.ndarray] = None,
    train_mask: Optional[np.ndarray] = None,
    val_mask: Optional[np.ndarray] = None,
    test_mask: Optional[np.ndarray] = None,
    node_norm: Optional[np.ndarray] = None,
    edge_norm: Optional[np.ndarray] = None,
    pad_nodes_to: Optional[int] = None,
    pad_edges_to: Optional[int] = None,
    node_multiple: int = 8,
    edge_multiple: int = 128,
) -> Graph:
    """Build a padded Graph from host arrays.

    edge_index is the reference's [2, E] int array: row 0 = senders (x_j),
    row 1 = receivers (x_i) (reference: src/ampnet/conv/amp_conv.py:24-28).
    """
    x = np.asarray(x, dtype=np.float32)
    edge_index = np.asarray(edge_index, dtype=np.int32)
    n, e = x.shape[0], edge_index.shape[1]
    n_pad = pad_nodes_to if pad_nodes_to is not None else _round_up(max(n, 1), node_multiple)
    e_pad = pad_edges_to if pad_edges_to is not None else _round_up(max(e, 1), edge_multiple)
    if n_pad < n or e_pad < e:
        raise ValueError(f"pad sizes ({n_pad},{e_pad}) smaller than graph ({n},{e})")
    if e > 0:
        lo, hi = int(edge_index.min()), int(edge_index.max())
        if lo < 0 or hi >= n:
            # JAX gathers CLAMP out-of-range indices, so a 1-indexed or
            # corrupted edge list would otherwise train silently on wrong
            # rows — fail loudly at graph construction instead
            raise ValueError(
                f"edge_index references node ids [{lo}, {hi}] outside "
                f"[0, {n})")

    def pad_n(a, fill=0, dtype=None):
        if a is None:
            return None
        a = np.asarray(a)
        out = np.full((n_pad,) + a.shape[1:], fill, dtype=dtype or a.dtype)
        out[:n] = a
        return out

    xp = np.zeros((n_pad, x.shape[1]), dtype=np.float32)
    xp[:n] = x
    senders = np.zeros((e_pad,), dtype=np.int32)
    receivers = np.zeros((e_pad,), dtype=np.int32)
    senders[:e] = edge_index[0]
    receivers[:e] = edge_index[1]
    node_mask = np.zeros((n_pad,), dtype=bool)
    node_mask[:n] = True
    edge_mask = np.zeros((e_pad,), dtype=bool)
    edge_mask[:e] = True

    def as_bool(a):
        return None if a is None else pad_n(np.asarray(a, dtype=bool), fill=False)

    return Graph(
        x=jnp.asarray(xp),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        y=None if y is None else jnp.asarray(pad_n(np.asarray(y, dtype=np.int32), fill=0)),
        train_mask=None if train_mask is None else jnp.asarray(as_bool(train_mask)),
        val_mask=None if val_mask is None else jnp.asarray(as_bool(val_mask)),
        test_mask=None if test_mask is None else jnp.asarray(as_bool(test_mask)),
        node_norm=None if node_norm is None else jnp.asarray(pad_n(np.asarray(node_norm, dtype=np.float32), fill=0.0)),
        edge_norm=None if edge_norm is None else jnp.asarray(
            _pad_checked_edges(np.asarray(edge_norm, np.float32), e, e_pad)
        ),
    )


def _pad_checked_edges(a: np.ndarray, e: int, e_pad: int) -> np.ndarray:
    """Pad a per-edge array to e_pad with zeros, validating its length
    against the LIVE edge count (an already-padded or short array would
    silently build a wrong-length field and fail far from the cause)."""
    if a.shape[0] != e:
        raise ValueError(
            f"per-edge array has length {a.shape[0]}, expected the live "
            f"edge count {e} (pass UNPADDED per-edge data)")
    out = np.zeros((e_pad,) + a.shape[1:], a.dtype)
    out[:e] = a
    return out


def pad_graph(g: Graph, n_pad: int, e_pad: int) -> Graph:
    """Re-pad an existing Graph to LARGER static sizes."""
    if n_pad < g.num_nodes_padded or e_pad < g.num_edges_padded:
        raise ValueError(
            f"pad_graph target ({n_pad},{e_pad}) smaller than current "
            f"({g.num_nodes_padded},{g.num_edges_padded}) — shrinking "
            f"requires rebuilding via from_arrays")

    def padn(a, fill):
        if a is None:
            return None
        pad_width = [(0, n_pad - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad_width, constant_values=fill)

    def pade(a, fill):
        if a is None:
            return None
        return jnp.pad(a, (0, e_pad - a.shape[0]), constant_values=fill)

    return Graph(
        x=padn(g.x, 0.0),
        senders=pade(g.senders, 0),
        receivers=pade(g.receivers, 0),
        node_mask=padn(g.node_mask, False),
        edge_mask=pade(g.edge_mask, False),
        y=padn(g.y, 0),
        train_mask=padn(g.train_mask, False),
        val_mask=padn(g.val_mask, False),
        test_mask=padn(g.test_mask, False),
        node_norm=padn(g.node_norm, 0.0),
        edge_norm=pade(g.edge_norm, 0.0),
    )


def build_csr(edge_index: np.ndarray, num_nodes: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side CSR (indptr, indices) over *senders* for random walks.

    Replaces torch_sparse.SparseTensor used by the reference sampler
    (reference: visualization/visualize_graphsaint_subgraphs.py:78-81).
    """
    senders = np.asarray(edge_index[0])
    receivers = np.asarray(edge_index[1])
    order = np.argsort(senders, kind="stable")
    sorted_senders = senders[order]
    indices = receivers[order].astype(np.int32)
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    counts = np.bincount(sorted_senders, minlength=num_nodes)
    indptr[1:] = np.cumsum(counts)
    return indptr, indices


def sort_edges_by_receiver(g: Graph) -> Tuple[Graph, jnp.ndarray]:
    """Sort edges so receivers are contiguous (sorted-CSR order).

    The Pallas fused kernel requires receiver-sorted edges so per-node
    aggregation is a streaming segment reduction instead of a scatter.
    Returns the sorted graph and the permutation (for unsorting aux data).
    Padded edges (mask False) sort to the end via a +inf key.
    """
    key = jnp.where(g.edge_mask, g.receivers, jnp.int32(2**30))
    perm = jnp.argsort(key, stable=True)
    return (
        g.replace(
            senders=g.senders[perm],
            receivers=g.receivers[perm],
            edge_mask=g.edge_mask[perm],
            edge_norm=None if g.edge_norm is None else g.edge_norm[perm],
        ),
        perm,
    )


def add_self_loops(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Append (i, i) for every node — used by GCNConv normalization."""
    loops = np.arange(num_nodes, dtype=edge_index.dtype)
    return np.concatenate([edge_index, np.stack([loops, loops])], axis=1)
