"""GCN normalized sparse aggregation (the GCNConv baseline's SpMM).

Replaces PyG GCNConv + torch_scatter (reference:
src/ampnet/module/gcn_classifier.py:52-55): symmetric normalization
D^-1/2 (A + I) D^-1/2 implemented as masked segment ops over the edge list.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ampnet_tpu.ops.segment import segment_count, segment_sum


def gcn_norm(
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    edge_mask: Optional[jnp.ndarray] = None,
    add_self_loops: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Compute GCN edge weights; optionally append self-loops.

    Returns (senders', receivers', edge_weight, edge_mask') where
    edge_weight[e] = 1/sqrt(deg(s_e) * deg(r_e)), degrees counted with
    self-loops over masked-in edges.
    """
    if add_self_loops:
        loops = jnp.arange(num_nodes, dtype=senders.dtype)
        senders = jnp.concatenate([senders, loops])
        receivers = jnp.concatenate([receivers, loops])
        if edge_mask is not None:
            edge_mask = jnp.concatenate([edge_mask, jnp.ones(num_nodes, dtype=bool)])
    deg = segment_count(receivers, num_nodes, edge_mask)
    dinv = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1.0)), 0.0)
    w = dinv[senders] * dinv[receivers]
    if edge_mask is not None:
        w = jnp.where(edge_mask, w, 0.0)
    return senders, receivers, w, edge_mask


def gcn_aggregate(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    edge_mask: Optional[jnp.ndarray] = None,
    add_self_loops: bool = True,
) -> jnp.ndarray:
    """out = D^-1/2 (A+I) D^-1/2 @ x  via gather + weighted segment-sum."""
    s, r, w, m = gcn_norm(senders, receivers, num_nodes, edge_mask, add_self_loops)
    msgs = x[s] * w.reshape((-1,) + (1,) * (x.ndim - 1))
    return segment_sum(msgs, r, num_nodes, m)
