"""Per-edge multi-head cross-attention — the AMPNet core op, in pure jnp.

Semantics match torch nn.MultiheadAttention as used by the reference
(reference: src/ampnet/conv/amp_conv.py:18-22,39 — query = destination
node's tokens, key/value = source node's tokens, batched over edges) and
its vendored no-softmax variant
(src/ampnet/conv/custom_multihead_attn_forward.py:4173-4185: scale q by
1/sqrt(head_dim), bmm(q,k^T), optional softmax, dropout, bmm(.,v)).
Returned attention weights are head-averaged
(custom_multihead_attn_forward.py:4439-4442).

TPU-first restructuring (numerically identical, far fewer FLOPs):
  * QKV projections run once per NODE, then the projected tensors are
    gathered per edge.  The reference gathers first and projects per edge
    (amp_conv.py:35-39), paying deg(avg) times more matmul FLOPs.
  * The output projection runs after the per-receiver mean aggregation
    (linear commutes with mean); receivers with zero in-edges are zeroed
    to preserve scatter-mean's empty-segment = 0 semantics.

This file is the correctness reference; ops/pallas/ holds the fused kernel.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ampnet_tpu.ops.segment import segment_count, segment_sum


class MHAParams(NamedTuple):
    """JAX-layout attention parameters.

    w_qkv: [D, 3D] so that (x @ w_qkv + b_qkv) = packed q|k|v.
    Torch's in_proj_weight is [3D, D] (x @ W.T); convert by transposing.
    """

    w_qkv: jnp.ndarray   # [D, 3D]
    b_qkv: jnp.ndarray   # [3D]
    w_out: jnp.ndarray   # [D, D]
    b_out: jnp.ndarray   # [D]


def _split_heads(t: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, S, D] -> [B, H, S, Dh]."""
    b, s, d = t.shape
    return t.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(t: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, Dh] -> [B, S, D]."""
    b, h, s, dh = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    softmax: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scaled dot-product attention on projected tensors.

    q, k, v: [B, S, D] (already through the in-projection).
    Returns (attn_out [B, S, D], head-averaged weights [B, S, S]).
    """
    d = q.shape[-1]
    head_dim = d // num_heads
    qh = _split_heads(q, num_heads) * (1.0 / jnp.sqrt(head_dim).astype(q.dtype))
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)

    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    if softmax:
        weights = jax.nn.softmax(scores, axis=-1)
    else:
        # no-softmax mode: raw scaled dot products
        # (custom_multihead_attn_forward.py:4179-4180)
        weights = scores
    weights = weights.astype(q.dtype)
    applied = weights
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        applied = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", applied, vh, preferred_element_type=jnp.float32)
    out = _merge_heads(out.astype(q.dtype))
    avg_weights = jnp.mean(weights, axis=1)  # head average, :4439-4442
    return out, avg_weights


def multihead_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    params: MHAParams,
    num_heads: int,
    softmax: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full MHA on [B, S, D] batches (parity surface vs torch)."""
    d = query.shape[-1]
    wq, wk, wv = params.w_qkv[:, :d], params.w_qkv[:, d : 2 * d], params.w_qkv[:, 2 * d :]
    bq, bk, bv = params.b_qkv[:d], params.b_qkv[d : 2 * d], params.b_qkv[2 * d :]
    q = query @ wq + bq
    k = key @ wk + bk
    v = value @ wv + bv
    out, weights = attention_core(
        q, k, v, num_heads, softmax=softmax, dropout_rate=dropout_rate, dropout_rng=dropout_rng
    )
    return out @ params.w_out + params.b_out, weights


def edge_attention_weights(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    params: MHAParams,
    num_heads: int,
    softmax: bool = True,
) -> jnp.ndarray:
    """Head-averaged attention weights [E, S, S] only — no value path, no
    aggregation.

    The interpretability companion to the fused Pallas kernel: the fused
    forward never materializes per-edge weights (they exist only tile-by-
    tile inside VMEM), so extraction runs this half-cost pass on demand.
    Matches the weights amp_edge_attention returns (reference cache
    `attn_output_weights`, src/ampnet/conv/amp_conv.py:39-47).
    """
    d = x.shape[-1]
    head_dim = d // num_heads
    wq, wk = params.w_qkv[:, :d], params.w_qkv[:, d : 2 * d]
    bq, bk = params.b_qkv[:d], params.b_qkv[d : 2 * d]
    q = (x @ wq + bq)[receivers]   # [E, S, D]
    k = (x @ wk + bk)[senders]
    qh = _split_heads(q, num_heads) * (1.0 / jnp.sqrt(head_dim).astype(q.dtype))
    kh = _split_heads(k, num_heads)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(scores, axis=-1) if softmax else scores
    return jnp.mean(weights.astype(q.dtype), axis=1)


def amp_edge_attention(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_mask: Optional[jnp.ndarray],
    params: MHAParams,
    num_heads: int,
    num_nodes: Optional[int] = None,
    softmax: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    return_weights: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """AMPConv message+aggregate: per-edge cross-attention, mean per receiver.

    x: [N, S, D] node feature tokens.
    Per edge e: message = MHA(query=x[receivers[e]], key=value=x[senders[e]]);
    output[n] = mean over incoming edges (reference: amp_conv.py:11,24-51).

    Returns (out [N, S, D], head-averaged attn weights [E, S, S] or None).
    """
    n, s, d = x.shape
    if num_nodes is None:
        num_nodes = n

    # Project per node, then gather per edge (see module docstring).
    qkv = x @ params.w_qkv + params.b_qkv        # [N, S, 3D]
    q_nodes = qkv[..., :d]
    k_nodes = qkv[..., d : 2 * d]
    v_nodes = qkv[..., 2 * d :]

    q = q_nodes[receivers]   # [E, S, D] destination tokens (x_i)
    k = k_nodes[senders]     # [E, S, D] source tokens (x_j)
    v = v_nodes[senders]

    msg, weights = attention_core(
        q, k, v, num_heads, softmax=softmax, dropout_rate=dropout_rate, dropout_rng=dropout_rng
    )  # msg: [E, S, D]

    total = segment_sum(msg, receivers, num_nodes, edge_mask)        # [N, S, D]
    count = segment_count(receivers, num_nodes, edge_mask)           # [N]
    mean = total / jnp.maximum(count, 1.0)[:, None, None]
    out = mean @ params.w_out + params.b_out
    # scatter-mean gives 0 for receivers with no in-edges; keep that.
    out = jnp.where((count > 0)[:, None, None], out, 0.0)
    if not return_weights:
        weights = None
    return out, weights
