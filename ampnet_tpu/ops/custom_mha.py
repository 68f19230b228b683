"""Full-surface multi-head attention: the reference's custom MHA clone.

Covers every option of the reference's vendored MultiheadAttention
(src/ampnet/conv/custom_multihead_attn.py:46-102 and its functional
backend custom_multihead_attn_forward.py:4189-4444) that the packed-QKV
fast path (ops/edge_attention.py) does not:

  * separate q/k/v projection weights for unequal kdim/vdim
    (`_qkv_same_embed_dim=False`, custom_multihead_attn.py:58-66);
  * add_bias_kv — learnable bias row appended to K and V
    (custom_multihead_attn.py:72-76, functional :4339-4350);
  * add_zero_attn — an extra all-zero K/V position (:4398-4406);
  * key_padding_mask [B, S_k] and attn_mask [S_q, S_k] additive/boolean
    masking (:4361-4374, :4408-4421);
  * softmax / no-softmax mode (the reference's single functional edit,
    :4179-4180) and head-averaged weight return (:4439-4442).

AMPConv itself never uses these (it runs packed same-dim, no masks) so
the hot path stays in edge_attention.py; this module completes the API
surface for users of the reference's custom attention.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class CustomMHAParams(NamedTuple):
    """JAX-layout parameters (x @ W convention; torch stores transposed).

    For kdim == vdim == embed_dim this is equivalent to splitting the
    packed MHAParams.w_qkv into thirds.
    """

    w_q: jnp.ndarray             # [D, D]
    w_k: jnp.ndarray             # [kdim, D]
    w_v: jnp.ndarray             # [vdim, D]
    b_q: jnp.ndarray             # [D]
    b_k: jnp.ndarray             # [D]
    b_v: jnp.ndarray             # [D]
    w_out: jnp.ndarray           # [D, D]
    b_out: jnp.ndarray           # [D]
    bias_k: Optional[jnp.ndarray] = None   # [1, D] (add_bias_kv)
    bias_v: Optional[jnp.ndarray] = None   # [1, D]


def init_custom_mha(
    key: jax.Array,
    embed_dim: int,
    kdim: Optional[int] = None,
    vdim: Optional[int] = None,
    add_bias_kv: bool = False,
    dtype=jnp.float32,
) -> CustomMHAParams:
    """torch _reset_parameters parity: xavier-uniform projections, zero
    biases, xavier-normal bias_k/bias_v (custom_multihead_attn.py:93-102);
    out_proj keeps torch Linear's kaiming-uniform default."""
    kdim = kdim or embed_dim
    vdim = vdim or embed_dim
    kq, kk, kv, ko, kbk, kbv = jax.random.split(key, 6)
    xavier = jax.nn.initializers.xavier_uniform()
    kaiming = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
    return CustomMHAParams(
        w_q=xavier(kq, (embed_dim, embed_dim), dtype),
        w_k=xavier(kk, (kdim, embed_dim), dtype),
        w_v=xavier(kv, (vdim, embed_dim), dtype),
        b_q=jnp.zeros((embed_dim,), dtype),
        b_k=jnp.zeros((embed_dim,), dtype),
        b_v=jnp.zeros((embed_dim,), dtype),
        w_out=kaiming(ko, (embed_dim, embed_dim), dtype),
        b_out=jnp.zeros((embed_dim,), dtype),
        bias_k=(jax.nn.initializers.xavier_normal()(kbk, (1, embed_dim), dtype)
                if add_bias_kv else None),
        bias_v=(jax.nn.initializers.xavier_normal()(kbv, (1, embed_dim), dtype)
                if add_bias_kv else None),
    )


def custom_multihead_attention(
    query: jnp.ndarray,          # [B, S_q, D]
    key: jnp.ndarray,            # [B, S_k, kdim]
    value: jnp.ndarray,          # [B, S_k, vdim]
    params: CustomMHAParams,
    num_heads: int,
    softmax: bool = True,
    add_zero_attn: bool = False,
    key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S_k] True = masked
    attn_mask: Optional[jnp.ndarray] = None,         # [S_q, S_k] bool or additive
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched MHA with the reference's full option surface.

    Returns (out [B, S_q, D], head-averaged weights [B, S_q, S_k_eff])
    where S_k_eff includes the bias-kv / zero-attn positions.
    """
    b, s_q, d = query.shape
    head_dim = d // num_heads
    if head_dim * num_heads != d:
        raise ValueError("embed_dim must be divisible by num_heads")

    q = query @ params.w_q + params.b_q          # [B, S_q, D]
    k = key @ params.w_k + params.b_k            # [B, S_k, D]
    v = value @ params.w_v + params.b_v

    # bias_kv: one learnable extra key/value position per batch
    # (functional :4339-4350; key_padding/attn masks get a zero column)
    if params.bias_k is not None:
        k = jnp.concatenate([k, jnp.broadcast_to(params.bias_k, (b, 1, d))], axis=1)
        v = jnp.concatenate([v, jnp.broadcast_to(params.bias_v, (b, 1, d))], axis=1)
        key_padding_mask = _pad_mask_col(key_padding_mask, b)
        attn_mask = _pad_attn_col(attn_mask, s_q)

    # add_zero_attn: an all-zero key/value position (:4398-4406)
    if add_zero_attn:
        zeros = jnp.zeros((b, 1, d), k.dtype)
        k = jnp.concatenate([k, zeros], axis=1)
        v = jnp.concatenate([v, zeros], axis=1)
        key_padding_mask = _pad_mask_col(key_padding_mask, b)
        attn_mask = _pad_attn_col(attn_mask, s_q)

    s_k = k.shape[1]

    def split(t):
        return t.reshape(b, -1, num_heads, head_dim).transpose(0, 2, 1, 3)

    qh = split(q) * (1.0 / jnp.sqrt(head_dim).astype(q.dtype))
    kh, vh = split(k), split(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)  # [B, H, S_q, S_k]

    neg = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            scores = jnp.where(attn_mask[None, None], neg, scores)
        else:
            scores = scores + attn_mask[None, None].astype(scores.dtype)
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)

    weights = jax.nn.softmax(scores, axis=-1) if softmax else scores
    weights = weights.astype(q.dtype)
    applied = weights
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        applied = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhqk,bhkd->bhqd", applied, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, s_q, d)
    out = out @ params.w_out + params.b_out
    avg_weights = jnp.mean(weights, axis=1)      # head average (:4439-4442)
    return out, avg_weights


def _pad_mask_col(mask: Optional[jnp.ndarray], b: int) -> Optional[jnp.ndarray]:
    if mask is None:
        return None
    return jnp.concatenate([mask, jnp.zeros((b, 1), mask.dtype)], axis=1)


def _pad_attn_col(mask: Optional[jnp.ndarray], s_q: int) -> Optional[jnp.ndarray]:
    if mask is None:
        return None
    return jnp.concatenate([mask, jnp.zeros((s_q, 1), mask.dtype)], axis=1)
