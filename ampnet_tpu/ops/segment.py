"""Masked segment reductions — the TPU replacement for torch_scatter.

The reference aggregates per-edge messages with scatter-mean inside PyG's
MessagePassing (reference: src/ampnet/conv/amp_conv.py:11, aggr='mean';
torch_scatter C++/CUDA underneath). On TPU these become
jax.ops.segment_sum-style reductions, which XLA lowers to sorted
one-pass scatters; all ops take an explicit validity mask so padded
edges contribute nothing.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked segment sum. data: [E, ...], segment_ids: [E] -> [N, ...]."""
    if mask is not None:
        data = jnp.where(mask.reshape((-1,) + (1,) * (data.ndim - 1)), data, 0)
        segment_ids = jnp.where(mask, segment_ids, num_segments)  # divert to void
        return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments + 1)[:-1]
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    return segment_sum(ones, segment_ids, num_segments, mask)


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked segment mean; empty segments yield 0 (PyG scatter-mean semantics)."""
    total = segment_sum(data, segment_ids, num_segments, mask)
    count = segment_count(segment_ids, num_segments, mask)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape((-1,) + (1,) * (total.ndim - 1))


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    initial: Optional[float] = None,
) -> jnp.ndarray:
    """Masked segment max. Empty segments yield `initial` when given,
    else 0 (PyG-ish neutral). Integer inputs keep their dtype."""
    lowest = (jnp.finfo(data.dtype).min if jnp.issubdtype(data.dtype, jnp.floating)
              else jnp.iinfo(data.dtype).min)
    if mask is not None:
        data = jnp.where(mask.reshape((-1,) + (1,) * (data.ndim - 1)), data, lowest)
        segment_ids = jnp.where(mask, segment_ids, num_segments)
        out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments + 1)[:-1]
    else:
        out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    # empty segments surface as the reduction identity: -inf for floats
    # (jax.ops.segment_max), dtype-min for ints; also treat dtype-min as
    # empty for floats (the masked divert writes it)
    if jnp.issubdtype(out.dtype, jnp.floating):
        empty = jnp.isneginf(out) | (out == lowest)
    else:
        empty = out == lowest
    empty_fill = jnp.asarray(0 if initial is None else initial, out.dtype)
    return jnp.where(empty, empty_fill, out)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically-stable softmax within each segment over the leading axis.

    Masked lanes are clamped to the segment max BEFORE exp (the classic
    double-where): exp of an unclamped masked logit ~88 above the live
    max overflows to inf, and `0 * inf = nan` then poisons the LIVE
    lanes' gradients for the whole segment.
    """
    maxes = segment_max(logits, segment_ids, num_segments, mask)
    shifted = logits - maxes[segment_ids]
    if mask is not None:
        m = mask.reshape((-1,) + (1,) * (shifted.ndim - 1))
        shifted = jnp.where(m, shifted, 0.0)
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(m, exp, 0.0)
    denom = segment_sum(exp, segment_ids, num_segments, mask)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]
