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
    initial: float = -jnp.inf,
) -> jnp.ndarray:
    if mask is not None:
        data = jnp.where(mask.reshape((-1,) + (1,) * (data.ndim - 1)), data, initial)
        segment_ids = jnp.where(mask, segment_ids, num_segments)
        out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments + 1)[:-1]
    else:
        out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isneginf(out), 0.0, out)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically-stable softmax within each segment over the leading axis."""
    maxes = segment_max(logits, segment_ids, num_segments, mask)
    shifted = logits - maxes[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(mask.reshape((-1,) + (1,) * (exp.ndim - 1)), exp, 0.0)
    denom = segment_sum(exp, segment_ids, num_segments, mask)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]
