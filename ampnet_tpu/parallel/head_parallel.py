"""Tensor parallelism over attention heads (SURVEY §2.6: "TP ... optional:
shard the [E, S, S] attention over heads axis").

Megatron-style attention TP mapped onto a 'heads' mesh axis:

  * the packed QKV in-projection is COLUMN-sharded by head group, so each
    device projects, gathers, and attends only its ``num_heads / n_shards``
    heads (scores tensor [E, H_local, S, S] — the per-edge attention memory
    and FLOPs shrink linearly in the shard count);
  * the output projection is ROW-sharded, so each device's head-group
    contribution is a partial sum of the final [N, S, D] output;
  * exactly ONE collective per layer: a psum over 'heads' of the partial
    out-projection (plus one more for the head-averaged attention weights
    when interpretability outputs are requested).

Softmax is per-head, and the per-receiver mean aggregation is linear and
head-independent, so head groups compute independently with no exchange
until the output projection — the same single-collective structure as
Megatron's attention blocks.

The reference has no analogue (single-device torch, SURVEY §2.6 row "TP:
No"); this is the optional strategy built TPU-native. Not required for
parity at reference scale (H=4), but it composes with the 'data' axis and
gives the scaling story for wide-head configs.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ampnet_tpu.ops.edge_attention import MHAParams, attention_core
from ampnet_tpu.ops.segment import segment_count, segment_sum

try:  # jax >= 0.7 moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod
    shard_map = _shard_map_mod.shard_map if hasattr(_shard_map_mod, "shard_map") else _shard_map_mod
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def shard_mha_params(params: MHAParams, num_heads: int, n_shards: int) -> MHAParams:
    """Re-layout MHAParams with a leading shard axis for the 'heads' mesh.

    Returns MHAParams whose leaves are stacked per shard:
      w_qkv [n_shards, D, 3*D/n_shards]  (columns of each of q|k|v for the
                                          shard's head group)
      b_qkv [n_shards, 3*D/n_shards]
      w_out [n_shards, D/n_shards, D]    (rows for the shard's head group)
      b_out [n_shards, D]                (b_out / n_shards: psum of the
                                          partial projections adds it back
                                          exactly once)
    """
    d = params.w_out.shape[0]
    if num_heads % n_shards:
        raise ValueError(f"num_heads={num_heads} not divisible by n_shards={n_shards}")
    head_dim = d // num_heads
    heads_local = num_heads // n_shards
    dl = heads_local * head_dim  # local model slice width

    wq, wk, wv = (params.w_qkv[:, i * d:(i + 1) * d] for i in range(3))
    bq, bk, bv = (params.b_qkv[i * d:(i + 1) * d] for i in range(3))

    def _cols(w):  # [D, D] -> [n_shards, D, dl]
        return jnp.stack([w[:, s * dl:(s + 1) * dl] for s in range(n_shards)])

    def _vec(b):  # [D] -> [n_shards, dl]
        return jnp.stack([b[s * dl:(s + 1) * dl] for s in range(n_shards)])

    w_qkv = jnp.concatenate([_cols(wq), _cols(wk), _cols(wv)], axis=2)
    b_qkv = jnp.concatenate([_vec(bq), _vec(bk), _vec(bv)], axis=1)
    w_out = jnp.stack([params.w_out[s * dl:(s + 1) * dl, :] for s in range(n_shards)])
    b_out = jnp.tile(params.b_out[None] / n_shards, (n_shards, 1))
    return MHAParams(w_qkv=w_qkv, b_qkv=b_qkv, w_out=w_out, b_out=b_out)


def _local_edge_attention(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_mask: Optional[jnp.ndarray],
    sp: MHAParams,
    heads_local: int,
    num_heads: int,
    softmax: bool,
    return_weights: bool,
    axis: str,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """shard_map body: full AMPConv message+aggregate for one head group."""
    n, s, _d = x.shape
    w_qkv, b_qkv = sp.w_qkv[0], sp.b_qkv[0]
    w_out, b_out = sp.w_out[0], sp.b_out[0]
    dl = w_out.shape[0]

    qkv = x @ w_qkv + b_qkv                      # [N, S, 3*dl]
    q = qkv[..., :dl][receivers]                 # [E, S, dl]
    k = qkv[..., dl:2 * dl][senders]
    v = qkv[..., 2 * dl:][senders]

    msg, w_local = attention_core(q, k, v, heads_local, softmax=softmax)

    total = segment_sum(msg, receivers, n, edge_mask)
    count = segment_count(receivers, n, edge_mask)
    mean = total / jnp.maximum(count, 1.0)[:, None, None]
    partial_out = mean @ w_out + b_out           # partial over head groups
    out = jax.lax.psum(partial_out, axis)
    out = jnp.where((count > 0)[:, None, None], out, 0.0)

    weights = None
    if return_weights:
        # w_local is the mean over this shard's heads_local heads; the
        # global head average re-weights by the local head count.
        weights = jax.lax.psum(w_local * (heads_local / num_heads), axis)
    return out, weights


def head_sharded_amp_edge_attention(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_mask: Optional[jnp.ndarray],
    params: MHAParams,
    num_heads: int,
    mesh: Mesh,
    softmax: bool = True,
    return_weights: bool = True,
    axis: str = "heads",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """amp_edge_attention with heads sharded over ``mesh[axis]``.

    Exact-parity drop-in for ops.edge_attention.amp_edge_attention
    (dropout off): same output [N, S, D] and head-averaged weights
    [E, S, S], computed with each device owning num_heads/n_shards heads.
    `params` is the UNSHARDED single-device layout; use shard_mha_params
    ahead of time (e.g. once per training run) to avoid re-slicing per step.
    """
    n_shards = mesh.shape[axis]
    sharded = shard_mha_params(params, num_heads, n_shards)
    return head_sharded_apply(
        x, senders, receivers, edge_mask, sharded,
        num_heads=num_heads, mesh=mesh, softmax=softmax,
        return_weights=return_weights, axis=axis,
    )


def head_sharded_apply(
    x: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_mask: Optional[jnp.ndarray],
    sharded_params: MHAParams,
    num_heads: int,
    mesh: Mesh,
    softmax: bool = True,
    return_weights: bool = True,
    axis: str = "heads",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Run the head-sharded conv given pre-sharded (stacked) params."""
    n_shards = mesh.shape[axis]
    heads_local = num_heads // n_shards

    em = edge_mask if edge_mask is not None else jnp.ones(senders.shape[0], bool)
    pspec = MHAParams(P(axis), P(axis), P(axis), P(axis))
    body = partial(
        _local_edge_attention,
        heads_local=heads_local, num_heads=num_heads, softmax=softmax,
        return_weights=return_weights, axis=axis,
    )
    if return_weights:
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(), P(), pspec),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(x, senders, receivers, em, sharded_params)
    fn = shard_map(
        lambda *a: body(*a)[0], mesh=mesh,
        in_specs=(P(), P(), P(), P(), pspec),
        out_specs=P(),
        check_vma=False,
    )
    return fn(x, senders, receivers, em, sharded_params), None
