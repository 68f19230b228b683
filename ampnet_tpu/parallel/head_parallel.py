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


# ---------------------------------------------------------------------------
# Model-level TP: full AMPGCN training with the convs head-sharded
# ---------------------------------------------------------------------------

_CONV_NAMES = ("conv1", "conv2")


def tp_shard_params(params, num_heads: int, n_shards: int):
    """Full AMPGCN params tree -> TP layout: conv1/conv2 w_qkv/b_qkv/w_out
    replaced by shard-stacked head-group slices (see shard_mha_params);
    b_out stays REPLICATED (Megatron convention: the out-projection bias
    is added once after the all-reduce — a per-shard b_out/n copy would
    receive the full output cotangent on every shard and train with an
    n_shards-times effective learning rate); every other leaf untouched."""
    out = dict(params)
    for name in _CONV_NAMES:
        c = params[name]
        sp = shard_mha_params(
            MHAParams(c["w_qkv"], c["b_qkv"], c["w_out"], c["b_out"]),
            num_heads, n_shards,
        )
        out[name] = {"w_qkv": sp.w_qkv, "b_qkv": sp.b_qkv,
                     "w_out": sp.w_out, "b_out": c["b_out"]}
    return out


def tp_unshard_params(params, num_heads: int):
    """Inverse of tp_shard_params (checkpoint interop): concatenate the
    head-group column/row slices back into single-device MHA leaves."""
    out = dict(params)
    for name in _CONV_NAMES:
        c = params[name]
        ns, d, three_dl = c["w_qkv"].shape
        dl = three_dl // 3
        wq = jnp.concatenate([c["w_qkv"][s, :, :dl] for s in range(ns)], axis=1)
        wk = jnp.concatenate([c["w_qkv"][s, :, dl:2 * dl] for s in range(ns)], axis=1)
        wv = jnp.concatenate([c["w_qkv"][s, :, 2 * dl:] for s in range(ns)], axis=1)
        bq = jnp.concatenate([c["b_qkv"][s, :dl] for s in range(ns)])
        bk = jnp.concatenate([c["b_qkv"][s, dl:2 * dl] for s in range(ns)])
        bv = jnp.concatenate([c["b_qkv"][s, 2 * dl:] for s in range(ns)])
        out[name] = {
            "w_qkv": jnp.concatenate([wq, wk, wv], axis=1),
            "b_qkv": jnp.concatenate([bq, bk, bv]),
            "w_out": jnp.concatenate([c["w_out"][s] for s in range(ns)], axis=0),
            "b_out": c["b_out"],  # replicated in the TP-train layout
        }
    return out


def tp_param_specs(params, axis: str = "heads"):
    """PartitionSpec tree for a tp_shard_params layout: P(axis) on the
    shard-stacked conv leaves (b_out stays replicated), P() elsewhere."""
    from jax.sharding import PartitionSpec as P  # noqa: F811

    out = {}
    for k, v in params.items():
        if k in _CONV_NAMES:
            out[k] = {kk: (P() if kk == "b_out" else P(axis)) for kk in v}
        else:
            out[k] = jax.tree_util.tree_map(lambda _: P(), v)
    return out


def amp_gcn_forward_heads(
    params,                 # tp_shard_params layout, LOCAL view inside shard_map
    graph,                  # core.graph.Graph, replicated
    cfg,
    sample_key: jax.Array,
    axis: str = "heads",
    scaler_stats=None,
) -> jnp.ndarray:
    """Per-shard AMPGCN forward with the convs head-sharded (deterministic
    path: dropouts off — mirrors parallel/edge_partition.py::
    amp_gcn_forward_local's conventions, but over the 'heads' axis: the
    frontend and head are replicated compute, each conv is a head group +
    ONE psum). frontend='table' only; transformer_block unsupported."""
    from ampnet_tpu.ops.gcn import gcn_aggregate
    from ampnet_tpu.ops.tokenize import (
        gather_tokens,
        sample_present_features,
        standardize,
        tfidf_sample_features,
    )

    if (cfg.frontend != "table" or getattr(cfg, "transformer_block", False)
            or not cfg.downsample_feature_vectors
            or getattr(cfg, "balanced_sampling", False)):
        raise NotImplementedError(
            "head-sharded forward supports frontend='table', plain stack, "
            "downsampled uniform/tfidf token sampling (the production "
            "configs); other frontends would silently mis-tokenize here")

    x = graph.x
    if cfg.scaler == "precomputed":
        if scaler_stats is None:
            raise ValueError("cfg.scaler='precomputed' requires scaler_stats")
        x_norm = standardize(x, mean=jnp.asarray(scaler_stats[0]),
                             std=jnp.asarray(scaler_stats[1]))
    elif cfg.scaler == "none":
        x_norm = x
    else:
        x_norm = standardize(x, node_mask=graph.node_mask)

    if cfg.token_sampling == "tfidf":
        sidx = tfidf_sample_features(sample_key, x, cfg.num_sampled_vectors,
                                     node_mask=graph.node_mask)
    else:
        sidx = sample_present_features(sample_key, x, cfg.num_sampled_vectors)
    table = params["tokenizer"]["feature_embedding_table"]
    tokens = gather_tokens(x_norm, sidx, table)

    def conv(name, h):
        # head-group conv body with the TP-train b_out convention:
        # partial out-projections psum'd, REPLICATED bias added once after
        c = params[name]
        w_qkv, b_qkv, w_out = c["w_qkv"][0], c["b_qkv"][0], c["w_out"][0]
        dl = w_out.shape[0]
        qkv = h @ w_qkv + b_qkv
        q = qkv[..., :dl][graph.receivers]
        k = qkv[..., dl:2 * dl][graph.senders]
        v = qkv[..., 2 * dl:][graph.senders]
        heads_local = cfg.num_heads // jax.lax.axis_size(axis)
        msg, _ = attention_core(q, k, v, heads_local, softmax=cfg.attn_softmax)
        n_nodes = h.shape[0]
        total = segment_sum(msg, graph.receivers, n_nodes, graph.edge_mask)
        count = segment_count(graph.receivers, n_nodes, graph.edge_mask)
        mean = total / jnp.maximum(count, 1.0)[:, None, None]
        out = jax.lax.psum(mean @ w_out, axis) + c["b_out"]
        return jnp.where((count > 0)[:, None, None], out, 0.0)

    h = jax.nn.relu(conv("conv1", tokens))
    h = jax.nn.relu(conv("conv2", h))
    pooled = jnp.mean(h, axis=1) if cfg.average_pooling else h[:, 0]

    if cfg.raw_residual:
        mode = cfg.raw_residual if isinstance(cfg.raw_residual, str) else "mlp"
        if mode == "mlp":
            p = params["raw_residual_proj"]
            xr = jax.nn.relu(x_norm @ p["kernel"] + p["bias"])
        elif mode in ("gcn", "gcn2"):
            def gcn_hop(name, z):
                p = params[name]
                hh = z @ p["Dense_0"]["kernel"]
                out = gcn_aggregate(hh, graph.senders, graph.receivers,
                                    z.shape[0], graph.edge_mask, True)
                return jax.nn.relu(out + p["bias"])

            xr = gcn_hop("raw_residual_conv1", x_norm)
            if mode == "gcn2":
                xr = gcn_hop("raw_residual_conv2", xr)
        else:
            raise ValueError(f"unknown raw_residual mode: {mode!r}")
        pooled = jnp.concatenate([pooled, xr], axis=-1)

    logits = (pooled @ params["final_linear_out"]["kernel"]
              + params["final_linear_out"]["bias"])
    return jax.nn.log_softmax(logits, axis=-1)


def make_tp_train_step(cfg, mesh: Mesh, tx, loss_mode: str = "full",
                       axis: str = "heads", scaler_stats=None):
    """Jitted step(params, opt_state, graph, key) with params in the
    tp_shard_params layout: the convs run head-sharded over mesh[axis]
    (Megatron-style, one psum per conv), the frontend/head replicated;
    gradient all-reduce for replicated leaves is inserted by shard_map's
    transpose, head-group leaves keep per-shard gradients."""
    import optax

    def local_loss(params, graph, key):
        logp = amp_gcn_forward_heads(
            params, graph, cfg, key, axis=axis, scaler_stats=scaler_stats)
        m = (graph.train_mask & graph.node_mask).astype(logp.dtype)
        nll = -jnp.take_along_axis(
            logp, graph.y[:, None].astype(jnp.int32), axis=1)[:, 0]
        if loss_mode == "saint":
            loss = jnp.sum(nll * graph.node_norm * m)
        elif loss_mode == "saint_mean":
            loss = (jnp.sum(nll * graph.node_norm * m)
                    / jnp.maximum(jnp.sum(graph.node_norm * m), 1e-12))
        elif loss_mode == "full":
            loss = jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
        else:
            raise ValueError(f"unknown loss_mode {loss_mode!r}")
        correct = jnp.sum((jnp.argmax(logp, -1) == graph.y) * m)
        acc = correct / jnp.maximum(jnp.sum(m), 1.0)
        # Every shard computes the identical replicated loss; return it as
        # psum/n so shard_map's transpose (which psums replicated-input
        # cotangents) yields exact gradients — without this, replicated
        # leaves' grads come out multiplied by the axis size (measured 4x
        # at n_shards=4 in the parity test).
        n_sh = jax.lax.axis_size(axis)
        return (jax.lax.psum(loss, axis) / n_sh,
                jax.lax.psum(acc, axis) / n_sh)

    @jax.jit
    def step(params, opt_state, graph, key):
        pspecs = tp_param_specs(params, axis)
        gspecs = jax.tree_util.tree_map(lambda _: P(), graph)
        fn = shard_map(
            local_loss, mesh=mesh,
            in_specs=(pspecs, gspecs, P()), out_specs=(P(), P()),
            check_vma=False,
        )
        (loss, acc), grads = jax.value_and_grad(
            lambda p: fn(p, graph, key), has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "train_acc": acc}

    return step


def make_dp_tp_train_step(cfg, mesh: Mesh, tx, loss_mode: str = "full",
                          data_axis: str = "data", axis: str = "heads",
                          scaler_stats=None):
    """Combined data-parallel x head-TP step over a ('data', ..., 'heads')
    mesh: the batch Graph carries a leading replica axis sharded over
    `data_axis` (stack_graphs/shard pattern), params in the
    tp_shard_params layout are head-sharded over `axis` and replicated
    over `data_axis`. Loss = mean over replicas; gradient all-reduce over
    both axes via shard_map's transpose (same psum/axis_size discipline
    as make_tp_train_step, applied per axis)."""
    import optax

    def local_loss(params, graph_in, key):
        graph = jax.tree_util.tree_map(lambda l: l[0], graph_in)
        di = jax.lax.axis_index(data_axis)
        my_key = jax.random.fold_in(key, di)
        logp = amp_gcn_forward_heads(
            params, graph, cfg, my_key, axis=axis, scaler_stats=scaler_stats)
        m = (graph.train_mask & graph.node_mask).astype(logp.dtype)
        nll = -jnp.take_along_axis(
            logp, graph.y[:, None].astype(jnp.int32), axis=1)[:, 0]
        if loss_mode == "saint":
            replica_loss = jnp.sum(nll * graph.node_norm * m)
        elif loss_mode == "saint_mean":
            replica_loss = (jnp.sum(nll * graph.node_norm * m)
                            / jnp.maximum(jnp.sum(graph.node_norm * m), 1e-12))
        elif loss_mode == "full":
            replica_loss = jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
        else:
            raise ValueError(f"unknown loss_mode {loss_mode!r}")
        correct = jnp.sum((jnp.argmax(logp, -1) == graph.y) * m)
        # replicated over 'heads' within a replica -> psum/n_heads; then
        # mean over data replicas -> psum/n_data
        nh = jax.lax.axis_size(axis)
        nd = jax.lax.axis_size(data_axis)
        loss = jax.lax.psum(jax.lax.psum(replica_loss, axis) / nh,
                            data_axis) / nd
        acc = (jax.lax.psum(jax.lax.psum(correct, axis) / nh, data_axis)
               / jnp.maximum(jax.lax.psum(
                   jax.lax.psum(jnp.sum(m), axis) / nh, data_axis), 1.0))
        return loss, acc

    @jax.jit
    def step(params, opt_state, batch, key):
        pspecs = tp_param_specs(params, axis)
        gspecs = jax.tree_util.tree_map(lambda _: P(data_axis), batch)
        fn = shard_map(
            local_loss, mesh=mesh,
            in_specs=(pspecs, gspecs, P()), out_specs=(P(), P()),
            check_vma=False,
        )
        (loss, acc), grads = jax.value_and_grad(
            lambda p: fn(p, batch, key), has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "train_acc": acc}

    return step
