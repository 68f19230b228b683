"""AMPGCN — the flagship model: tokenize -> 2x AMPConv -> pool -> classify.

Forward pipeline mirrors the reference exactly
(src/ampnet/module/amp_gcn.py:239-276):
  edge dropout -> feature tokenization -> dropout -> AMPConv1 -> ReLU ->
  dropout -> AMPConv2 -> ReLU -> dropout -> token mean-pool (or CLS) ->
  linear head -> log_softmax (or sigmoid).

Differences, by design (SURVEY §7.2):
  * All randomness is keyed ('sample' for token sampling, 'dropout' for
    dropouts, 'edges' for adjacency dropout).
  * Attention weights, sampled indices, and per-conv embeddings are
    returned as aux outputs instead of cached on the module
    (amp_gcn.py:244,249,260 / amp_conv.py:12-13).
  * When average_pooling=False the CLS token is actually prepended and
    pooled; the reference declares a cls_token (amp_gcn.py:63-65) but
    never inserts it, pooling the first sampled token instead
    (amp_gcn.py:270) — a defect we fix rather than replicate.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.core.graph import Graph
from ampnet_tpu.models.layers import AMPConv, GCNConv, dropout_edges
from ampnet_tpu.models.tokenizer import FeatureTokenizer
from ampnet_tpu.ops.tokenize import standardize


@struct.dataclass
class ModelOutput:
    logits: jnp.ndarray                      # [N, C] log-probs (or sigmoid probs)
    aux: Dict[str, Any] = struct.field(default_factory=dict)


class AMPGCN(nn.Module):
    config: AMPGCNConfig
    pca_embedding: Optional[jnp.ndarray] = None
    # (mean, std) dataset-level scaler stats (ops.tokenize.fit_scaler) for
    # cfg.scaler='precomputed' — constants, like pca_embedding
    scaler_stats: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None

    @nn.compact
    def __call__(
        self,
        graph: Graph,
        deterministic: bool = True,
        sampled_idx: Optional[jnp.ndarray] = None,
        return_aux: bool = True,
        fused_fns=None,  # optional (fn, fn): fused Pallas conv kernels
        edge_layout=None,  # ops.pallas.format.EdgeLayout — activates cfg.use_pallas
    ) -> ModelOutput:
        cfg = self.config
        d = cfg.embedding_dim
        edge_mask = graph.edge_mask

        # Edge dropout (dropout_adj, amp_gcn.py:241) — training only. On
        # the fused path the dropped mask is scattered into the layout's
        # validity slots (AMPConv), so it is honored there too; only the
        # legacy fused_fns closures (no slot map) cannot support it.
        if not deterministic and cfg.dropout_adj_rate > 0.0:
            if fused_fns is not None or (
                edge_layout is not None
                and getattr(edge_layout, "edge_slot", None) is None
            ):
                raise ValueError(
                    "dropout_adj_rate > 0 on the fused path requires an "
                    "EdgeLayout with edge_slot (compute_layout builds one); "
                    "legacy fused_fns closures read only structural validity"
                )
            edge_mask = dropout_edges(
                self.make_rng("edges"), edge_mask, cfg.dropout_adj_rate
            )

        sc_mean, sc_std = self.scaler_stats or (None, None)
        tokens, sidx = FeatureTokenizer(
            cfg.tokenizer(), pca_embedding=self.pca_embedding, name="tokenizer"
        )(graph.x, node_mask=graph.node_mask, sampled_idx=sampled_idx,
          scaler_mean=sc_mean, scaler_std=sc_std)
        # tokens: [N, S, D]

        if not cfg.average_pooling:
            cls = self.param(
                "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, d)
            )
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (tokens.shape[0], 1, d)), tokens], axis=1
            )

        drop = lambda key_name, x: nn.Dropout(
            rate=cfg.dropout_rate, deterministic=deterministic
        )(x)

        compute_dtype = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        )
        convs = [
            AMPConv(
                embed_dim=d,
                num_heads=cfg.num_heads,
                softmax=cfg.attn_softmax,
                use_pallas=cfg.use_pallas,
                dtype=compute_dtype,
                name=f"conv{i+1}",
            )
            for i in range(2)
        ]

        if cfg.transformer_block:
            # pre-LN transformer blocks (reference's declared next
            # architecture, amp_gcn.py:409-451): per block,
            #   x_ = LN(x); x_ = conv(x_); x = drop(x) + x_
            #   x_ = LN(x); x_ = ELU(MLP(x_)); x = x + x_
            x = tokens
            attns, embs = [], []
            for i, conv in enumerate(convs):
                h = nn.LayerNorm(use_scale=False, use_bias=False,
                                 name=f"layer_norm{2*i+1}")(x)
                h, attn = conv(
                    h, graph.senders, graph.receivers, edge_mask,
                    deterministic=deterministic, return_weights=return_aux,
                    fused_fn=None if fused_fns is None else fused_fns[i],
                    layout=edge_layout,
                )
                attns.append(attn)
                embs.append(h)
                x = drop(f"b{i}", x) + h
                h = nn.LayerNorm(use_scale=False, use_bias=False,
                                 name=f"layer_norm{2*i+2}")(x)
                h = nn.Dense(d, name=f"post_conv_linear{i+1}")(h)
                x = x + nn.elu(h)
            attn1, attn2 = attns
            conv1_embedding, conv2_embedding = embs
        else:
            # plain conv stack — what the reference actually runs
            # (amp_gcn.py:247-262)
            x = drop("d1", tokens)
            x, attn1 = convs[0](
                x, graph.senders, graph.receivers, edge_mask,
                deterministic=deterministic, return_weights=return_aux,
                fused_fn=None if fused_fns is None else fused_fns[0],
                layout=edge_layout,
            )
            conv1_embedding = x
            x = nn.relu(x)

            x = drop("d2", x)
            x, attn2 = convs[1](
                x, graph.senders, graph.receivers, edge_mask,
                deterministic=deterministic, return_weights=return_aux,
                fused_fn=None if fused_fns is None else fused_fns[1],
                layout=edge_layout,
            )
            conv2_embedding = x
            x = nn.relu(x)

            x = drop("d3", x)
        if cfg.average_pooling:
            pooled = jnp.mean(x, axis=1)       # mean over tokens (amp_gcn.py:268)
        else:
            pooled = x[:, 0]                   # CLS token (amp_gcn.py:270)

        if cfg.raw_residual:
            # Framework extension (see AMPGCNConfig.raw_residual): the
            # sampling frontend passes S of F features; give the head a
            # full-feature view via the GCN-raw baseline's z-scored
            # frontend. Modes: 'mlp' projects raw features directly
            # (measured: overfits — raw Cora features carry little
            # signal without neighborhood aggregation); 'gcn'/'gcn2' run
            # 1/2 symmetric-normalized GCN hops first (the structure
            # that makes the GCN-raw baseline strong). The attention
            # pathway is untouched — interpretability outputs stay
            # meaningful.
            mode = (cfg.raw_residual if isinstance(cfg.raw_residual, str)
                    else "mlp")
            xr = standardize(graph.x, mean=sc_mean, std=sc_std,
                             node_mask=graph.node_mask)
            if mode == "mlp":
                xr = nn.relu(nn.Dense(d, name="raw_residual_proj")(xr))
            elif mode in ("gcn", "gcn2"):
                xr = nn.relu(GCNConv(d, name="raw_residual_conv1")(
                    xr, graph.senders, graph.receivers, edge_mask))
                if mode == "gcn2":
                    xr = drop("draw1", xr)
                    xr = nn.relu(GCNConv(d, name="raw_residual_conv2")(
                        xr, graph.senders, graph.receivers, edge_mask))
            else:
                raise ValueError(f"unknown raw_residual mode: {mode!r}")
            xr = drop("draw", xr)
            # keep aux['pooled'] = the TOKEN pooling (its documented
            # meaning for histograms/SSL); the widened head input and the
            # residual pathway are exposed under their own keys
            head_in = jnp.concatenate([pooled, xr], axis=-1)
        else:
            xr = None
            head_in = pooled

        # Deliberate deviation: the reference's head keeps torch Linear's
        # kaiming-uniform default; we use xavier-uniform here (slightly
        # smaller scale at output_dim << d) — measured equivalent on the
        # surrogate, documented per ADVICE r1.
        logits = nn.Dense(
            cfg.output_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            name="final_linear_out",
        )(head_in)

        if cfg.softmax_out:
            out = jax.nn.log_softmax(logits, axis=-1)
        else:
            out = jax.nn.sigmoid(logits)

        aux: Dict[str, Any] = {}
        if return_aux:
            aux = {
                "sampled_idx": sidx,
                "attn_weights_1": attn1,
                "attn_weights_2": attn2,
                "conv1_embedding": conv1_embedding,
                "conv2_embedding": conv2_embedding,
                "pooled": pooled,
                **({"raw_residual": xr} if xr is not None else {}),
            }
        return ModelOutput(logits=out, aux=aux)
