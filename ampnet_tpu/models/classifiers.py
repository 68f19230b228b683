"""Secondary model families: AMPNetClassifier, GCN/GCNOneLayer baselines,
MLP baselines, and the model registry.

Reference files: src/ampnet/module/amp_net_classifier_Rahul.py,
gcn_classifier.py, gcn_one_layer.py, linear_layer.py,
two_layer_sigmoid_mlp.py; registry at
synthetic_benchmark/xor_training_utils.py:56-103.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ampnet_tpu.core.graph import Graph
from ampnet_tpu.models.amp_gcn import AMPGCN, ModelOutput
from ampnet_tpu.models.layers import AMPConv, GCNConv, dropout_edges
from ampnet_tpu.ops.tokenize import balanced_sample_features, standardize


class AMPNetClassifier(nn.Module):
    """Early packaged model (amp_net_classifier_Rahul.py:7-57): expects
    pre-embedded token input [N, S, D]; dropout(0.6) -> AMPConv -> ELU, twice,
    then a linear head over the FLATTENED tokens -> log_softmax."""

    num_heads: int
    embed_dim: int
    n_original_features: int   # token count S
    out_dim: int
    dropout_rate: float = 0.6

    @nn.compact
    def __call__(self, graph: Graph, deterministic: bool = True, return_aux: bool = True, **kwargs) -> ModelOutput:
        x = graph.x
        if x.ndim == 2:  # accept flattened [N, S*D] like the reference
            x = x.reshape(x.shape[0], self.n_original_features, self.embed_dim)
        drop = lambda x: nn.Dropout(rate=self.dropout_rate, deterministic=deterministic)(x)

        x = drop(x)
        x, attn1 = AMPConv(self.embed_dim, self.num_heads, name="conv1")(
            x, graph.senders, graph.receivers, graph.edge_mask,
            deterministic=deterministic, return_weights=return_aux,
        )
        conv1_embedding = x
        x = nn.elu(x)
        x = drop(x)
        x, attn2 = AMPConv(self.embed_dim, self.num_heads, name="conv2")(
            x, graph.senders, graph.receivers, graph.edge_mask,
            deterministic=deterministic, return_weights=return_aux,
        )
        conv2_embedding = x
        x = nn.elu(x)
        x = drop(x)
        flat = x.reshape(x.shape[0], -1)
        logits = nn.Dense(self.out_dim, name="linear_out")(flat)
        return ModelOutput(
            logits=jax.nn.log_softmax(logits, axis=-1),
            aux={
                "attn_weights_1": attn1,
                "attn_weights_2": attn2,
                "conv1_embedding": conv1_embedding,
                "conv2_embedding": conv2_embedding,
            },
        )


class GCN(nn.Module):
    """2-layer GCN baseline over tokenized features
    (gcn_classifier.py:17-109): table frontend over ALL features (no
    sampling), flattened [N, F*D] -> GCNConv -> ReLU -> dropout ->
    GCNConv -> log_softmax/sigmoid."""

    num_node_features: int = 1433
    hidden_dim: int = 16
    output_dim: int = 7
    softmax_out: bool = True
    feat_emb_dim: int = 99
    val_emb_dim: int = 1
    dropout_rate: float = 0.1
    dropout_adj_rate: float = 0.1
    # 'tokens': table-embedding frontend (what the reference runs,
    # gcn_classifier.py:69); 'raw': z-scored raw features (the reference's
    # normalize_features variant, :83-89 — the classic Kipf-Welling setup)
    frontend: str = "tokens"
    # dataset-level (mean, std) from ops.tokenize.fit_scaler: consistent
    # train/eval normalization (None = refit per batch like the reference)
    scaler_stats: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None

    @nn.compact
    def __call__(self, graph: Graph, deterministic: bool = True, return_aux: bool = True, **kwargs) -> ModelOutput:
        emb_dim = self.feat_emb_dim + self.val_emb_dim
        edge_mask = graph.edge_mask
        if not deterministic and self.dropout_adj_rate > 0.0:
            edge_mask = dropout_edges(self.make_rng("edges"), edge_mask, self.dropout_adj_rate)

        sc_mean, sc_std = self.scaler_stats or (None, None)
        x_norm = standardize(graph.x, mean=sc_mean, std=sc_std,
                             node_mask=graph.node_mask)
        if self.frontend == "raw":
            x = x_norm
        else:
            table = self.param(
                "feature_embedding_table",
                nn.initializers.normal(stddev=1.0),
                (self.num_node_features, self.feat_emb_dim),
            )
            # every feature becomes a token: concat(table, value) then
            # flatten (gcn_classifier.py:91-109)
            n = x_norm.shape[0]
            emb = jnp.broadcast_to(table[None], (n, self.num_node_features, self.feat_emb_dim))
            tokens = jnp.concatenate([emb, x_norm[..., None]], axis=-1)  # [N, F, D]
            x = tokens.reshape(n, self.num_node_features * emb_dim)

        x = GCNConv(self.hidden_dim, name="conv1")(x, graph.senders, graph.receivers, edge_mask)
        x = nn.relu(x)
        x = nn.Dropout(rate=self.dropout_rate, deterministic=deterministic)(x)
        x = GCNConv(self.output_dim, name="conv2")(x, graph.senders, graph.receivers, edge_mask)
        out = jax.nn.log_softmax(x, axis=-1) if self.softmax_out else jax.nn.sigmoid(x)
        return ModelOutput(logits=out, aux={})


class GCNOneLayer(nn.Module):
    """1-layer GCN over PCA-embedded, mask-token-downsampled features
    (gcn_one_layer.py:17-121). The reference's forward is disabled by
    `assert False` (:60) — implemented for real here.

    pca_embedding: [F, feat_emb_dim] precomputed on host
    (ops.tokenize.pca_feature_embedding)."""

    pca_embedding: jnp.ndarray
    num_node_features: int = 1433
    num_sampled_vectors: int = 40
    output_dim: int = 7
    softmax_out: bool = True
    feat_emb_dim: int = 99
    val_emb_dim: int = 1
    dropout_adj_rate: float = 0.1

    @nn.compact
    def __call__(self, graph: Graph, deterministic: bool = True, return_aux: bool = True, **kwargs) -> ModelOutput:
        emb_dim = self.feat_emb_dim + self.val_emb_dim
        f = self.num_node_features
        edge_mask = graph.edge_mask
        if not deterministic and self.dropout_adj_rate > 0.0:
            edge_mask = dropout_edges(self.make_rng("edges"), edge_mask, self.dropout_adj_rate)

        mask_token = self.param(
            "mask_token", nn.initializers.normal(stddev=0.02), (1, emb_dim)
        )
        x = graph.x
        n = x.shape[0]
        table = jnp.asarray(self.pca_embedding)                       # [F, feat_dim]
        emb = jnp.broadcast_to(table[None], (n, f, self.feat_emb_dim))
        tokens = jnp.concatenate([emb, x[..., None]], axis=-1)        # [N, F, D] (raw values, :81-88)

        # balanced sample w/o replacement; unsampled positions <- mask token
        sidx = balanced_sample_features(self.make_rng("sample"), x, self.num_sampled_vectors)
        keep = jnp.zeros((n, f), dtype=bool)
        keep = jax.vmap(lambda k, i: k.at[i].set(True))(keep, sidx)
        tokens = jnp.where(keep[..., None], tokens, mask_token[None])

        flat = tokens.reshape(n, f * emb_dim)
        # global (whole-tensor) z-score, gcn_one_layer.py:117
        flat = (flat - jnp.mean(flat)) / jnp.maximum(jnp.std(flat), 1e-12)

        out = GCNConv(self.output_dim, name="conv1")(flat, graph.senders, graph.receivers, edge_mask)
        out = jax.nn.log_softmax(out, axis=-1) if self.softmax_out else jax.nn.sigmoid(out)
        return ModelOutput(logits=out, aux={"sampled_idx": sidx})


class LinearLayer(nn.Module):
    """XOR floor baseline: single Linear 2->1 (linear_layer.py:4-12)."""

    out_dim: int = 1

    @nn.compact
    def __call__(self, graph: Graph, deterministic: bool = True, return_aux: bool = True, **kwargs) -> ModelOutput:
        return ModelOutput(logits=nn.Dense(self.out_dim, name="lin1")(graph.x), aux={})


class TwoLayerSigmoid(nn.Module):
    """XOR MLP baseline: 2->4 -> sigmoid -> 4->1 (two_layer_sigmoid_mlp.py:5-18)."""

    hidden_dim: int = 4
    out_dim: int = 1

    @nn.compact
    def __call__(self, graph: Graph, deterministic: bool = True, return_aux: bool = True, **kwargs) -> ModelOutput:
        x = nn.Dense(self.hidden_dim, name="lin1")(graph.x)
        x = nn.sigmoid(x)
        return ModelOutput(logits=nn.Dense(self.out_dim, name="lin2")(x), aux={})


def get_model(name: str, **kwargs) -> nn.Module:
    """String -> configured model, mirroring the reference registry
    (synthetic_benchmark/xor_training_utils.py:56-103)."""
    from ampnet_tpu.core.config import AMPGCNConfig

    registry: Dict[str, Any] = {
        "AMPNet": lambda: AMPGCN(config=AMPGCNConfig(**kwargs)),
        "GCN": lambda: GCN(**kwargs),
        "GCNOneLayer": lambda: GCNOneLayer(**kwargs),
        "LinearLayer": lambda: LinearLayer(**kwargs),
        "TwoLayerSigmoid": lambda: TwoLayerSigmoid(**kwargs),
        "AMPNetClassifier": lambda: AMPNetClassifier(**kwargs),
    }
    if name not in registry:
        raise KeyError(f"unknown model {name!r}; choices: {sorted(registry)}")
    return registry[name]()
