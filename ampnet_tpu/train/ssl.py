"""Self-supervised pretraining heads.

The reference ships two SSL scripts whose loss is a `criterion = None`
stub (synthetic_benchmark/contrastive_ssl_AMPNet.py:79 — they crash if
run); the intended GraphSAGE skip-gram objective is transcribed in their
comments (:14-49). Implemented here for real (SURVEY §7.2.8):

  * contrastive (skip-gram): for each edge (u, v),
      L = -log sigmoid(z_u . z_v) - Q * E_neg[log sigmoid(-z_u . z_n)]
    with Q uniform negative samples per positive;
  * predictive: reconstruct masked node feature values from the pooled
    embedding (the natural predictive objective for the tokenized model).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ampnet_tpu.core.graph import Graph
from ampnet_tpu.train.state import TrainState, split_rngs


def skipgram_loss(
    embeddings: jnp.ndarray,     # [N, D] pooled node embeddings
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_mask: jnp.ndarray,
    neg_key: jax.Array,
    num_negatives: int = 5,
    node_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """GraphSAGE skip-gram loss (contrastive_ssl_AMPNet.py:43-48 intent).

    Negatives are drawn from VALID nodes only when node_mask is given:
    graphs are padded (GraphSAINT pads ~30%), and uniform sampling over
    the padded range would make a third of the negatives bias-driven
    pad-row embeddings, systematically skewing the contrastive gradient.
    """
    z = embeddings
    zu, zv = z[senders], z[receivers]
    pos_logit = jnp.sum(zu * zv, axis=-1)
    m = edge_mask.astype(z.dtype)
    pos = -jax.nn.log_sigmoid(pos_logit) * m

    if node_mask is not None:
        logits_nodes = jnp.where(node_mask, 0.0, -jnp.inf)  # uniform over valid
        neg_idx = jax.random.categorical(
            neg_key, logits_nodes[None, :],
            shape=(senders.shape[0], num_negatives),
        ).astype(jnp.int32)
    else:
        neg_idx = jax.random.randint(
            neg_key, (senders.shape[0], num_negatives), 0, z.shape[0]
        )
    zn = z[neg_idx]                                    # [E, Q, D]
    neg_logit = jnp.einsum("ed,eqd->eq", zu, zn)
    neg = -jnp.sum(jax.nn.log_sigmoid(-neg_logit), axis=-1) * m

    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(pos + neg) / denom


def predictive_masked_feature_loss(
    pooled: jnp.ndarray,          # [N, D] pooled embeddings
    x: jnp.ndarray,               # [N, F] raw features
    node_mask: jnp.ndarray,
    predictor: Callable[[jnp.ndarray], jnp.ndarray],  # [N, D] -> [N, F]
) -> jnp.ndarray:
    """Predict (binary) feature presence from the pooled embedding."""
    logits = predictor(pooled)
    targets = (x != 0).astype(logits.dtype)
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    m = node_mask.astype(logits.dtype)[:, None]
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m) * x.shape[1], 1.0)


class SSLPretrainer(nn.Module):
    """Wraps a backbone (AMPGCN-style, returning aux['pooled']) with SSL
    heads. mode: 'contrastive' | 'predictive'."""

    backbone: nn.Module
    mode: str = "contrastive"
    num_negatives: int = 5
    num_features: int = 1433

    @nn.compact
    def __call__(self, graph: Graph, deterministic: bool = False) -> jnp.ndarray:
        out = self.backbone(graph, deterministic=deterministic, return_aux=True)
        pooled = out.aux["pooled"]
        if self.mode == "contrastive":
            neg_key = self.make_rng("negatives")
            return skipgram_loss(
                pooled, graph.senders, graph.receivers, graph.edge_mask,
                neg_key, self.num_negatives, node_mask=graph.node_mask,
            )
        elif self.mode == "predictive":
            dense = nn.Dense(self.num_features, name="feature_predictor")
            return predictive_masked_feature_loss(
                pooled, graph.x, graph.node_mask, dense
            )
        raise ValueError(f"unknown SSL mode {self.mode!r}")


def make_ssl_train_step(model: SSLPretrainer):
    @jax.jit
    def step(state: TrainState, graph: Graph):
        new_rng, rngs = split_rngs(state.rng)
        rngs["negatives"] = jax.random.fold_in(state.rng, 77)

        def loss_fn(params):
            return model.apply(
                {"params": params}, graph, deterministic=False, rngs=rngs
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads, rng=new_rng), {"loss": loss}

    return step
