"""Linear-probe floor baseline on Cora — mirrors
experiments/cora_linear_layer_baseline.py:48-286: PCA feature embedding +
mask-token downsampling + a single linear layer, trained on GraphSAINT
subgraphs."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from common import cora_graph

from ampnet_tpu.core.config import TrainConfig
from ampnet_tpu.data.graphsaint import GraphSaintRandomWalkSampler
from ampnet_tpu.data.planetoid import load_cora
from ampnet_tpu.models.amp_gcn import ModelOutput
from ampnet_tpu.ops.tokenize import balanced_sample_features, pca_feature_embedding
from ampnet_tpu.train import create_train_state, make_eval_step, make_train_step
from ampnet_tpu.train.optim import make_optimizer


class LinearLayerModel(nn.Module):
    """PCA-embed + mask-token sampling + linear head."""

    pca_embedding: jnp.ndarray
    num_node_features: int = 1433
    num_sampled_vectors: int = 40
    feat_emb_dim: int = 99
    val_emb_dim: int = 1
    output_dim: int = 7

    @nn.compact
    def __call__(self, graph, deterministic=True, return_aux=False, **kw) -> ModelOutput:
        emb_dim = self.feat_emb_dim + self.val_emb_dim
        f = self.num_node_features
        x = graph.x
        n = x.shape[0]
        mask_token = self.param("mask_token", nn.initializers.normal(0.02), (1, emb_dim))
        table = jnp.asarray(self.pca_embedding)
        emb = jnp.broadcast_to(table[None], (n, f, self.feat_emb_dim))
        tokens = jnp.concatenate([emb, x[..., None]], axis=-1)
        sidx = balanced_sample_features(self.make_rng("sample"), x, self.num_sampled_vectors)
        keep = jnp.zeros((n, f), dtype=bool)
        keep = jax.vmap(lambda k, i: k.at[i].set(True))(keep, sidx)
        tokens = jnp.where(keep[..., None], tokens, mask_token[None])
        flat = tokens.reshape(n, f * emb_dim)
        flat = (flat - jnp.mean(flat)) / jnp.maximum(jnp.std(flat), 1e-12)
        logits = nn.Dense(self.output_dim, name="lin")(flat)
        return ModelOutput(logits=jax.nn.log_softmax(logits, -1), aux={})


def main(epochs=10, steps=50):
    d, full_g = cora_graph()
    pca = pca_feature_embedding(d.x, 99)
    sampler = GraphSaintRandomWalkSampler(
        d.x, d.edge_index, y=d.y,
        train_mask=d.train_mask, val_mask=d.val_mask, test_mask=d.test_mask,
        batch_size=8, walk_length=150, num_steps=steps, sample_coverage=20, seed=0,
    )
    model = LinearLayerModel(pca_embedding=jnp.asarray(pca))
    tx = make_optimizer(1e-2, weight_decay=1e-4)
    state = create_train_state(model, sampler.sample(), tx, seed=0)
    step = make_train_step(model, loss_mode="saint")
    eval_step = make_eval_step(model)
    for epoch in range(epochs):
        for sub in sampler:
            state, metrics = step(state, sub)
        print(f"epoch {epoch:3d} | loss {float(metrics['loss']):.4f}")
    final = eval_step(state.params, full_g, jax.random.PRNGKey(9))
    print(f"Final Test Accuracy (linear probe): {float(final['test_acc']):.4f}")
    return final


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    a = p.parse_args()
    main(a.epochs)
