"""Overfit-one-subgraph sanity harness — mirrors
experiments/cora_overfit_one_subgraph.py: a deeper 3-layer AMPGCN variant
(3x AMPConv -> LayerNorm -> ReLU, :35-107) trained repeatedly on a single
GraphSAINT subgraph; must reach ~100% train accuracy."""
import argparse

import jax
import jax.numpy as jnp
from flax import linen as nn

from common import cora_graph

from ampnet_tpu.core.config import TokenizerConfig
from ampnet_tpu.data.graphsaint import GraphSaintRandomWalkSampler
from ampnet_tpu.data.planetoid import load_cora
from ampnet_tpu.models.amp_gcn import ModelOutput
from ampnet_tpu.models.layers import AMPConv
from ampnet_tpu.models.tokenizer import FeatureTokenizer
from ampnet_tpu.train import create_train_state, make_train_step
from ampnet_tpu.train.optim import make_optimizer


class AMPGCN3(nn.Module):
    """3-layer AMPGCN: tokenize -> 3x (AMPConv -> LayerNorm -> ReLU) ->
    mean-pool -> linear head."""

    embedding_dim: int = 64
    num_heads: int = 4
    num_node_features: int = 1433
    num_sampled_vectors: int = 20
    output_dim: int = 7

    @nn.compact
    def __call__(self, graph, deterministic=True, return_aux=False, **kw) -> ModelOutput:
        d = self.embedding_dim
        tokens, _ = FeatureTokenizer(TokenizerConfig(
            num_node_features=self.num_node_features,
            feat_emb_dim=d - 1, val_emb_dim=1,
            num_sampled_vectors=self.num_sampled_vectors,
        ), name="tokenizer")(graph.x, node_mask=graph.node_mask)
        x = tokens
        for i in range(3):
            x, _ = AMPConv(d, self.num_heads, name=f"conv{i+1}")(
                x, graph.senders, graph.receivers, graph.edge_mask,
                deterministic=deterministic, return_weights=False,
            )
            x = nn.LayerNorm(use_scale=False, use_bias=False)(x)
            x = nn.relu(x)
        pooled = jnp.mean(x, axis=1)
        logits = nn.Dense(self.output_dim, name="final_linear_out")(pooled)
        return ModelOutput(logits=jax.nn.log_softmax(logits, -1), aux={})


def main(iters=300):
    d, _ = cora_graph()
    sampler = GraphSaintRandomWalkSampler(
        d.x, d.edge_index, y=d.y, train_mask=d.train_mask,
        batch_size=1, walk_length=100, num_steps=1, sample_coverage=0, seed=0,
    )
    sub = sampler.sample()
    model = AMPGCN3()
    tx = make_optimizer(1e-3, grad_clip=1.0)
    state = create_train_state(model, sub, tx, seed=0)
    step = make_train_step(model, loss_mode="full")
    for i in range(iters):
        state, metrics = step(state, sub)
        if i % 50 == 0:
            print(f"iter {i:4d} | loss {float(metrics['loss']):.4f} | "
                  f"train acc {float(metrics['train_acc']):.4f}")
    print(f"final train acc on one subgraph: {float(metrics['train_acc']):.4f}")
    return metrics


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=300)
    a = p.parse_args()
    main(a.iters)
