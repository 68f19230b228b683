"""Freeze check — mirrors synthetic_benchmark/ampnet_freeze_check.py:20-23:
train with all parameters frozen except the final linear head (and
optionally the tokenizer); if accuracy still improves, the attention
layers' random features alone carry signal — a sanity harness that the
trained attention layers are doing real work when unfrozen runs beat this."""
import argparse

import jax
import optax

from common import *  # noqa: F401,F403

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.data.synthetic import get_duplicated_xor_graphs
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import create_train_state, make_train_step
from ampnet_tpu.train.optim import make_optimizer


def train_model(epochs=100, also_train_tokenizer=True):
    train_g, _ = get_duplicated_xor_graphs(400, 64, 0.3, 10, 5, seed=0)
    cfg = AMPGCNConfig(
        embedding_dim=32, num_heads=2, num_node_features=10,
        num_sampled_vectors=8, output_dim=2, feat_emb_dim=31, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    )
    model = AMPGCN(config=cfg)

    trainable = {"final_linear_out"}
    if also_train_tokenizer:
        trainable.add("tokenizer")

    def label_fn(params):
        return {k: ("train" if k in trainable else "freeze") for k in params}

    tx = optax.multi_transform(
        {"train": make_optimizer(5e-3, grad_clip=1.0), "freeze": optax.set_to_zero()},
        label_fn,
    )
    state = create_train_state(model, train_g, tx, seed=0)
    frozen_before = jax.tree_util.tree_map(lambda a: a.copy(), state.params["conv1"])
    step = make_train_step(model, loss_mode="full")
    for epoch in range(epochs):
        state, metrics = step(state, train_g)
        if epoch % 20 == 0:
            print(f"epoch {epoch:4d} | loss {float(metrics['loss']):.4f} | "
                  f"train acc {float(metrics['train_acc']):.4f}")
    # frozen layers must be bit-identical
    import numpy as np

    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        frozen_before, state.params["conv1"],
    )
    print("conv1 max param delta (must be 0):", max(jax.tree_util.tree_leaves(deltas)))
    return state


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=100)
    a = p.parse_args()
    train_model(a.epochs)
