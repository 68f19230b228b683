"""Two-blob synthetic benchmark: AMPConv vs GCN vs MLP — mirrors
examples/synthetic_benchmark.py in the reference (informative + noise
features, homotypic/heterotypic edges, Linear-embed -> 2x AMPConv ->
Linear head)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ampnet_tpu.core.graph import from_arrays
from ampnet_tpu.models.amp_gcn import ModelOutput
from ampnet_tpu.models.layers import AMPConv, GCNConv
from ampnet_tpu.train import create_train_state, make_eval_step, make_train_step
from ampnet_tpu.train.optim import make_optimizer


def create_two_sample_dataset(
    n_class_1=25, n_class_2=25, mean_1=0.7, mean_2=0.0,
    n_informative_features=50, n_noise_features=50,
    homotypic_edge_prob=0.8, heterotypic_edge_prob=0.3, seed=1,
):
    rng = np.random.default_rng(seed)
    n = n_class_1 + n_class_2
    y = np.concatenate([np.zeros(n_class_1, np.int32), np.ones(n_class_2, np.int32)])
    informative = np.concatenate([
        rng.normal(mean_1, 1, (n_class_1, n_informative_features)),
        rng.normal(mean_2, 1, (n_class_2, n_informative_features)),
    ])
    noise = rng.normal(0, 1, (n, n_noise_features))
    x = np.concatenate([informative, noise], axis=1).astype(np.float32)
    same = y[:, None] == y[None, :]
    p = np.where(same, homotypic_edge_prob, heterotypic_edge_prob)
    adj = rng.random((n, n)) < p
    src, dst = np.nonzero(adj)
    edge_index = np.stack([src, dst]).astype(np.int32)
    # random split: 20/class train; of the remaining 5/class, 5 val + 5 test
    # total (tiny example — accuracy granularity is coarse by design)
    train_mask = np.zeros(n, bool)
    for c in (0, 1):
        train_mask[rng.choice(np.where(y == c)[0], 20, replace=False)] = True
    rest = np.where(~train_mask)[0]
    rng.shuffle(rest)
    val_mask = np.zeros(n, bool)
    test_mask = np.zeros(n, bool)
    val_mask[rest[:5]] = True
    test_mask[rest[5:10]] = True
    return from_arrays(x, edge_index, y=y, train_mask=train_mask,
                       val_mask=val_mask, test_mask=test_mask)


class ExampleAMPGCN(nn.Module):
    """Linear embed to 3 dims/feature -> 2x AMPConv -> linear head."""

    num_features: int = 100
    embed_dim: int = 3
    out_dim: int = 2

    @nn.compact
    def __call__(self, graph, deterministic=True, return_aux=False, **kw) -> ModelOutput:
        f, d = self.num_features, self.embed_dim
        x = nn.Dense(f * d, name="embed")(graph.x).reshape(-1, f, d)
        x, _ = AMPConv(d, 1, name="conv1")(
            x, graph.senders, graph.receivers, graph.edge_mask,
            deterministic=deterministic, return_weights=False)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x, _ = AMPConv(d, 1, name="conv2")(
            x, graph.senders, graph.receivers, graph.edge_mask,
            deterministic=deterministic, return_weights=False)
        logits = nn.Dense(self.out_dim, name="linear")(x.reshape(x.shape[0], -1))
        return ModelOutput(logits=jax.nn.log_softmax(logits, -1), aux={})


class ExampleGCN(nn.Module):
    out_dim: int = 2

    @nn.compact
    def __call__(self, graph, deterministic=True, return_aux=False, **kw) -> ModelOutput:
        x = GCNConv(16, name="conv1")(graph.x, graph.senders, graph.receivers, graph.edge_mask)
        x = nn.relu(x)
        x = GCNConv(self.out_dim, name="conv2")(x, graph.senders, graph.receivers, graph.edge_mask)
        return ModelOutput(logits=jax.nn.log_softmax(x, -1), aux={})


def train(model, g, epochs=100, lr=1e-2):
    state = create_train_state(model, g, make_optimizer(lr), seed=0)
    step = make_train_step(model, loss_mode="full")
    eval_step = make_eval_step(model)
    for _ in range(epochs):
        state, metrics = step(state, g)
    final = eval_step(state.params, g, jax.random.PRNGKey(7))
    return float(final["test_acc"])


if __name__ == "__main__":
    g = create_two_sample_dataset()
    for name, model in [("AMPGCN", ExampleAMPGCN()), ("GCN", ExampleGCN())]:
        acc = train(model, g)
        print(f"{name}: test acc {acc:.4f}")
