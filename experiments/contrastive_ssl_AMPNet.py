"""Contrastive SSL pretraining — the reference script
(synthetic_benchmark/contrastive_ssl_AMPNet.py) had `criterion = None`
(:79) and crashed; its commented GraphSAGE skip-gram loss (:14-49) is
implemented for real in ampnet_tpu.train.ssl."""
import argparse

from common import *  # noqa: F401,F403

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.data.synthetic import get_duplicated_xor_graphs
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import create_train_state, make_optimizer
from ampnet_tpu.train.ssl import SSLPretrainer, make_ssl_train_step

MODE = "contrastive"


def train_model(epochs=100, mode=MODE, num_features=10):
    train_g, _ = get_duplicated_xor_graphs(400, 64, 0.3, 10, 5, seed=0)
    backbone = AMPGCN(config=AMPGCNConfig(
        embedding_dim=32, num_heads=2, num_node_features=num_features,
        num_sampled_vectors=8, output_dim=2, feat_emb_dim=31, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    ))
    model = SSLPretrainer(backbone=backbone, mode=mode, num_features=num_features)
    tx = make_optimizer(1e-3, grad_clip=1.0)

    import jax

    rngs = {k: jax.random.PRNGKey(0) for k in ("params", "sample", "dropout", "edges", "negatives")}
    variables = model.init(rngs, train_g, deterministic=True)
    from ampnet_tpu.train.state import TrainState
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        rng=jax.random.PRNGKey(1),
    )
    step = make_ssl_train_step(model)
    for epoch in range(epochs):
        state, metrics = step(state, train_g)
        if epoch % 10 == 0:
            print(f"epoch {epoch:4d} | ssl loss {float(metrics['loss']):.4f}")
    return state


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--mode", default=MODE, choices=["contrastive", "predictive"])
    a = p.parse_args()
    train_model(a.epochs, a.mode)
