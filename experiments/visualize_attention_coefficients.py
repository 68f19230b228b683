"""XOR attention-coefficient visualization — mirrors
synthetic_benchmark/visualize_attention_coefficients.py: forward a trained
model on the XOR graph, bucket edges by (src-quadrant, dst-quadrant) of
the truth table, histogram the per-edge attention entries."""
import argparse

import jax
import numpy as np

from common import *  # noqa: F401,F403

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.data.synthetic import get_xor_graphs
from ampnet_tpu.interpret.attention import plot_xor_attn_weights
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import create_train_state, load_checkpoint_params, make_optimizer


def main(checkpoint_path=None, save_path="xor_attn_plots", softmax_attn=True):
    train_g, _ = get_xor_graphs(400, 64, 0.3, seed=0)
    cfg = AMPGCNConfig(
        embedding_dim=16, num_heads=2, num_node_features=2,
        num_sampled_vectors=8, output_dim=2, feat_emb_dim=15, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0, attn_softmax=softmax_attn,
    )
    model = AMPGCN(config=cfg)
    state = create_train_state(model, train_g, make_optimizer(1e-3), seed=0)
    params = state.params
    if checkpoint_path:
        params = load_checkpoint_params(checkpoint_path, params)
    out = model.apply(
        {"params": params}, train_g, deterministic=True,
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    # no-softmax weights are unbounded: keep the reference's wide bins (:188)
    bins = (-7.5, 7.5) if not softmax_attn else (0.0, 1.0)
    path = plot_xor_attn_weights(
        x=np.asarray(train_g.x), y=np.asarray(train_g.y),
        senders=np.asarray(train_g.senders), receivers=np.asarray(train_g.receivers),
        edge_mask=np.asarray(train_g.edge_mask),
        attn_weights=np.asarray(out.aux["attn_weights_1"]),
        save_path=save_path, bins=bins,
    )
    print("saved", path)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--no-softmax", action="store_true")
    a = p.parse_args()
    main(a.checkpoint, softmax_attn=not a.no_softmax)
