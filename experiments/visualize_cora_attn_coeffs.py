"""Attention-coefficient extraction on Cora — mirrors
experiments/visualize_cora_attn_coeffs.py: load checkpoint -> full-graph
forward -> per class-pair top-30-feature attention heatmaps + clustermaps.
Attention weights and sampled indices come back as aux outputs
(SURVEY §3.4) instead of module caches."""
import argparse

import jax
import numpy as np

from common import cora_graph

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.interpret.attention import visualize_attention_coefficients
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import create_train_state, load_checkpoint_params, make_optimizer


def main(checkpoint_path=None, save_path="attn_coeff_plots", class_pairs=((0, 0), (3, 3), (0, 3))):
    d, g = cora_graph()
    cfg = AMPGCNConfig(
        embedding_dim=128, num_heads=4, num_node_features=1433,
        num_sampled_vectors=20, output_dim=7, feat_emb_dim=127, val_emb_dim=1,
    )
    model = AMPGCN(config=cfg)
    tx = make_optimizer(0.1)
    state = create_train_state(model, g, tx, seed=0)
    params = state.params
    if checkpoint_path:
        params = load_checkpoint_params(checkpoint_path, params)

    out = model.apply(
        {"params": params}, g, deterministic=True,
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    heatmaps = visualize_attention_coefficients(
        x=d.x, y=np.asarray(g.y),
        senders=np.asarray(g.senders), receivers=np.asarray(g.receivers),
        edge_mask=np.asarray(g.edge_mask),
        attn_weights=np.asarray(out.aux["attn_weights_1"]),
        sampled_idx=np.asarray(out.aux["sampled_idx"]),
        save_path=save_path, class_pairs=list(class_pairs),
    )
    print(f"saved {len(heatmaps)} heatmaps to {save_path}")
    return heatmaps


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default="attn_coeff_plots")
    a = p.parse_args()
    main(a.checkpoint, a.out)
