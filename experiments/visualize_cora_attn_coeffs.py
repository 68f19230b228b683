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


def main(checkpoint_path=None, save_path="attn_coeff_plots",
         class_pairs=((0, 0), (3, 3), (0, 3)), stabilized=False,
         raw_residual=""):
    d, g = cora_graph()
    scaler_stats = None
    if stabilized:
        from ampnet_tpu.ops.tokenize import fit_scaler

        scaler_stats = fit_scaler(np.asarray(d.x))
    cfg = AMPGCNConfig(
        embedding_dim=128, num_heads=4, num_node_features=1433,
        num_sampled_vectors=40 if stabilized else 20,
        output_dim=7, feat_emb_dim=127, val_emb_dim=1,
        token_sampling="tfidf" if stabilized else "uniform",
        scaler="precomputed" if stabilized else "batch",
        raw_residual=raw_residual or False,
    )
    model = AMPGCN(config=cfg, scaler_stats=scaler_stats)
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
        # use the PADDED feature matrix with the padded labels: node and
        # edge arrays must index consistently (padded edges are filtered
        # by edge_mask, but y[senders] touches pad indices first), and
        # all-zero pad rows add nothing to the per-class feature counts
        x=np.asarray(g.x), y=np.asarray(g.y),
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
    p.add_argument("--stabilized", action="store_true",
                   help="model flags of the stabilized recipe (tfidf S=40, "
                        "precomputed scaler) — must match the checkpoint")
    p.add_argument("--raw-residual", default="",
                   help="'' | mlp | gcn | gcn2 — must match the checkpoint")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (sitecustomize pins the TPU "
                        "plugin; env vars alone are not honored)")
    p.add_argument("--out", default="attn_coeff_plots")
    a = p.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    main(a.checkpoint, a.out, stabilized=a.stabilized,
         raw_residual=a.raw_residual)
