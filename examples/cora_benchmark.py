"""Minimal AMPConv-on-Cora example — mirrors examples/cora_benchmark.py
(emb 12 / 3 heads), with the stale `embed_features` import replaced by the
packaged tokenizer and a proper classifier head (the reference's example
lacked one, log_softmax-ing the flattened features directly :36-45)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig
from ampnet_tpu.core.graph import from_arrays
from ampnet_tpu.data.planetoid import load_cora
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import train_full_batch

if __name__ == "__main__":
    d = load_cora()
    g = from_arrays(
        d.x, d.edge_index, y=d.y,
        train_mask=d.train_mask, val_mask=d.val_mask, test_mask=d.test_mask,
    )
    model = AMPGCN(config=AMPGCNConfig(
        embedding_dim=12, num_heads=3, num_node_features=1433,
        num_sampled_vectors=20, output_dim=7, feat_emb_dim=11, val_emb_dim=1,
    ))
    cfg = TrainConfig(learning_rate=1e-2, weight_decay=5e-4, epochs=30,
                      cosine_t0=None, log_every=5)
    train_full_batch(model, g, cfg)
