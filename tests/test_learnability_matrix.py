"""XOR learnability regression matrix.

The reference's manual regression record
(synthetic_benchmark/notes_scaling_to_cora_size.txt, SURVEY §4.2/§6)
tracks which (tokens-per-node, embedding-dim) configs converge on
duplicated-feature XOR. This encodes scaled-down versions of the
known-good rows as slow tests: S=20/D=32-style configs converge, and the
framework must reproduce that qualitatively.
"""
import dataclasses

import pytest

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig
from ampnet_tpu.data.synthetic import get_duplicated_xor_graphs
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import train_full_batch


@pytest.mark.slow
@pytest.mark.parametrize(
    "num_sampled,emb_dim",
    [
        (8, 16),   # scaled-down analogue of the converging S=20/D=32 row
        (12, 32),
    ],
)
def test_duplicated_xor_converges(num_sampled, emb_dim):
    train_g, _ = get_duplicated_xor_graphs(
        num_train_samples=120, num_test_samples=24, noise_std=0.25,
        num_nearest_neighbors=8, feature_repeats=5, seed=0,
    )
    cfg = AMPGCNConfig(
        embedding_dim=emb_dim, num_heads=2, num_node_features=10,
        num_sampled_vectors=num_sampled, output_dim=2,
        feat_emb_dim=emb_dim - 1, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    )
    model = AMPGCN(config=cfg)
    tcfg = TrainConfig(learning_rate=5e-3, weight_decay=0.0, epochs=120,
                       cosine_t0=None, grad_clip=1.0, log_every=60)
    result = train_full_batch(model, train_g, tcfg)
    best = max(h["train_acc"] for h in result["history"])
    assert best > 0.85, f"S={num_sampled} D={emb_dim} failed to converge: {best}"
