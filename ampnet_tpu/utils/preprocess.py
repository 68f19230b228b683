"""Legacy PCA preprocessor.

Re-creates `embed_features_old` (reference:
src/ampnet/utils/preprocess.py:8-26, exported via src/ampnet/__init__.py):
feature-identity embedding = PCA of the transposed feature matrix,
concatenated with the repeated raw value, z-scored per column — the
original (pre-embedding-table) tokenization frontend. Also the fix for the
reference's stale `embed_features` imports (examples/cora_benchmark.py:9)."""
from __future__ import annotations

import numpy as np

from ampnet_tpu.ops.tokenize import pca_feature_embedding


def embed_features_old(
    x: np.ndarray,
    feature_embed_dim: int = 5,
    value_embed_dim: int = 1,
) -> np.ndarray:
    """x [N, F] -> flattened token matrix [N, F * (feat_dim + val_dim)].

    token(n, f) = concat(PCA(x^T)[f], repeat(x[n, f], value_embed_dim)),
    then z-score each output column (population std, zero-var -> 1)."""
    x = np.asarray(x, dtype=np.float32)
    n, f = x.shape
    emb = pca_feature_embedding(x, feature_embed_dim)          # [F, feat_dim]
    emb_rep = np.broadcast_to(emb[None], (n, f, feature_embed_dim))
    vals = np.repeat(x[..., None], value_embed_dim, axis=-1)   # [N, F, val_dim]
    tokens = np.concatenate([emb_rep, vals], axis=-1)
    flat = tokens.reshape(n, f * (feature_embed_dim + value_embed_dim))
    mean = flat.mean(axis=0)
    std = flat.std(axis=0)
    std[std == 0] = 1.0
    return ((flat - mean) / std).astype(np.float32)


# alias fixing the renamed import the reference left dangling
embed_features = embed_features_old
