"""Feature tokenizer module: scalar features -> vector tokens.

Re-creates the reference's two tokenization frontends
(reference: src/ampnet/module/amp_gcn.py:120-237):
  * 'table': learnable feature-identity embedding table (nn.Embedding,
    amp_gcn.py:56-59) concatenated with the z-scored feature value;
  * 'pca': fixed PCA-of-transpose feature embedding (amp_gcn.py:185-206),
    stored as a non-trainable constant computed once per dataset.

Sampling is functional (jax.random keys) instead of global numpy RNG —
the reference resamples every forward, train AND eval (amp_gcn.py:135);
here the caller controls the key, so eval can be deterministic.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ampnet_tpu.core.config import TokenizerConfig
from ampnet_tpu.ops.tokenize import (
    balanced_sample_features,
    gather_tokens,
    sample_present_features,
    standardize,
    tfidf_sample_features,
    tile_all_tokens,
)


class FeatureTokenizer(nn.Module):
    """x [N, F] -> tokens [N, S, D], sampled indices [N, S].

    D = feat_emb_dim + val_emb_dim (asserted at amp_gcn.py:37; val dim is
    always the raw value appended, amp_gcn.py:145-146).
    """

    config: TokenizerConfig
    pca_embedding: Optional[jnp.ndarray] = None  # [F, feat_emb_dim] for 'pca'

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        node_mask: Optional[jnp.ndarray] = None,
        scaler_mean: Optional[jnp.ndarray] = None,
        scaler_std: Optional[jnp.ndarray] = None,
        sampled_idx: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self.config

        if cfg.frontend == "table":
            table = self.param(
                "feature_embedding_table",
                nn.initializers.normal(stddev=1.0),  # torch nn.Embedding default N(0,1)
                (cfg.num_node_features, cfg.feat_emb_dim),
            )
        elif cfg.frontend == "pca":
            if self.pca_embedding is None:
                raise ValueError("pca frontend requires a precomputed pca_embedding")
            table = jnp.asarray(self.pca_embedding)
        else:
            raise ValueError(f"unknown frontend {cfg.frontend!r}")

        if cfg.scaler == "none":
            x_norm = x
        elif cfg.scaler == "precomputed":
            if scaler_mean is None or scaler_std is None:
                raise ValueError(
                    "scaler='precomputed' requires scaler_mean and scaler_std; "
                    "a silent fallback to batch stats would normalize over "
                    "padded all-zero rows"
                )
            x_norm = standardize(x, scaler_mean, scaler_std)
        else:  # 'batch' — refit on current batch, matching amp_gcn.py:122-124
            x_norm = standardize(x, node_mask=node_mask)

        if cfg.downsample:
            if sampled_idx is None:
                key = self.make_rng("sample")
                if cfg.balanced_sampling:
                    sampled_idx = balanced_sample_features(key, x, cfg.num_sampled_vectors)
                elif cfg.sampling == "tfidf":
                    sampled_idx = tfidf_sample_features(
                        key, x, cfg.num_sampled_vectors, node_mask=node_mask)
                else:
                    sampled_idx = sample_present_features(key, x, cfg.num_sampled_vectors)
            tokens = gather_tokens(x_norm, sampled_idx, table)
        else:
            sampled_idx = None
            tokens = tile_all_tokens(x_norm, table, cfg.feature_repeats)
        return tokens, sampled_idx
