"""Unified config dataclasses.

The reference mixes module-level globals, ARGS dicts, and argparse
(reference: experiments/cora_benchmark_graphsaint.py:26-31,
synthetic_benchmark/synthetic_training_modular.py:124-137,
synthetic_benchmark/synthetic_rgb.py:153-175). Here one dataclass layer
feeds both programmatic use and the CLI drivers.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass(frozen=True)
class AttentionConfig:
    """Per-edge multi-head cross-attention settings.

    softmax=True is what the reference actually runs (stock
    nn.MultiheadAttention, src/ampnet/conv/amp_conv.py:18-22);
    softmax=False is the declared intent of the vendored no-softmax
    functional (src/ampnet/conv/custom_multihead_attn_forward.py:4179-4180).
    """

    embed_dim: int = 128
    num_heads: int = 4
    softmax: bool = True
    dropout_rate: float = 0.0
    bias: bool = True
    use_pallas: bool = False   # fused Pallas kernel vs XLA einsum path


@dataclass(frozen=True)
class TokenizerConfig:
    """Feature tokenization frontend (reference: amp_gcn.py:120-237).

    frontend='table':  learnable feature-identity embedding table
    frontend='pca':    PCA-of-transpose feature embedding
    scaler='batch' re-fits the z-scoring on every batch like the reference
    (amp_gcn.py:122-124); 'precomputed' uses dataset-level stats (the fixed
    version of that quirk); 'none' disables.
    """

    num_node_features: int = 1433
    feat_emb_dim: int = 127
    val_emb_dim: int = 1
    num_sampled_vectors: int = 20
    downsample: bool = True
    frontend: str = "table"          # 'table' | 'pca'
    scaler: str = "batch"            # 'batch' | 'precomputed' | 'none'
    balanced_sampling: bool = False  # 50/50 present/absent, w/o replacement
    # 'uniform' = reference behavior (uniform over present features);
    # 'tfidf' = importance-weighted (framework improvement)
    sampling: str = "uniform"
    feature_repeats: int = 5         # XOR tiled-table variant (amp_gcn.py:168-180)

    @property
    def embed_dim(self) -> int:
        return self.feat_emb_dim + self.val_emb_dim


@dataclass(frozen=True)
class AMPGCNConfig:
    """Flagship model config (reference: src/ampnet/module/amp_gcn.py:21-35)."""

    embedding_dim: int = 128
    num_heads: int = 4
    num_node_features: int = 1433
    num_sampled_vectors: int = 20
    output_dim: int = 7
    softmax_out: bool = True
    feat_emb_dim: int = 127
    val_emb_dim: int = 1
    downsample_feature_vectors: bool = True
    average_pooling: bool = True      # mean-pool tokens vs CLS token
    token_sampling: str = "uniform"   # 'uniform' | 'tfidf'
    dropout_rate: float = 0.1
    dropout_adj_rate: float = 0.1
    feature_repeats: int = 5
    attn_softmax: bool = True
    use_pallas: bool = False
    frontend: str = "table"
    scaler: str = "batch"
    # compute dtype for the conv hot path ('float32' | 'bfloat16');
    # params and the classifier head stay float32
    compute_dtype: str = "float32"
    # pre-LN transformer-block architecture: LayerNorm -> AMPConv ->
    # residual, then LayerNorm -> MLP -> residual, per block — the
    # reference's declared next architecture, kept as commented code
    # (amp_gcn.py:409-451); False = the plain conv stack it actually runs
    transformer_block: bool = False
    # framework extension (not in the reference): concat a z-scored
    # raw-feature pathway to the pooled token embedding before the
    # classifier head — the token-sampling frontend sees only S of F
    # features per pass. False | 'mlp' (dense projection; measured: it
    # overfits) | 'gcn' / 'gcn2' (1/2 symmetric-normalized GCN hops over
    # the raw features — the structure behind the GCN-raw baseline's
    # 0.830). True is accepted as 'mlp'. See RESULTS.md.
    raw_residual: Any = False

    def __post_init__(self):
        if self.embedding_dim != self.feat_emb_dim + self.val_emb_dim:
            raise ValueError(
                "Feature and value dimensions do not add up to total embedding dimension"
            )

    def tokenizer(self) -> TokenizerConfig:
        return TokenizerConfig(
            num_node_features=self.num_node_features,
            feat_emb_dim=self.feat_emb_dim,
            val_emb_dim=self.val_emb_dim,
            num_sampled_vectors=self.num_sampled_vectors,
            downsample=self.downsample_feature_vectors,
            frontend=self.frontend,
            scaler=self.scaler,
            sampling=self.token_sampling,
            feature_repeats=self.feature_repeats,
        )

    def attention(self) -> AttentionConfig:
        return AttentionConfig(
            embed_dim=self.embedding_dim,
            num_heads=self.num_heads,
            softmax=self.attn_softmax,
            use_pallas=self.use_pallas,
        )


@dataclass(frozen=True)
class SaintConfig:
    """GraphSAINT random-walk sampler settings
    (reference: experiments/cora_benchmark_graphsaint.py:81-82)."""

    batch_size: int = 8         # number of walk roots
    walk_length: int = 150
    num_steps: int = 200        # iterations per epoch
    sample_coverage: int = 100  # normalization pre-pass coverage
    pad_nodes_to: Optional[int] = None
    pad_edges_to: Optional[int] = None


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer / loop settings (reference: cora_benchmark_graphsaint.py:84-92,
    cora_benchmark_full.py:50-58)."""

    learning_rate: float = 0.1
    weight_decay: float = 1e-4
    epochs: int = 50
    seed: int = 1
    grad_clip: Optional[float] = None
    # CosineAnnealingWarmRestarts, stepped per iteration
    # (cora_benchmark_graphsaint.py:85,116); None disables.
    cosine_t0: Optional[int] = 400
    cosine_t_mult: int = 2
    eta_min: float = 0.0
    checkpoint_every: int = 10   # epochs
    log_every: int = 1
    run_dir: Optional[str] = None
    # final-eval ensemble size over token-sampling draws (1 = reference
    # behavior: a single stochastic draw at eval, amp_gcn.py:135)
    num_eval_samples: int = 1
    # evaluate every K epochs and report final metrics from the
    # best-validation-accuracy params (standard model selection; the
    # reference only evaluates the last epoch). 0 disables.
    select_best_every: int = 0
    # SAINT loop: also log every K sampler steps in the reference's
    # per-iteration format with LR (cora_benchmark_graphsaint.py:130-131).
    # 0 = last step of each epoch only.
    log_every_steps: int = 0
    # SAINT subgraph loss: 'sum' = the reference's node_norm-weighted NLL
    # sum (cora_benchmark_graphsaint.py:105-106, gradients ~1e-5 scale —
    # L2 weight decay dominates and the model collapses, diagnosed r2);
    # 'mean' = weight-normalized O(1)-scale variant (stabilized recipe).
    saint_loss: str = "sum"
    # full-batch loop: fold K epochs into ONE jitted lax.scan dispatch
    # (train/state.py::make_scan_train_step) — identical math/PRNG
    # stream, per-epoch history preserved from the stacked metrics, but
    # the per-dispatch host overhead is paid once per K epochs. K is
    # clipped (gcd) to divide select_best_every / checkpoint_every so
    # eval & checkpoint cadences land on dispatch boundaries; 1 = the
    # reference's per-step eager behavior. Ignored when profiling.
    epochs_per_dispatch: int = 1
    # >0: capture a jax.profiler trace of this many optimizer steps
    # (skipping the compile step) into <run_dir>/profile — viewable in
    # TensorBoard/Perfetto. The reference has no profiler (SURVEY §5.1).
    profile_steps: int = 0


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
