"""ampnet_tpu — a TPU-native GNN message-passing framework.

Re-creates the capabilities of the AMPNet reference (per-edge multi-head
cross-attention between node feature tokens; reference:
src/ampnet/conv/amp_conv.py, src/ampnet/module/amp_gcn.py) as an idiomatic
JAX/XLA/Pallas framework: static-shape padded graphs, functional PRNG,
segment-op aggregation, fused Pallas edge-attention kernels, and
mesh-sharded (data-parallel + edge-partitioned) training.
"""

from ampnet_tpu.core.graph import Graph, pad_graph, build_csr, sort_edges_by_receiver
from ampnet_tpu.core.config import (
    AMPGCNConfig,
    AttentionConfig,
    TrainConfig,
    SaintConfig,
    TokenizerConfig,
)
from ampnet_tpu.models.amp_gcn import AMPGCN
from ampnet_tpu.models.layers import AMPConv, GCNConv
from ampnet_tpu.models.classifiers import (
    AMPNetClassifier,
    GCN,
    GCNOneLayer,
    LinearLayer,
    TwoLayerSigmoid,
)
from ampnet_tpu.serving import Predictor

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "pad_graph",
    "build_csr",
    "sort_edges_by_receiver",
    "AMPGCN",
    "AMPConv",
    "GCNConv",
    "AMPNetClassifier",
    "GCN",
    "GCNOneLayer",
    "LinearLayer",
    "TwoLayerSigmoid",
    "AMPGCNConfig",
    "AttentionConfig",
    "TrainConfig",
    "SaintConfig",
    "TokenizerConfig",
    "Predictor",
]
