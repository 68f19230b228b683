from ampnet_tpu.core.graph import (
    Graph,
    from_arrays,
    pad_graph,
    build_csr,
    sort_edges_by_receiver,
    add_self_loops,
)
from ampnet_tpu.core.config import (
    AMPGCNConfig,
    AttentionConfig,
    TokenizerConfig,
    SaintConfig,
    TrainConfig,
)

__all__ = [
    "Graph",
    "from_arrays",
    "pad_graph",
    "build_csr",
    "sort_edges_by_receiver",
    "add_self_loops",
    "AMPGCNConfig",
    "AttentionConfig",
    "TokenizerConfig",
    "SaintConfig",
    "TrainConfig",
]
