from ampnet_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_count,
    segment_softmax,
)
from ampnet_tpu.ops.edge_attention import (
    MHAParams,
    multihead_attention,
    attention_core,
    amp_edge_attention,
)
from ampnet_tpu.ops.gcn import gcn_norm, gcn_aggregate

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_count",
    "segment_softmax",
    "MHAParams",
    "multihead_attention",
    "attention_core",
    "amp_edge_attention",
    "gcn_norm",
    "gcn_aggregate",
]
