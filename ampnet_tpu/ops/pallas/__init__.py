from ampnet_tpu.ops.pallas.format import TiledCSR, build_tiled_csr
from ampnet_tpu.ops.pallas.edge_attention_fused import (
    pallas_available,
    make_pallas_edge_attention,
    amp_edge_attention_pallas,
    amp_edge_attention_pallas_core,
)
from ampnet_tpu.ops.pallas.edge_attention_bwd import fused_edge_bwd

__all__ = [
    "TiledCSR",
    "build_tiled_csr",
    "pallas_available",
    "make_pallas_edge_attention",
    "amp_edge_attention_pallas",
    "amp_edge_attention_pallas_core",
    "fused_edge_bwd",
]
