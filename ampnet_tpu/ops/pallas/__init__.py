from ampnet_tpu.ops.pallas.format import TiledCSR, build_tiled_csr
from ampnet_tpu.ops.pallas.edge_attention_fused import (
    pallas_available,
    make_pallas_edge_attention,
    amp_edge_attention_pallas_core,
)

__all__ = [
    "TiledCSR",
    "build_tiled_csr",
    "pallas_available",
    "make_pallas_edge_attention",
    "amp_edge_attention_pallas_core",
]
