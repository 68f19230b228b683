from ampnet_tpu.data.synthetic import (
    create_xor_data,
    create_duplicated_xor_data,
    random_partition_graph,
    rpg_rgb_features,
    make_rpg_graph,
    get_xor_graphs,
    get_duplicated_xor_graphs,
)
from ampnet_tpu.data.graphsaint import GraphSaintRandomWalkSampler, random_walk
from ampnet_tpu.data.planetoid import (
    PlanetoidData,
    load_cora,
    load_planetoid_raw,
    synthetic_cora,
)

__all__ = [
    "create_xor_data",
    "create_duplicated_xor_data",
    "random_partition_graph",
    "rpg_rgb_features",
    "make_rpg_graph",
    "get_xor_graphs",
    "get_duplicated_xor_graphs",
    "GraphSaintRandomWalkSampler",
    "random_walk",
    "PlanetoidData",
    "load_cora",
    "load_planetoid_raw",
    "synthetic_cora",
]
