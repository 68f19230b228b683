from ampnet_tpu.parallel.mesh import (
    make_mesh,
    auto_mesh_shape,
    initialize_distributed,
    replicated,
    data_sharded,
)
from ampnet_tpu.parallel.data_parallel import (
    stack_graphs,
    shard_batch,
    make_dp_train_step,
)
from ampnet_tpu.parallel.edge_partition import (
    PartitionedGraph,
    partition_graph,
    amp_gcn_forward_local,
    make_partitioned_train_step,
)

__all__ = [
    "make_mesh",
    "auto_mesh_shape",
    "initialize_distributed",
    "replicated",
    "data_sharded",
    "stack_graphs",
    "shard_batch",
    "make_dp_train_step",
    "PartitionedGraph",
    "partition_graph",
    "amp_gcn_forward_local",
    "make_partitioned_train_step",
]
