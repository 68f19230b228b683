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
from ampnet_tpu.parallel.head_parallel import (
    shard_mha_params,
    head_sharded_amp_edge_attention,
    head_sharded_apply,
    tp_shard_params,
    tp_unshard_params,
    amp_gcn_forward_heads,
    make_tp_train_step,
    make_dp_tp_train_step,
)
from ampnet_tpu.parallel.edge_partition import (
    PartitionedGraph,
    ShardLayout,
    partition_graph,
    partition_layouts,
    amp_gcn_forward_local,
    make_partitioned_train_step,
    make_dp_partitioned_train_step,
    stack_partitioned,
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
    "ShardLayout",
    "partition_layouts",
    "make_dp_partitioned_train_step",
    "stack_partitioned",
    "partition_graph",
    "amp_gcn_forward_local",
    "make_partitioned_train_step",
    "shard_mha_params",
    "head_sharded_amp_edge_attention",
    "head_sharded_apply",
    "tp_shard_params",
    "tp_unshard_params",
    "amp_gcn_forward_heads",
    "make_tp_train_step",
    "make_dp_tp_train_step",
]
