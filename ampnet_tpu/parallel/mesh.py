"""Device mesh setup.

Replaces the reference's torch.distributed/gloo process-group bootstrap
(experiments/cora_benchmark_graphsaint_distributed.py:25-28) with JAX SPMD:
one process per host, `jax.distributed.initialize` for multi-host, and a
named `Mesh` whose axes carry the parallelism strategies:

  * 'data'  — data parallelism over GraphSAINT subgraph streams
              (the corrected version of the reference's DDP intent);
  * 'graph' — edge/node partitioning of a single large graph with
              halo exchange (the GNN analogue of TP/SP — SURVEY §2.6).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap; no-op in single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    data: int = 1,
    graph: int = 1,
    heads: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'graph'[, 'heads']) mesh over the available devices.

    'heads' carries tensor parallelism over attention heads
    (parallel/head_parallel.py); it is only materialized as a mesh axis
    when heads > 1 so existing 2-axis users are unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    need = data * graph * heads
    if need > len(devices):
        raise ValueError(
            f"mesh {data}x{graph}x{heads} needs {need} devices, have {len(devices)}"
        )
    if heads > 1:
        dev_array = np.array(devices[:need]).reshape(data, graph, heads)
        return Mesh(dev_array, axis_names=("data", "graph", "heads"))
    dev_array = np.array(devices[:need]).reshape(data, graph)
    return Mesh(dev_array, axis_names=("data", "graph"))


def auto_mesh_shape(n_devices: int) -> Tuple[int, int]:
    """Split n devices into (data, graph): prefer an even split so both
    strategies are exercised; fall back to all-graph."""
    if n_devices % 2 == 0 and n_devices >= 4:
        return 2, n_devices // 2
    return 1, n_devices


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))
