"""Worker process for the 2-process jax.distributed test.

Run as: python tests/_mp_worker.py <rank> <port> <outdir> [mode]

mode 'dp' (default): data-parallel step, cross-process gradient psum.
mode 'partitioned': edge-partitioned step over the 'graph' axis — the
halo-exchange all-gather and boundary-gradient reduce-scatter cross the
REAL process boundary.

Each process owns ONE CPU device (XLA_FLAGS set by the parent), joins the
localhost coordinator through parallel.mesh.initialize_distributed (the
multi-host bootstrap that replaces the reference's gloo rendezvous,
experiments/cora_benchmark_graphsaint_distributed.py:25-28), and runs one
data-parallel train step on a per-rank GraphSAINT-style subgraph. Rank 0
saves the updated params so the parent can compare them against the
single-process 2-virtual-device result.
"""
import os
import sys


def main() -> int:
    rank, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "dp"

    import jax

    # this environment's sitecustomize registers a TPU PJRT plugin and sets
    # jax_platforms programmatically; force CPU before any backend init
    # (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from ampnet_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=rank
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.devices()
    assert jax.local_device_count() == 1

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.parallel import make_dp_train_step, stack_graphs
    from ampnet_tpu.train import create_train_state, make_optimizer
    from tests.test_multiprocess import CFG, mp_graph

    if mode == "partitioned":
        return run_partitioned(rank, outdir)

    mesh = make_mesh(data=2)
    graphs = [mp_graph(seed=100 + r) for r in range(2)]  # deterministic

    model = AMPGCN(config=CFG)
    state = create_train_state(model, graphs[0], tx=make_optimizer(1e-3), seed=0)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    # global batch: leading axis 2 over 'data'; this process supplies
    # only ITS shard
    local = stack_graphs([graphs[rank]])
    data_sh = NamedSharding(mesh, P("data"))
    batch = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(data_sh, np.asarray(a)),
        local,
    )

    step = make_dp_train_step(model, mesh, loss_mode="saint")
    state2, metrics = step(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    if rank == 0:
        flat, _ = jax.tree_util.tree_flatten_with_path(state2.params)
        np.savez(
            os.path.join(outdir, "mp_result.npz"),
            loss=loss,
            **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat},
        )
    print(f"OK rank {rank} loss {loss:.6f}")
    return 0


def run_partitioned(rank: int, outdir: str) -> int:
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.parallel import make_mesh, make_partitioned_train_step, partition_graph
    from ampnet_tpu.parallel.edge_partition import PartitionedGraph
    from ampnet_tpu.train import create_train_state, make_optimizer
    from tests.test_multiprocess import CFG, mp_graph

    mesh = make_mesh(data=1, graph=2)
    g = mp_graph(seed=123)
    model = AMPGCN(config=CFG)
    tx = make_optimizer(1e-3)
    state = create_train_state(model, g, tx, seed=0)
    params = jax.device_put(state.params, NamedSharding(mesh, P()))
    opt_state = jax.device_put(tx.init(state.params), NamedSharding(mesh, P()))

    pg = partition_graph(g, 2)
    gsh = NamedSharding(mesh, P("graph"))
    # each process supplies only ITS node-block shard
    pg_global = PartitionedGraph(*(
        jax.make_array_from_process_local_data(
            gsh, np.asarray(l)[rank:rank + 1])
        for l in pg
    ))

    step = make_partitioned_train_step(CFG, mesh, tx, loss_mode="full")
    params2, _, metrics = step(params, opt_state, pg_global, jax.random.PRNGKey(3))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    if rank == 0:
        flat, _ = jax.tree_util.tree_flatten_with_path(params2)
        np.savez(
            os.path.join(outdir, "mp_partitioned_result.npz"),
            loss=loss,
            **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat},
        )
    print(f"OK rank {rank} loss {loss:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
