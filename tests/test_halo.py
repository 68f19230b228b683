"""Boundary-only halo exchange (SURVEY §2.6 north star): the
all-to-all of just the needed sender rows must match the all-gather
path exactly — forward, gradients, fused-kernel, and hybrid head —
while moving O(cut), not O(N_tot), per chip.

Reference framing: SURVEY.md §2.6 graph-partitioning row ("all-to-all
halo/boundary node-feature exchange"), §7.4; the reference itself never
partitions (whole graph per device), so the oracle here is this
framework's own parity-tested all-gather path + the single-device model.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.core.graph import from_arrays
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.parallel import (
    build_halo_plan,
    make_mesh,
    make_partitioned_train_step,
    partition_graph,
    partition_layouts,
)
from ampnet_tpu.parallel.edge_partition import (
    HaloPlan,
    PartitionedGraph,
    amp_gcn_forward_local,
)
from ampnet_tpu.train import make_optimizer

try:
    from jax import shard_map as _sm
    shard_map = _sm.shard_map if hasattr(_sm, "shard_map") else _sm
except ImportError:
    from jax.experimental.shard_map import shard_map

from jax.sharding import PartitionSpec as P

CFG = AMPGCNConfig(
    embedding_dim=8, num_heads=2, num_node_features=24, num_sampled_vectors=6,
    output_dim=3, feat_emb_dim=7, val_emb_dim=1,
    dropout_rate=0.0, dropout_adj_rate=0.0,
)


def tiny_graph(rng, n=16, e=48, f=24):
    x = (rng.random((n, f)) < 0.3).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    y = rng.integers(0, 3, n)
    return from_arrays(
        x, ei, y=y, train_mask=np.ones(n, bool),
        node_norm=np.ones(n, np.float32),
        pad_nodes_to=16, pad_edges_to=128,
    )


def test_halo_plan_resolves_every_edge(rng):
    """senders_ext must address exactly the global row each edge names:
    local ids stay local; remote ids land in the offset block where the
    (src->dst) ppermute placed that row."""
    g = tiny_graph(rng)
    p_shards = 4
    pg = partition_graph(g, p_shards)
    plan = build_halo_plan(pg)
    n_loc = pg.x.shape[1]
    send_idx = np.asarray(plan.send_idx)
    bases = np.concatenate([[0], np.cumsum(plan.sizes)])
    for q in range(p_shards):
        em = np.asarray(pg.edge_mask[q])
        sg = np.asarray(pg.senders_global[q])
        se = np.asarray(plan.senders_ext[q])
        for e in np.nonzero(em)[0]:
            g_id = int(sg[e])
            owner = g_id // n_loc
            if owner == q:
                assert se[e] == g_id % n_loc
            else:
                slot = int(se[e]) - n_loc
                # find the offset block this slot belongs to
                bi = int(np.searchsorted(bases, slot, side="right")) - 1
                o = plan.offsets[bi]
                pos = slot - bases[bi]
                # the block at offset o came from shard (q - o) mod P
                assert (q - o) % p_shards == owner
                # the row owner queued at that slot IS this sender
                assert send_idx[owner, slot] == g_id % n_loc
                assert pos < int(plan.pair_counts[q, owner])


def test_halo_traffic_is_bounded_by_cut(rng):
    """pair_counts must equal the true per-pair boundary sizes (unique
    remote senders), i.e. the cut — not N_loc * anything."""
    g = tiny_graph(rng)
    pg = partition_graph(g, 4)
    plan = build_halo_plan(pg)
    n_loc = pg.x.shape[1]
    for q in range(4):
        em = np.asarray(pg.edge_mask[q])
        sg = np.asarray(pg.senders_global[q])[em]
        owners = sg // n_loc
        for p in range(4):
            expect = 0 if p == q else len(np.unique(sg[owners == p]))
            assert int(plan.pair_counts[q, p]) == expect


def _sharded_fwd(params, pg, plan, key, cfg, use_halo, layouts=None,
                 tile_nodes=2, mesh=None):
    pspec = PartitionedGraph(*(P("graph") for _ in range(9)))
    hspec = P("graph")  # tree-prefix over the HaloPlan array leaves
    in_specs = [P(), pspec, hspec, P()]
    if layouts is not None:
        in_specs.append(type(layouts)(*(P("graph") for _ in type(layouts)._fields)))
    n_graph = mesh.shape["graph"]

    def local_fwd(params, pg_in, plan_in, key, lay=None):
        shard = PartitionedGraph(*(leaf[0] for leaf in pg_in))
        my_key = jax.random.fold_in(key, jax.lax.axis_index("graph"))
        halo = ((plan_in.send_idx[0], plan_in.senders_ext[0], plan_in.meta,
                 n_graph) if use_halo else None)
        layout = None if lay is None else tuple(l[0] for l in lay)
        return amp_gcn_forward_local(
            params, shard, cfg, my_key, halo=halo,
            layout=layout, tile_nodes=tile_nodes, interpret=layout is not None,
        )[None]

    args = (params, pg, plan, key) + ((layouts,) if layouts is not None else ())
    with mesh:
        out = shard_map(
            local_fwd, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=P("graph"), check_vma=False,
        )(*args)
    return np.asarray(out)


@pytest.mark.parametrize("raw_residual", [False, "gcn2"])
def test_halo_forward_matches_allgather(rng, raw_residual):
    """XLA conv path: boundary-only exchange == full all-gather, exactly
    (same params, same per-shard sample keys), incl. the hybrid head's
    halo-exchanged GCN hops."""
    cfg = dataclasses.replace(CFG, raw_residual=raw_residual)
    g = tiny_graph(rng)
    model = AMPGCN(config=cfg)
    k = jax.random.PRNGKey(0)
    params = model.init(
        {"params": k, "sample": k, "dropout": k, "edges": k}, g,
        deterministic=True,
    )["params"]
    mesh = make_mesh(data=1, graph=4)
    pg = partition_graph(g, 4)
    plan = build_halo_plan(pg)
    key = jax.random.PRNGKey(42)
    out_ag = _sharded_fwd(params, pg, plan, key, cfg, use_halo=False, mesh=mesh)
    out_halo = _sharded_fwd(params, pg, plan, key, cfg, use_halo=True, mesh=mesh)
    np.testing.assert_allclose(out_halo, out_ag, rtol=1e-6, atol=1e-7)


def test_halo_fused_kernel_matches_xla(rng):
    """Fused Pallas kernel (interpret) over the halo-built layout ==
    the halo XLA path: the gather column correctly indexes the
    [N_loc + P*H) local+halo space, incl. the scatter-free backward's
    sender-tiled bucketing of the compact halo axis."""
    g = tiny_graph(rng)
    model = AMPGCN(config=CFG)
    k = jax.random.PRNGKey(0)
    params = model.init(
        {"params": k, "sample": k, "dropout": k, "edges": k}, g,
        deterministic=True,
    )["params"]
    mesh = make_mesh(data=1, graph=4)
    pg = partition_graph(g, 4)
    plan = build_halo_plan(pg)
    layouts = partition_layouts(pg, tile_nodes=2, edges_per_tile=128,
                                halo_plan=plan)
    key = jax.random.PRNGKey(42)
    out_xla = _sharded_fwd(params, pg, plan, key, CFG, use_halo=True, mesh=mesh)
    out_fused = _sharded_fwd(params, pg, plan, key, CFG, use_halo=True,
                             layouts=layouts, mesh=mesh)
    np.testing.assert_allclose(out_fused, out_xla, rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_halo_train_step_matches_allgather(rng, use_pallas):
    """One full training step (fwd + AD'd boundary-grad exchange + sgd):
    halo and all-gather paths must produce the same updated params —
    the reverse all_to_all + owner scatter-add is exactly the
    reduce-scatter the all-gather transpose produces. SGD (not adam)
    keeps param deltas proportional to grads: adam's g/sqrt(v)
    normalization amplifies float-reduction-order noise on near-zero
    grads into O(lr) sign flips, which would test the optimizer's
    conditioning, not the exchange."""
    import optax

    g = tiny_graph(rng)
    model = AMPGCN(config=CFG)
    k = jax.random.PRNGKey(0)
    params = model.init(
        {"params": k, "sample": k, "dropout": k, "edges": k}, g,
        deterministic=True,
    )["params"]
    mesh = make_mesh(data=1, graph=4)
    pg = partition_graph(g, 4)
    plan = build_halo_plan(pg)
    results = {}
    for use_halo in (False, True):
        tx = optax.sgd(1e-2)
        opt_state = tx.init(params)
        kw = dict(loss_mode="full", use_halo=use_halo)
        extra = ()
        if use_pallas:
            lp = plan if use_halo else None
            layouts = partition_layouts(pg, tile_nodes=2, edges_per_tile=128,
                                        halo_plan=lp)
            kw.update(use_pallas=True, tile_nodes=2, interpret=True)
            extra = (layouts,)
        if use_halo:
            extra = extra + (plan,)
        step = make_partitioned_train_step(CFG, mesh, tx, **kw)
        with mesh:
            params2, _, metrics = step(params, opt_state, pg,
                                       jax.random.PRNGKey(1), *extra)
        results[use_halo] = (params2, float(metrics["loss"]))
    assert np.isclose(results[True][1], results[False][1], rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6),
        results[True][0], results[False][0],
    )


def test_halo_remat_step_matches(rng):
    """remat=True (jax.checkpoint around each conv — the large-graph
    memory lever) must be a pure scheduling change: same updated params
    as the non-remat halo step."""
    import optax

    g = tiny_graph(rng)
    model = AMPGCN(config=CFG)
    k = jax.random.PRNGKey(0)
    params = model.init(
        {"params": k, "sample": k, "dropout": k, "edges": k}, g,
        deterministic=True,
    )["params"]
    mesh = make_mesh(data=1, graph=4)
    pg = partition_graph(g, 4)
    plan = build_halo_plan(pg)
    results = {}
    for remat in (False, True):
        tx = optax.sgd(1e-2)
        opt_state = tx.init(params)
        step = make_partitioned_train_step(CFG, mesh, tx, loss_mode="full",
                                           use_halo=True, remat=remat)
        with mesh:
            params2, _, metrics = step(params, opt_state, pg,
                                       jax.random.PRNGKey(1), plan)
        results[remat] = (params2, float(metrics["loss"]))
    assert np.isclose(results[True][1], results[False][1], rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8),
        results[True][0], results[False][0],
    )


def test_halo_dp_graph_step_runs(rng):
    """Combined data x graph mesh with halo exchange: one step, finite
    loss, params move."""
    from ampnet_tpu.parallel import common_halo_meta, stack_halos, stack_layouts
    from ampnet_tpu.parallel.edge_partition import (
        make_dp_partitioned_train_step,
        stack_partitioned,
    )

    g1, g2 = tiny_graph(rng), tiny_graph(rng)
    model = AMPGCN(config=CFG)
    k = jax.random.PRNGKey(0)
    params = model.init(
        {"params": k, "sample": k, "dropout": k, "edges": k}, g1,
        deterministic=True,
    )["params"]
    mesh = make_mesh(data=2, graph=4)
    pgs = [partition_graph(g, 4) for g in (g1, g2)]
    meta = common_halo_meta(pgs)
    plans = [build_halo_plan(pg, force_meta=meta) for pg in pgs]
    batch = stack_partitioned(pgs)
    plan = stack_halos(plans)
    layouts = stack_layouts([
        partition_layouts(pg, tile_nodes=2, edges_per_tile=128, halo_plan=pl)
        for pg, pl in zip(pgs, plans)
    ])
    tx = make_optimizer(1e-3)
    opt_state = tx.init(params)
    step = make_dp_partitioned_train_step(
        CFG, mesh, tx, loss_mode="saint", use_pallas=True, tile_nodes=2,
        interpret=True, use_halo=True,
    )
    with mesh:
        params2, _, metrics = step(params, opt_state, batch,
                                   jax.random.PRNGKey(1), layouts, plan)
    assert np.isfinite(float(metrics["loss"]))
    delta = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()), params, params2),
    )
    assert delta > 0
