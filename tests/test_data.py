"""Data layer: graph containers, synthetic generators, GraphSAINT sampler,
Cora loader."""
import numpy as np
import pytest

from ampnet_tpu.core.graph import build_csr, from_arrays, sort_edges_by_receiver
from ampnet_tpu.data.graphsaint import GraphSaintRandomWalkSampler, random_walk
from ampnet_tpu.data.planetoid import load_cora, synthetic_cora
from ampnet_tpu.data.synthetic import (
    create_duplicated_xor_data,
    create_xor_data,
    get_xor_graphs,
    make_rpg_graph,
    random_partition_graph,
    rpg_rgb_features,
)


def test_from_arrays_padding(rng):
    x = rng.normal(size=(10, 4)).astype(np.float32)
    ei = np.stack([rng.integers(0, 10, 23), rng.integers(0, 10, 23)])
    g = from_arrays(x, ei, y=np.arange(10), pad_nodes_to=16, pad_edges_to=128)
    assert g.x.shape == (16, 4)
    assert g.senders.shape == (128,)
    assert int(g.num_nodes) == 10 and int(g.num_edges) == 23
    assert not bool(g.node_mask[10])
    assert bool(g.edge_mask[22]) and not bool(g.edge_mask[23])


def test_sort_edges_by_receiver(rng):
    x = rng.normal(size=(6, 2)).astype(np.float32)
    ei = np.stack([rng.integers(0, 6, 11), rng.integers(0, 6, 11)])
    g = from_arrays(x, ei, pad_edges_to=16)
    gs, perm = sort_edges_by_receiver(g)
    recv = np.asarray(gs.receivers)[np.asarray(gs.edge_mask)]
    assert np.all(np.diff(recv) >= 0)
    assert int(gs.num_edges) == 11


def test_build_csr_roundtrip():
    ei = np.array([[0, 0, 1, 2, 2, 2], [1, 2, 0, 0, 1, 2]])
    indptr, indices = build_csr(ei, 3)
    np.testing.assert_array_equal(indptr, [0, 2, 3, 6])
    assert set(indices[0:2].tolist()) == {1, 2}
    assert set(indices[3:6].tolist()) == {0, 1, 2}


def test_xor_generator_balanced(rng):
    x, y, adj, ei = create_xor_data(100, noise_std=0.1, rng=rng)
    assert x.shape == (100, 2) and y.shape == (100,)
    assert np.diag(adj).sum() == 0  # no self loops
    assert (y == 0).sum() == 50
    # features cluster near the 4 XOR corners
    assert np.abs(x - np.round(np.clip(x, 0, 1))).max() < 1.0


def test_duplicated_xor_knn(rng):
    x, y, adj, ei = create_duplicated_xor_data(40, 0.1, num_nearest_neighbors=5, feature_repeats=3, rng=rng)
    assert x.shape == (40, 6)
    assert np.all(np.diag(adj) == 1)  # kNN includes self (reference :75)
    assert np.all(adj.sum(axis=1) >= 6)


def test_rpg_generator(rng):
    adj, labels = random_partition_graph(3, 10, 0.8, 0.05, rng=rng)
    assert adj.shape == (30, 30)
    assert np.array_equal(adj, adj.T)
    same = labels[:, None] == labels[None, :]
    intra = adj[same].mean()
    inter = adj[~same].mean()
    assert intra > inter
    feats = rpg_rgb_features(adj, 3, 10)
    assert feats.shape == (30, 3)
    g = make_rpg_graph(rng=rng)
    assert g.x.shape[1] == 3


def test_random_walk_stays_on_graph():
    # path graph 0-1-2-3 (directed both ways) + isolated node 4
    ei = np.array([[0, 1, 1, 2, 2, 3], [1, 0, 2, 1, 3, 2]])
    indptr, indices = build_csr(ei, 5)
    walks = random_walk(indptr, indices, np.array([0, 4]), 10, np.random.default_rng(0))
    assert walks.shape == (2, 11)
    assert set(walks[0]) <= {0, 1, 2, 3}
    assert set(walks[1]) == {4}  # isolated node stays put


def make_base_graph(rng, n=60, e=240):
    x = (rng.random((n, 8)) < 0.5).astype(np.float32)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    ei = np.unique(np.stack([src, dst]), axis=1)
    y = rng.integers(0, 3, n)
    return x, ei, y


def test_graphsaint_sampler(rng):
    x, ei, y = make_base_graph(rng)
    s = GraphSaintRandomWalkSampler(
        x, ei, y=y, train_mask=np.ones(len(x), bool),
        batch_size=3, walk_length=8, num_steps=4, sample_coverage=5, seed=0,
    )
    subs = list(s)
    assert len(subs) == 4
    g = subs[0]
    n_real = int(g.num_nodes)
    assert 0 < n_real <= g.num_nodes_padded
    # all real edges reference real nodes
    em = np.asarray(g.edge_mask)
    assert np.asarray(g.senders)[em].max() < n_real
    assert np.asarray(g.receivers)[em].max() < n_real
    # norms attached and positive on real nodes
    assert np.all(np.asarray(g.node_norm)[np.asarray(g.node_mask)] > 0)
    # same padded shapes across samples (static shapes for XLA)
    assert all(si.x.shape == g.x.shape for si in subs)
    assert all(si.senders.shape == g.senders.shape for si in subs)


def test_graphsaint_subgraph_is_induced(rng):
    x, ei, y = make_base_graph(rng)
    s = GraphSaintRandomWalkSampler(x, ei, y=y, batch_size=3, walk_length=8,
                                    num_steps=2, sample_coverage=0, seed=1)
    nodes, eids = s._subgraph(np.random.default_rng(3))
    node_set = set(nodes.tolist())
    # every original edge with both endpoints in the set must be included
    cnt = 0
    for k in range(ei.shape[1]):
        if ei[0, k] in node_set and ei[1, k] in node_set:
            cnt += 1
    assert cnt == len(eids)


def test_graphsaint_determinism(rng):
    x, ei, y = make_base_graph(rng)
    a = GraphSaintRandomWalkSampler(x, ei, y=y, batch_size=2, walk_length=5,
                                    num_steps=3, sample_coverage=0, seed=7)
    b = GraphSaintRandomWalkSampler(x, ei, y=y, batch_size=2, walk_length=5,
                                    num_steps=3, sample_coverage=0, seed=7)
    for ga, gb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ga.senders), np.asarray(gb.senders))
        np.testing.assert_array_equal(np.asarray(ga.x), np.asarray(gb.x))


def test_synthetic_cora_shape():
    d = synthetic_cora(seed=0)
    assert d.x.shape == (2708, 1433)
    assert d.edge_index.shape[0] == 2
    assert d.edge_index.shape[1] == 10556
    assert d.num_classes == 7
    assert d.train_mask.sum() == 140
    assert d.val_mask.sum() == 500
    assert d.test_mask.sum() == 1000
    # every node has at least one word
    assert (d.x.sum(1) > 0).all()
    # homophily: most edges intra-class
    same = (d.y[d.edge_index[0]] == d.y[d.edge_index[1]]).mean()
    assert same > 0.7
    # deterministic
    d2 = synthetic_cora(seed=0)
    np.testing.assert_array_equal(d.x, d2.x)
    np.testing.assert_array_equal(d.edge_index, d2.edge_index)


def test_load_cora_falls_back():
    d = load_cora()
    assert d.x.shape == (2708, 1433)


def test_pad_graph_regrows(rng):
    from ampnet_tpu.core.graph import pad_graph

    x = rng.normal(size=(6, 3)).astype(np.float32)
    ei = np.stack([rng.integers(0, 6, 10), rng.integers(0, 6, 10)])
    g = from_arrays(x, ei, y=np.arange(6), train_mask=np.ones(6, bool),
                    node_norm=np.ones(6, np.float32),
                    pad_nodes_to=8, pad_edges_to=128)
    g2 = pad_graph(g, 16, 256)
    assert g2.x.shape == (16, 3)
    assert g2.senders.shape == (256,)
    assert int(g2.num_nodes) == 6 and int(g2.num_edges) == 10
    np.testing.assert_array_equal(np.asarray(g2.x[:8]), np.asarray(g.x))
    assert not bool(g2.node_mask[8])
