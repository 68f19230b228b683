"""Shared driver helpers."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _enable_compile_cache():
    try:
        import jax

        cache_dir = os.environ.get(
            "AMPNET_JAX_CACHE", os.path.expanduser("~/.cache/jax_ampnet")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

from ampnet_tpu.core.graph import Graph, from_arrays
from ampnet_tpu.data.planetoid import PlanetoidData, load_cora


def cora_graph(pad_nodes_to=2752, pad_edges_to=10624) -> tuple[PlanetoidData, Graph]:
    """Full Cora as a padded Graph (2708 nodes / 10556 directed edges,
    reference load at experiments/cora_benchmark_graphsaint.py:30)."""
    d = load_cora()
    g = from_arrays(
        d.x, d.edge_index, y=d.y,
        train_mask=d.train_mask, val_mask=d.val_mask, test_mask=d.test_mask,
        node_norm=np.ones(d.num_nodes, np.float32),
        pad_nodes_to=pad_nodes_to, pad_edges_to=pad_edges_to,
    )
    return d, g
