"""Inference/serving wrapper.

A thin production surface over a trained model: one jitted forward per
padded graph shape (shape-bucketed executables), deterministic keyed token
sampling, optional fused Pallas convs, and params hot-swap for
checkpoint rollover.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ampnet_tpu.core.graph import Graph, from_arrays
from ampnet_tpu.train.checkpoint import load_checkpoint_params


class Predictor:
    """predict(graph) -> log-probs [N, C] (real nodes only).

    Executables are cached per padded (num_nodes, num_edges) bucket;
    feed graphs through `pad_bucket` to keep one compilation.
    """

    def __init__(
        self,
        model: nn.Module,
        params,
        seed: int = 0,
        bucket_nodes: int = 512,
        bucket_edges: int = 4096,
    ):
        self.model = model
        self.params = params
        self.key = jax.random.PRNGKey(seed)
        self.bucket_nodes = bucket_nodes
        self.bucket_edges = bucket_edges
        self._fns: Dict[Tuple[int, int], Any] = {}

    def load_params(self, checkpoint_path: str) -> None:
        """Hot-swap params from a checkpoint (rollover without recompiling)."""
        self.params = load_checkpoint_params(checkpoint_path, self.params)

    def _fn_for(self, shape: Tuple[int, int]):
        if shape not in self._fns:
            @jax.jit
            def fwd(params, graph: Graph, key):
                out = self.model.apply(
                    {"params": params}, graph, deterministic=True,
                    return_aux=False, rngs={"sample": key},
                )
                return out.logits

            self._fns[shape] = fwd
        return self._fns[shape]

    def _bucket(self, n: int, e: int) -> Tuple[int, int]:
        bn, be = self.bucket_nodes, self.bucket_edges
        return (-(-n // bn) * bn, -(-e // be) * be)

    def predict_graph(self, graph: Graph, key: Optional[jax.Array] = None) -> jnp.ndarray:
        if key is None:
            self.key, key = jax.random.split(self.key)
        shape = (graph.num_nodes_padded, graph.num_edges_padded)
        return self._fn_for(shape)(self.params, graph, key)

    def predict(
        self,
        x: np.ndarray,
        edge_index: np.ndarray,
        key: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """Raw-array entry: pads to the configured bucket, returns
        log-probs for the real nodes."""
        n = x.shape[0]
        pn, pe = self._bucket(n, edge_index.shape[1])
        g = from_arrays(x, edge_index, pad_nodes_to=pn, pad_edges_to=pe)
        logits = self.predict_graph(g, key)
        return np.asarray(logits[:n])
