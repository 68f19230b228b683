"""Training steps backed by the fused Pallas edge-attention kernel.

The tiled-CSR edge layout is DATA: computed per (sub)graph on host with a
fixed per-tile edge budget, then fed to one compiled executable — so
GraphSAINT training hits a single compilation while both convs run fused.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ampnet_tpu.core.graph import Graph
from ampnet_tpu.models.amp_gcn import AMPGCN
from ampnet_tpu.ops.pallas.edge_attention_fused import amp_edge_attention_pallas
from ampnet_tpu.ops.pallas.format import build_tiled_csr, DEFAULT_TILE_NODES
from ampnet_tpu.train.losses import masked_accuracy, masked_mean_nll, saint_weighted_nll
from ampnet_tpu.train.state import TrainState, split_rngs


# Layout types/builders live with the kernel format (ops/pallas/format.py);
# re-exported here for the original round-1 API surface.
from ampnet_tpu.ops.pallas.format import (  # noqa: F401
    EdgeLayout,
    compute_layout,
    default_edge_budget,
)


def make_fused_fns(model: AMPGCN, graph: Graph, layout: EdgeLayout,
                   tile_nodes: int | None = None, gather: str = "auto",
                   fused_bwd: bool = True, interpret: bool = False):
    cfg = model.config
    # tile_nodes is layout geometry: the kernel grid must match what the
    # layout arrays were built with, so derive it from the layout (as
    # AMPConv does) unless the caller overrides explicitly.
    if tile_nodes is None:
        tile_nodes = getattr(layout, "tile_nodes", DEFAULT_TILE_NODES)
    if cfg.embedding_dim % 128 and not interpret:
        # Mosaic needs 128-lane-aligned K|V slices (offsets at multiples
        # of D); D=100 (the reference's default emb) fails at compile on
        # real TPUs — fail loudly here instead of deep in the compiler
        raise ValueError(
            f"use_pallas requires embedding_dim % 128 == 0 on TPU "
            f"(got {cfg.embedding_dim}); use 128/256/... or interpret mode"
        )

    def fused(x, params):
        return amp_edge_attention_pallas(
            x, params, graph.senders, graph.receivers, graph.edge_mask,
            layout.tile_senders, layout.tile_recv, layout.tile_valid,
            num_heads=cfg.num_heads, softmax=cfg.attn_softmax,
            tile_nodes=tile_nodes, gather=gather,
            fused_bwd=fused_bwd, interpret=interpret,
            tile_counts=getattr(layout, "tile_counts", None),
            snd_receivers=getattr(layout, "snd_receivers", None),
            snd_local=getattr(layout, "snd_local", None),
            snd_valid=getattr(layout, "snd_valid", None),
            snd_counts=getattr(layout, "snd_counts", None),
            snd_edge_slot=getattr(layout, "snd_edge_slot", None),
        )

    return (fused, fused)


def make_pallas_train_step(model: AMPGCN, loss_mode: str = "saint",
                           tile_nodes: int | None = None, gather: str = "auto",
                           fused_bwd: bool = True, interpret: bool = False):
    """Jitted step(state, graph, layout) with fused convs."""

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, graph: Graph, layout: EdgeLayout):
        new_rng, rngs = split_rngs(state.rng)

        def loss_fn(params):
            fns = make_fused_fns(model, graph, layout, tile_nodes, gather,
                                 fused_bwd=fused_bwd, interpret=interpret)
            out = model.apply(
                {"params": params}, graph, deterministic=False,
                return_aux=False, rngs=rngs, fused_fns=fns,
            )
            tm = graph.train_mask & graph.node_mask
            if loss_mode == "saint":
                loss = saint_weighted_nll(out.logits, graph.y, graph.node_norm, tm)
            elif loss_mode == "saint_mean":
                from ampnet_tpu.train.losses import saint_weighted_mean_nll

                loss = saint_weighted_mean_nll(out.logits, graph.y, graph.node_norm, tm)
            elif loss_mode == "full":
                loss = masked_mean_nll(out.logits, graph.y, tm)
            else:
                raise ValueError(f"unknown loss_mode {loss_mode!r}")
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, rng=new_rng)
        return new_state, {
            "loss": loss,
            "train_acc": masked_accuracy(out.logits, graph.y, graph.train_mask & graph.node_mask),
        }

    return step
