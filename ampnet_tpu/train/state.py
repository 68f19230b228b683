"""Train state and step builders.

One jitted step per (model, loss) pair; the padded static-shape Graph
guarantees a single compilation across all GraphSAINT subgraphs.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax.training import train_state

from ampnet_tpu.core.graph import Graph
from ampnet_tpu.train.losses import (
    masked_accuracy,
    masked_mean_nll,
    saint_weighted_mean_nll,
    saint_weighted_nll,
)


class TrainState(train_state.TrainState):
    """Flax TrainState + the model PRNG key threaded through steps."""

    rng: jax.Array = None


def split_rngs(rng: jax.Array) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Advance the state key and derive per-collection keys
    ('sample' = token sampling, 'dropout', 'edges' = adjacency dropout)."""
    rng, k1, k2, k3 = jax.random.split(rng, 4)
    return rng, {"sample": k1, "dropout": k2, "edges": k3}


def create_train_state(
    model: nn.Module,
    graph: Graph,
    tx: optax.GradientTransformation,
    seed: int = 0,
) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    init_rng, state_rng = jax.random.split(rng)
    rngs = {"params": init_rng, "sample": init_rng, "dropout": init_rng, "edges": init_rng}
    variables = model.init(rngs, graph, deterministic=True, return_aux=False)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx, rng=state_rng
    )


def _train_step_body(
    model: nn.Module,
    loss_mode: str = "full",
) -> Callable[[TrainState, Graph, Any], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """The un-jitted step body shared by make_train_step (one jitted call
    per step) and make_scan_train_step (k steps per dispatch via
    lax.scan)."""

    def loss_from_output(out_logits, graph: Graph):
        tm = graph.train_mask & graph.node_mask
        if loss_mode == "saint":
            return saint_weighted_nll(out_logits, graph.y, graph.node_norm, tm)
        if loss_mode == "saint_mean":
            return saint_weighted_mean_nll(out_logits, graph.y, graph.node_norm, tm)
        return masked_mean_nll(out_logits, graph.y, tm)

    def step(state: TrainState, graph: Graph, layout=None):
        new_rng, rngs = split_rngs(state.rng)

        # edge_layout only exists on layout-aware models (AMPGCN); baseline
        # models (GCN etc.) keep their signature
        extra = {} if layout is None else {"edge_layout": layout}

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                graph,
                deterministic=False,
                return_aux=False,
                rngs=rngs,
                **extra,
            )
            return loss_from_output(out.logits, graph), out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, rng=new_rng)
        metrics = {
            "loss": loss,
            "train_acc": masked_accuracy(out.logits, graph.y, graph.train_mask & graph.node_mask),
        }
        if graph.test_mask is not None:
            metrics["test_acc"] = masked_accuracy(
                out.logits, graph.y, graph.test_mask & graph.node_mask
            )
        return new_state, metrics

    return step


def make_train_step(
    model: nn.Module,
    loss_mode: str = "full",  # 'full' | 'saint'
) -> Callable[[TrainState, Graph], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build a jitted training step.

    loss_mode='full':       masked mean NLL (cora_benchmark_full.py:64)
    loss_mode='saint':      node_norm-weighted NLL sum
                            (cora_benchmark_graphsaint.py:105-106)
    loss_mode='saint_mean': node_norm-weighted NLL mean — the stabilized
                            recipe's O(1)-scale variant (see
                            losses.saint_weighted_mean_nll)
    """
    return functools.partial(jax.jit, donate_argnums=(0,))(
        _train_step_body(model, loss_mode)
    )


def make_scan_train_step(
    model: nn.Module,
    loss_mode: str = "full",
    num_steps: int = 8,
) -> Callable[[TrainState, Graph], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """k optimizer steps in ONE device dispatch via lax.scan.

    Bitwise-identical to k calls of make_train_step's step on the same
    (static) graph — the carried PRNG advances through the same
    split_rngs stream — but with the per-dispatch host overhead
    (r5 step decomposition: ~3.8 ms/step through this environment's
    relay) paid once per k steps. Metric leaves come back stacked
    [num_steps, ...], one row per epoch, so the host loop's per-epoch
    history is preserved exactly. The reference has no analogue (its
    torch loop is eager per-step)."""
    body = _train_step_body(model, loss_mode)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state: TrainState, graph: Graph, layout=None):
        def f(st, _):
            return body(st, graph, layout)

        return jax.lax.scan(f, state, None, length=num_steps)

    return multi


def make_eval_step(
    model: nn.Module,
    num_eval_samples: int = 1,
) -> Callable[[Any, Graph, jax.Array], Dict[str, jnp.ndarray]]:
    """Deterministic forward (dropouts off; token sampling still keyed —
    the reference samples at eval too, amp_gcn.py:135).

    num_eval_samples > 1 averages log-probs over independent token-sample
    draws — an ensemble eval that removes the reference's single-draw
    eval variance (a framework improvement, not a parity change)."""

    @jax.jit
    def step(params, graph: Graph, rng: jax.Array, layout=None):
        extra = {} if layout is None else {"edge_layout": layout}

        def one(key):
            return model.apply(
                {"params": params},
                graph,
                deterministic=True,
                return_aux=False,
                rngs={"sample": key},
                **extra,
            ).logits

        if num_eval_samples > 1:
            keys = jax.random.split(rng, num_eval_samples)
            logits = jnp.mean(jax.lax.map(one, keys), axis=0)
        else:
            logits = one(rng)
        metrics = {}
        for name, mask in [
            ("train", graph.train_mask),
            ("val", graph.val_mask),
            ("test", graph.test_mask),
        ]:
            if mask is not None:
                metrics[f"{name}_acc"] = masked_accuracy(
                    logits, graph.y, mask & graph.node_mask
                )
                metrics[f"{name}_loss"] = masked_mean_nll(logits, graph.y, mask & graph.node_mask)
        return metrics

    return step
