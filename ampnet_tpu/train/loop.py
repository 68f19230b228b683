"""Training loops: full-batch and GraphSAINT-subgraph.

Mirrors the reference drivers' protocols:
  * full-batch: experiments/cora_benchmark_full.py (masked mean NLL, final
    full-graph test accuracy :97-102);
  * GraphSAINT: experiments/cora_benchmark_graphsaint.py (node_norm-weighted
    NLL sum :105-106, cosine-warm-restart LR stepped per iteration :116,
    periodic checkpoints :138-143, final full-graph accuracy :159-164).
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import linen as nn

from ampnet_tpu.core.config import TrainConfig
from ampnet_tpu.core.graph import Graph
from ampnet_tpu.data.graphsaint import GraphSaintRandomWalkSampler
from ampnet_tpu.train.checkpoint import (
    restore_best,
    resume_or_create,
    save_checkpoint,
)
from ampnet_tpu.train.optim import make_optimizer
from ampnet_tpu.train.rundir import Logfile
from ampnet_tpu.train.state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_scan_train_step,
    make_train_step,
)


def _opt(cfg: TrainConfig):
    return make_optimizer(
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        cosine_t0=cfg.cosine_t0,
        cosine_t_mult=cfg.cosine_t_mult,
        eta_min=cfg.eta_min,
        grad_clip=cfg.grad_clip,
    )


def _lr_at(cfg: TrainConfig, step: int) -> float:
    """Current LR for logging (reference prints it per iteration,
    cora_benchmark_graphsaint.py:130-131)."""
    from ampnet_tpu.train.optim import cosine_warm_restarts

    if cfg.cosine_t0:
        sched = cosine_warm_restarts(
            cfg.learning_rate, cfg.cosine_t0, cfg.cosine_t_mult, cfg.eta_min
        )
        return float(sched(step))
    return cfg.learning_rate


def _tracer(cfg: TrainConfig, log: Logfile):
    """cfg.profile_steps > 0: bounded jax.profiler capture under run_dir."""
    if not (cfg.profile_steps and cfg.run_dir):
        return None
    from ampnet_tpu.train.profiling import StepTraceCapture

    pdir = os.path.join(cfg.run_dir, "profile")
    log.log(f"profiling {cfg.profile_steps} steps (post-compile) -> {pdir}")
    return StepTraceCapture(pdir, cfg.profile_steps)


def _use_pallas(model: nn.Module) -> bool:
    return bool(getattr(getattr(model, "config", None), "use_pallas", False))


def _layout_for(graph: Graph, edges_per_tile: int = 0):
    from ampnet_tpu.ops.pallas.format import compute_layout

    return compute_layout(graph, edges_per_tile=edges_per_tile)


def _saint_layout_budget(sampler: GraphSaintRandomWalkSampler,
                         tile_nodes: int = None) -> int:
    from ampnet_tpu.ops.pallas.format import DEFAULT_TILE_NODES, default_edge_budget

    tile_nodes = tile_nodes or DEFAULT_TILE_NODES
    num_tiles = -(-sampler.pad_nodes_to // tile_nodes)
    return default_edge_budget(sampler.pad_edges_to, num_tiles)


def train_full_batch(
    model: nn.Module,
    graph: Graph,
    cfg: TrainConfig,
    eval_graph: Optional[Graph] = None,
    log: Optional[Logfile] = None,
    state: Optional[TrainState] = None,
) -> Dict[str, Any]:
    """Whole-graph training (cora_benchmark_full.py pattern).

    Returns {'state', 'history', 'final_metrics'}.
    """
    log = log or Logfile()
    tx = _opt(cfg)
    start_epoch = 0
    if state is None:
        state = create_train_state(model, graph, tx, seed=cfg.seed)
        state, start_epoch = resume_or_create(cfg.run_dir, state)
        if start_epoch:
            log.log(f"resumed from epoch {start_epoch - 1}")
    train_step = make_train_step(model, loss_mode="full")
    eval_step = make_eval_step(model, num_eval_samples=cfg.num_eval_samples)
    eval_graph = eval_graph if eval_graph is not None else graph

    # cfg.use_pallas honored automatically: layouts are host-built once per
    # (static) graph and passed as data (VERDICT r1 item 4)
    layout = eval_layout = None
    if _use_pallas(model):
        layout = _layout_for(graph)
        eval_layout = layout if eval_graph is graph else _layout_for(eval_graph)

    history: List[Dict[str, float]] = []
    best_val, best_params = -1.0, None
    if cfg.run_dir and start_epoch:
        best_val, best_params = restore_best(cfg.run_dir, state.params)
        if best_params is not None:
            log.log(f"restored banked best (val acc {best_val:.4f})")
    tracer = _tracer(cfg, log)

    # cfg.epochs_per_dispatch > 1: scan k epochs per device dispatch
    # (make_scan_train_step — same math/PRNG stream, per-epoch rows from
    # the stacked metrics). k is clipped via gcd to divide the eval /
    # checkpoint cadences so those actions still land exactly on their
    # epochs; the tail (epochs % k) runs through the per-step path.
    # Per-step profiling keeps k=1 (a scan body has no step boundaries).
    k = max(1, int(getattr(cfg, "epochs_per_dispatch", 1)))
    if tracer is not None:
        k = 1
    if k > 1:
        import math as _math

        for cadence in (cfg.select_best_every,
                        cfg.checkpoint_every if cfg.run_dir else 0):
            if cadence:
                k = _math.gcd(k, cadence)
    scan_step = (make_scan_train_step(model, loss_mode="full", num_steps=k)
                 if k > 1 else None)

    t0 = time.time()
    epoch = start_epoch
    while epoch < cfg.epochs:
        # chunks must start k-aligned or a cadence boundary could fall
        # mid-scan (resume points land on checkpoint boundaries, which k
        # divides, so misalignment only arises from hand-built states —
        # eager steps close the gap)
        if (scan_step is not None and epoch % k == 0
                and epoch + k <= cfg.epochs):
            state, stacked = scan_step(state, graph, layout)
            stacked = {kk: np.asarray(v) for kk, v in stacked.items()}
            rows = [{kk: float(v[i]) for kk, v in stacked.items()}
                    for i in range(k)]
        else:
            if tracer:
                tracer.before_step()
            state, metrics = train_step(state, graph, layout)
            if tracer:
                tracer.after_step(block_on=metrics)
            rows = [{kk: float(v) for kk, v in metrics.items()}]
        for j, row in enumerate(rows):
            row["epoch"] = epoch + j
            history.append(row)
            if (epoch + j) % cfg.log_every == 0:
                log.log(
                    f"Epoch {epoch + j:4d} | loss {row['loss']:.4f} | "
                    f"train acc {row.get('train_acc', float('nan')):.4f} | "
                    f"test acc {row.get('test_acc', float('nan')):.4f}"
                )
        epoch += len(rows)
        if (cfg.select_best_every and eval_graph.val_mask is not None
                and epoch % cfg.select_best_every == 0):
            m = eval_step(state.params, eval_graph, jax.random.PRNGKey(cfg.seed + 7),
                          eval_layout)
            va = float(m.get("val_acc", -1.0))
            if va > best_val:
                best_val = va
                best_params = jax.tree_util.tree_map(lambda a: a.copy(), state.params)
                if cfg.run_dir:
                    save_checkpoint(
                        os.path.join(cfg.run_dir, "checkpoint_best.pkl"),
                        state.replace(params=best_params), epoch - 1, None,
                        extra={"best_val_acc": best_val},
                    )
        if cfg.run_dir and cfg.checkpoint_every and epoch % cfg.checkpoint_every == 0:
            save_checkpoint(
                os.path.join(cfg.run_dir, f"checkpoint_ep{epoch - 1}.pkl"),
                state, epoch - 1, rows[-1]["loss"],
            )
    if tracer:
        tracer.close()
    final_params = best_params if best_params is not None else state.params
    if best_params is not None:
        log.log(f"model selection: best val acc {best_val:.4f}")
    final = eval_step(final_params, eval_graph, jax.random.PRNGKey(cfg.seed + 999),
                      eval_layout)
    final = {k: float(v) for k, v in final.items()}
    headline = final.get("test_acc", final.get("train_acc", float("nan")))
    log.log(f"Final Test Accuracy: {headline:.4f} ({time.time() - t0:.1f}s)")
    if cfg.run_dir:
        save_checkpoint(os.path.join(cfg.run_dir, "checkpoint_final.pkl"),
                        state, cfg.epochs - 1, history[-1]["loss"] if history else None)
    # final_params = the best-val-selected params when select_best_every is
    # on (what final_metrics was computed from), else the final-epoch ones
    return {"state": state, "history": history, "final_metrics": final,
            "final_params": final_params}


def train_saint(
    model: nn.Module,
    sampler: GraphSaintRandomWalkSampler,
    full_graph: Graph,
    cfg: TrainConfig,
    log: Optional[Logfile] = None,
    state: Optional[TrainState] = None,
    prefetch: bool = True,
) -> Dict[str, Any]:
    """GraphSAINT subgraph training (cora_benchmark_graphsaint.py pattern).

    One optimizer step per sampled subgraph; num_steps subgraphs per epoch;
    the LR schedule advances per step (scheduler.step() at :116). Final
    accuracy is measured with a full-graph forward (:159-164).
    """
    log = log or Logfile()
    tx = _opt(cfg)
    start_epoch = 0
    if state is None:
        probe = sampler.sample()
        state = create_train_state(model, probe, tx, seed=cfg.seed)
        state, start_epoch = resume_or_create(cfg.run_dir, state)
        if start_epoch:
            log.log(f"resumed from epoch {start_epoch - 1}")
    train_step = make_train_step(
        model, loss_mode="saint_mean" if cfg.saint_loss == "mean" else "saint"
    )
    eval_step = make_eval_step(model, num_eval_samples=cfg.num_eval_samples)

    # cfg.use_pallas: one fixed per-tile edge budget across subgraphs so all
    # steps share a single compiled executable; a tail-large subgraph bumps
    # the budget (one recompile), mirroring the sampler's pad regrow.
    use_pallas = _use_pallas(model)
    full_layout = _layout_for(full_graph) if use_pallas else None
    budget = _saint_layout_budget(sampler) if use_pallas else 0

    def _required_budget(sub, tile_nodes=None):
        # actual max per-tile edge count of THIS subgraph, SMEM-aligned —
        # the sampler-derived heuristic (2x average + 128) can be exceeded
        # by hub-node tile skew without any sampler pad regrow, so growing
        # from the sampler alone would re-raise the same overflow
        from ampnet_tpu.ops.pallas.format import DEFAULT_TILE_NODES

        tile_nodes = tile_nodes or DEFAULT_TILE_NODES
        em = np.asarray(sub.edge_mask)
        r = np.asarray(sub.receivers)[em]
        s = np.asarray(sub.senders)[em]
        if r.size == 0:
            return 128
        # the shared budget serves BOTH layouts: receiver-tiled (fwd +
        # dQ pass, bounded by in-degree tile skew) and sender-tiled
        # (scatter-free dK|dV pass, bounded by OUT-degree tile skew)
        need = max(int(np.bincount(r // tile_nodes).max()),
                   int(np.bincount(s // tile_nodes).max()))
        return ((need + 127) // 128) * 128

    def sub_layout(sub):
        nonlocal budget
        if not use_pallas:
            return None
        try:
            return _layout_for(sub, edges_per_tile=budget)
        except ValueError:
            budget = max(budget, _saint_layout_budget(sampler),
                         _required_budget(sub))
            log.log(f"edge-layout budget regrown to {budget} (recompile)")
            return _layout_for(sub, edges_per_tile=budget)

    history: List[Dict[str, float]] = []
    best_val, best_params = -1.0, None
    if cfg.run_dir and start_epoch:
        best_val, best_params = restore_best(cfg.run_dir, state.params)
        if best_params is not None:
            log.log(f"restored banked best (val acc {best_val:.4f})")
    tracer = _tracer(cfg, log)
    t0 = time.time()
    for epoch in range(start_epoch, cfg.epochs):
        it = sampler.prefetch() if prefetch else iter(sampler)
        for i, sub in enumerate(it):
            if tracer:
                tracer.before_step()
            state, metrics = train_step(state, sub, sub_layout(sub))
            if tracer:
                tracer.after_step(block_on=metrics)
            last = i == len(sampler) - 1
            if last or (cfg.log_every_steps and i % cfg.log_every_steps == 0):
                # reference per-iteration format: epoch, partition, LR,
                # train loss/acc (cora_benchmark_graphsaint.py:130-131)
                row = {k: float(v) for k, v in metrics.items()}
                row["epoch"] = epoch
                row["lr"] = _lr_at(cfg, int(state.step) - 1)
                log.log(
                    f"Epoch: {epoch:03d}, Partition: {i:03d}, "
                    f"LR: {row['lr']:.6f}, Train loss: {row['loss']:.4f}, "
                    f"Train acc: {row.get('train_acc', float('nan')):.4f}"
                )
                if last:
                    history.append(row)
        if (cfg.select_best_every and full_graph.val_mask is not None
                and (epoch + 1) % cfg.select_best_every == 0):
            m = eval_step(state.params, full_graph,
                          jax.random.PRNGKey(cfg.seed + 7), full_layout)
            va = float(m.get("val_acc", -1.0))
            if va > best_val:
                best_val = va
                best_params = jax.tree_util.tree_map(lambda a: a.copy(), state.params)
                if cfg.run_dir:
                    # persist the selected params: a crash after epoch K
                    # must not lose the best model seen so far
                    save_checkpoint(
                        os.path.join(cfg.run_dir, "checkpoint_best.pkl"),
                        state.replace(params=best_params), epoch, None,
                        extra={"best_val_acc": best_val},
                    )
            log.log(f"Eval epoch {epoch:4d} | val acc {va:.4f} | best {best_val:.4f}")
        if cfg.run_dir and cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
            save_checkpoint(
                os.path.join(cfg.run_dir, f"checkpoint_ep{epoch}.pkl"),
                state, epoch, history[-1]["loss"] if history else None,
            )
    if tracer:
        tracer.close()
    final_params = best_params if best_params is not None else state.params
    if best_params is not None:
        log.log(f"model selection: best val acc {best_val:.4f}")
    final = eval_step(final_params, full_graph, jax.random.PRNGKey(cfg.seed + 999),
                      full_layout)
    final = {k: float(v) for k, v in final.items()}
    log.log(f"Final Test Accuracy: {final.get('test_acc', float('nan')):.4f} "
            f"({time.time() - t0:.1f}s)")
    if cfg.run_dir:
        save_checkpoint(os.path.join(cfg.run_dir, "checkpoint_final.pkl"),
                        state, cfg.epochs - 1, history[-1]["loss"] if history else None)
    return {"state": state, "history": history, "final_metrics": final,
            "final_params": final_params}
