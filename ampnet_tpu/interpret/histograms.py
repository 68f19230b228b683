"""Gradient / activation introspection.

Re-creates the reference's per-model methods as functions over pytrees
(reference: amp_gcn.py:278-406 — visualize_gradients, plot_grad_flow,
visualize_activations; mirrored in every model class there). Operating on
host-fetched arrays from a functional train step instead of `.grad`
attributes.
"""
from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional

import jax
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _flatten_weight_grads(grads) -> Dict[str, np.ndarray]:
    """{'path/to/kernel': flat array} for weight-like leaves
    (the reference filters to names containing 'weight', amp_gcn.py:283)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    for path, leaf in flat:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if any(t in name.lower() for t in ("kernel", "w_", "embedding", "weight", "table", "cls")):
            out[name] = np.asarray(leaf).reshape(-1)
    return out


def visualize_gradients(
    grads: Any,
    save_path: str,
    epoch_idx: int = 0,
    iteration: int = 0,
    color: str = "C0",
) -> Optional[str]:
    """Histogram grid of per-weight-tensor gradients with
    mean/median/std annotations (amp_gcn.py:278-306)."""
    g = _flatten_weight_grads(grads)
    if not g:
        return None
    out_dir = os.path.join(save_path, "gradient_distrib_plots")
    os.makedirs(out_dir, exist_ok=True)
    cols = len(g)
    fig, axes = plt.subplots(1, cols, figsize=(cols * 4, 4), squeeze=False)
    for ax, (name, vals) in zip(axes[0], sorted(g.items())):
        ax.hist(vals, bins=30, color=color)
        ax.set_title(
            f"{name}\nMean: {vals.mean():.4f}, Median: {np.median(vals):.4f}\n"
            f"STD: {vals.std():.4f}",
            fontsize=8,
        )
        ax.set_xlabel("Grad magnitude")
    fig.suptitle("Gradient Magnitude Distribution", fontsize=14, y=1.05)
    fig.subplots_adjust(wspace=0.45)
    out = os.path.join(out_dir, f"gradient_distrib_epoch{epoch_idx}_itr{iteration}.png")
    fig.savefig(out, bbox_inches="tight", facecolor="white")
    plt.close(fig)
    return out


def plot_grad_flow(
    grads: Any,
    save_path: str,
    epoch_idx: int = 0,
    iteration: int = 0,
) -> Optional[str]:
    """Mean/max |grad| per layer bar chart — vanishing/exploding gradient
    diagnostic (amp_gcn.py:308-343)."""
    g = _flatten_weight_grads(grads)
    if not g:
        return None
    out_dir = os.path.join(save_path, "gradient_flow_plots")
    os.makedirs(out_dir, exist_ok=True)
    layers = sorted(g)
    ave = [np.abs(g[k]).mean() for k in layers]
    mx = [np.abs(g[k]).max() for k in layers]
    fig, ax = plt.subplots(figsize=(max(6, len(layers)), 5))
    xs = np.arange(len(layers))
    ax.bar(xs, mx, alpha=0.3, lw=1, color="c", label="max-gradient")
    ax.bar(xs, ave, alpha=0.5, lw=1, color="b", label="mean-gradient")
    ax.hlines(0, -0.5, len(layers) - 0.5, lw=2, color="k")
    ax.set_xticks(xs)
    ax.set_xticklabels(layers, rotation="vertical", fontsize=7)
    ax.set_ylim(bottom=-0.001, top=max(0.02, max(mx) * 1.1 if mx else 0.02))
    ax.set_xlabel("Layers")
    ax.set_ylabel("average gradient")
    ax.set_title("Gradient flow")
    ax.grid(True, alpha=0.3)
    ax.legend()
    out = os.path.join(out_dir, f"gradient_flow_ep{epoch_idx}_itr{iteration}.png")
    fig.savefig(out, bbox_inches="tight", facecolor="white")
    plt.close(fig)
    return out


def visualize_activations(
    activations: Dict[str, np.ndarray],
    save_path: str,
    epoch_idx: int = 0,
    iteration: int = 0,
    color: str = "C0",
) -> str:
    """Histogram grid of named activation stages (amp_gcn.py:345-406).
    `activations` maps stage name -> array (e.g. the model's aux outputs:
    conv1_embedding, conv2_embedding, pooled, logits)."""
    acts = {k: np.asarray(v).reshape(-1) for k, v in activations.items() if v is not None}
    cols = 2
    rows = max(1, math.ceil(len(acts) / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 2.7, rows * 2.5), squeeze=False)
    for i, (name, vals) in enumerate(acts.items()):
        ax = axes[i // cols][i % cols]
        ax.hist(vals, bins=50, color=color, density=True)
        ax.set_title(name, fontsize=9)
    fig.suptitle("Activation distribution", fontsize=16)
    fig.subplots_adjust(hspace=0.4, wspace=0.4)
    os.makedirs(save_path, exist_ok=True)
    out = os.path.join(save_path, f"act_distrib_ep{epoch_idx}_iter{iteration}.png")
    fig.savefig(out)
    plt.close(fig)
    return out


def activation_stages_from_aux(aux: Dict[str, Any], logits=None) -> Dict[str, np.ndarray]:
    """Map AMPGCN aux outputs to the reference's named stages."""
    stages = {}
    if aux.get("conv1_embedding") is not None:
        stages["AmpConv 1"] = np.asarray(aux["conv1_embedding"])
        stages["ReLU 1"] = np.maximum(stages["AmpConv 1"], 0)
    if aux.get("conv2_embedding") is not None:
        stages["AmpConv 2"] = np.asarray(aux["conv2_embedding"])
        stages["ReLU 2"] = np.maximum(stages["AmpConv 2"], 0)
    if aux.get("pooled") is not None:
        stages["Average Pooling"] = np.asarray(aux["pooled"])
    if aux.get("raw_residual") is not None:
        stages["Raw Residual"] = np.asarray(aux["raw_residual"])
    if logits is not None:
        stages["Linear Out"] = np.asarray(logits)
    return stages
