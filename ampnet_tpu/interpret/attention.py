"""Attention-coefficient extraction and heatmaps.

Re-creates experiments/visualize_cora_attn_coeffs.py:15-242 and
synthetic_benchmark/visualize_attention_coefficients.py:13-268 on top of
the functional aux outputs (attention weights [E, S, S] and sampled
feature indices [N, S] are returned by the model instead of being cached
on modules — SURVEY §3.4). The O(E*S*S) pure-Python accumulation loop of
the reference (:94-102) is vectorized with np.add.at.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def incoming_edge_attention(
    senders: np.ndarray,
    receivers: np.ndarray,
    attn_weights: np.ndarray,    # [E, S, S] head-averaged
    node: int,
    y: Optional[np.ndarray] = None,
    edge_mask: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Per-node incoming-edge attention view.

    The working version of the reference's scratch inspection
    (synthetic_benchmark/script.py:4-12: edge ids with dst==node, their
    source nodes/labels, and the [k, S, S] attention slices), as a real
    API over the functional aux outputs.

    Returns {'edge_ids', 'neighbors', 'attention'[, 'neighbor_labels']}.
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    valid = receivers == node
    if edge_mask is not None:
        # int/float masks (layout-derived validity) would raise on the
        # in-place bitwise_and with a bool lhs — normalize to bool first
        valid &= np.asarray(edge_mask).astype(bool)
    edge_ids = np.where(valid)[0]
    out = {
        "edge_ids": edge_ids,
        "neighbors": senders[edge_ids],
        "attention": np.asarray(attn_weights)[edge_ids],
    }
    if y is not None:
        out["neighbor_labels"] = np.asarray(y)[senders[edge_ids]]
    return out


def top_k_features_for_class(
    x: np.ndarray, y: np.ndarray, cls: int, k: int = 30
) -> np.ndarray:
    """Indices of the k most-present features among nodes of `cls`
    (get_top_30_feature_idxs_for_class, :37-65)."""
    counts = (x[y == cls] != 0).sum(axis=0)
    return np.argsort(-counts, kind="stable")[:k]


def calculate_attn_heatmap(
    attn_weights: np.ndarray,    # [E, S, S] head-averaged
    sampled_idx: np.ndarray,     # [N, S]
    senders: np.ndarray,         # [E]
    receivers: np.ndarray,       # [E]
    edge_mask: np.ndarray,       # [E]
    y: np.ndarray,               # [N]
    src_class: int,
    dst_class: int,
    src_top: np.ndarray,         # [K] feature ids
    dst_top: np.ndarray,         # [K]
) -> Tuple[np.ndarray, np.ndarray]:
    """Mean attention per (dst-feature-row, src-feature-col) over edges of a
    class pair (calculate_attn_heatmap, :68-106). Returns (heatmap [K,K],
    counts [K,K])."""
    k = len(src_top)
    src_pos = np.full(int(max(sampled_idx.max(), src_top.max(), dst_top.max())) + 1, -1, np.int64)
    dst_pos = src_pos.copy()
    src_pos[src_top] = np.arange(k)
    dst_pos[dst_top] = np.arange(k)

    sel = (np.asarray(edge_mask).astype(bool)
           & (y[senders] == src_class) & (y[receivers] == dst_class))
    eids = np.nonzero(sel)[0]
    heat = np.zeros((k, k))
    counts = np.zeros((k, k))
    if len(eids) == 0:
        return heat, counts

    w = attn_weights[eids]                       # [e, S, S]
    dst_tok = dst_pos[sampled_idx[receivers[eids]]]  # [e, S] row positions
    src_tok = src_pos[sampled_idx[senders[eids]]]    # [e, S] col positions
    e, s = dst_tok.shape
    rows = np.broadcast_to(dst_tok[:, :, None], (e, s, s))
    cols = np.broadcast_to(src_tok[:, None, :], (e, s, s))
    valid = (rows >= 0) & (cols >= 0)
    np.add.at(heat, (rows[valid], cols[valid]), w[valid])
    np.add.at(counts, (rows[valid], cols[valid]), 1.0)
    with np.errstate(invalid="ignore"):
        heat = np.where(counts > 0, heat / np.maximum(counts, 1), 0.0)
    return heat, counts


def plot_attn_heatmap(
    heat: np.ndarray,
    save_path: str,
    name: str,
    src_labels: Optional[Sequence] = None,
    dst_labels: Optional[Sequence] = None,
    clustermap: bool = True,
) -> str:
    """Save raw .npy + seaborn heatmap (+clustermap), :144-180."""
    os.makedirs(save_path, exist_ok=True)
    np.save(os.path.join(save_path, f"{name}.npy"), heat)
    import seaborn as sns

    fig, ax = plt.subplots(figsize=(10, 8))
    sns.heatmap(heat, ax=ax, cmap="viridis",
                xticklabels=src_labels if src_labels is not None else "auto",
                yticklabels=dst_labels if dst_labels is not None else "auto")
    ax.set_xlabel("Source node feature")
    ax.set_ylabel("Destination node feature")
    ax.set_title(name)
    out = os.path.join(save_path, f"{name}_heatmap.png")
    fig.savefig(out, bbox_inches="tight", facecolor="white")
    plt.close(fig)
    if clustermap and heat.shape[0] > 1 and np.abs(heat).sum() > 0:
        try:
            cg = sns.clustermap(heat, cmap="viridis")
            cg.savefig(os.path.join(save_path, f"{name}_clustermap.png"))
            plt.close("all")
        except Exception:
            pass
    return out


def visualize_attention_coefficients(
    x: np.ndarray,
    y: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    attn_weights: np.ndarray,
    sampled_idx: np.ndarray,
    save_path: str,
    class_pairs: Optional[Sequence[Tuple[int, int]]] = None,
    top_k: int = 30,
) -> Dict[Tuple[int, int], np.ndarray]:
    """Full extraction pipeline per class pair (:182-220)."""
    n_classes = int(y.max()) + 1
    if class_pairs is None:
        class_pairs = [(a, b) for a in range(n_classes) for b in range(n_classes)]
    tops = {c: top_k_features_for_class(x, y, c, top_k) for c in range(n_classes)}
    out = {}
    for (cs, cd) in class_pairs:
        heat, _ = calculate_attn_heatmap(
            attn_weights, sampled_idx, senders, receivers, edge_mask, y,
            cs, cd, tops[cs], tops[cd],
        )
        plot_attn_heatmap(
            heat, save_path, f"attn_class{cs}_to_class{cd}",
            src_labels=tops[cs], dst_labels=tops[cd],
        )
        out[(cs, cd)] = heat
    return out


def plot_xor_attn_weights(
    x: np.ndarray,               # [N, 2] XOR features
    y: np.ndarray,
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    attn_weights: np.ndarray,    # [E, S, S]
    save_path: str,
    bins: Tuple[float, float] = (-7.5, 7.5),
) -> str:
    """XOR variant: bucket edges by (src-quadrant, dst-quadrant) of the
    truth table and histogram the per-edge attention entries
    (visualize_attention_coefficients.py:13-268; the wide bin range covers
    unbounded no-softmax weights, :188)."""
    quad = (np.round(np.clip(x[:, 0], 0, 1)) * 2 + np.round(np.clip(x[:, 1], 0, 1))).astype(int)
    os.makedirs(save_path, exist_ok=True)
    fig, axes = plt.subplots(4, 4, figsize=(14, 12))
    eids = np.nonzero(edge_mask)[0]
    sq, dq = quad[senders[eids]], quad[receivers[eids]]
    for a in range(4):
        for b in range(4):
            ax = axes[a][b]
            sel = (sq == a) & (dq == b)
            vals = attn_weights[eids[sel]].reshape(-1)
            if len(vals):
                ax.hist(vals, bins=40, range=bins, density=True, color="C0")
            ax.set_title(f"src q{a} -> dst q{b}", fontsize=8)
    fig.suptitle("Per-edge attention entries by XOR quadrant pair")
    fig.tight_layout()
    out = os.path.join(save_path, "xor_attn_quadrants.png")
    fig.savefig(out, facecolor="white")
    plt.close(fig)
    return out
