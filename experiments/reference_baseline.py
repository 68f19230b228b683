"""Measure the UNMODIFIED reference implementation on the shared data.

BASELINE.md's accuracy target is "parity with reference AMPNet (measure
reference ourselves; no published number)". This driver executes the
reference's own AMPGCN (imported from the reference checkout through the
PyG-free shim, ampnet_tpu/testing/pyg_shim.py) with the reference's own
training protocols, on exactly the arrays the JAX framework trains on
(surrogate Cora / XOR generators), so every framework accuracy in
RESULTS.md has a true reference-measured bar next to it.

Tasks:
  fullbatch  reference experiments/cora_benchmark_full.py protocol:
             AMPGCN() all-default kwargs (emb=100, heads=2, S=40 — NB the
             reference's full-batch model is SMALLER than its SAINT model),
             Adam lr=3e-3 wd=5e-4, 150 epochs, per-epoch metrics from the
             train-mode forward (:64-82 quirk kept), then the protocol's
             `Final Test Accuracy` eval-mode full-graph forward (:97-102).
  saint      reference experiments/cora_benchmark_graphsaint.py protocol:
             AMPGCN(emb=128, heads=4, S=20, dropouts 0.0) (:58-71), Adam
             lr=0.1 wd=1e-4 (:84), CosineAnnealingWarmRestarts(T_0=400,
             T_mult=2) stepped per iteration (:85,116), node_norm-weighted
             sum NLL (:105-106), subgraph stream from
             ampnet_tpu.data.graphsaint (the same sampler the framework
             trains on, padding stripped), final full-graph accuracy
             (:159-164). --steps bounds total iterations (full = 10000).
  xor        reference synthetic_benchmark/synthetic_training_modular.py
             protocol: duplicated-XOR data (noise 0.3, knn 20, n=400),
             AMPGCN(emb=3, heads=1, S=2, no downsampling)
             (xor_training_utils.py:58-72), Adam lr=0.01 wd=5e-4, NLLLoss,
             grad-clip 1.0, 200 epochs, max train/test accuracy.

Emits one JSON line per run: {"task", "final_test_acc", ...}.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

from common import _enable_compile_cache  # noqa: F401  (path setup only)

import numpy as np

from ampnet_tpu.testing import pyg_shim


def _seed_everything(seed: int):
    import random

    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    random.seed(seed)


def _accuracy(pred: np.ndarray, y: np.ndarray) -> float:
    return float((pred == y).sum() / y.shape[0])


def _cora_data():
    """Surrogate Cora as a shim Data object (same arrays as the framework)."""
    import torch

    from ampnet_tpu.data.planetoid import load_cora

    d = load_cora()
    return d, pyg_shim.Data(
        x=torch.from_numpy(np.asarray(d.x, np.float32)),
        edge_index=torch.from_numpy(np.asarray(d.edge_index, np.int64)),
        y=torch.from_numpy(np.asarray(d.y, np.int64)),
        train_mask=torch.from_numpy(np.asarray(d.train_mask)),
        val_mask=torch.from_numpy(np.asarray(d.val_mask)),
        test_mask=torch.from_numpy(np.asarray(d.test_mask)),
    )


def run_fullbatch(epochs: int = 150, seed: int = 1, log=print) -> dict:
    import torch
    import torch.nn.functional as F

    ref = pyg_shim.load_reference()
    _seed_everything(seed)
    d, data = _cora_data()
    model = ref.AMPGCN(device="cpu")  # all defaults (cora_benchmark_full.py:46)
    opt = torch.optim.Adam(model.parameters(), lr=0.003, weight_decay=5e-4)

    best_test = 0.0
    t0 = time.time()
    for epoch in range(epochs):
        model.train()
        opt.zero_grad()
        out = model(data)
        train_loss = F.nll_loss(out[data.train_mask], data.y[data.train_mask])
        train_loss.backward()
        opt.step()
        with torch.no_grad():
            pred = out.argmax(dim=1)
            train_acc = _accuracy(pred[data.train_mask].numpy(), data.y[data.train_mask].numpy())
            # per-epoch test metric reuses the TRAIN-MODE forward, like the
            # reference (:77-82)
            test_acc = _accuracy(pred[data.test_mask].numpy(), data.y[data.test_mask].numpy())
        best_test = max(best_test, test_acc)
        log(f"Epoch {epoch:05d} | Train NLL {train_loss.item():.4f}; "
            f"Acc {train_acc:.4f} | Test Acc {test_acc:.4f}")

    # protocol eval (:97-102): eval-mode full-graph forward (still stochastic
    # token sampling — the reference resamples at eval, amp_gcn.py:135)
    model.eval()
    with torch.no_grad():
        pred = model(data).argmax(dim=1)
    final = _accuracy(pred[data.test_mask].numpy(), data.y[data.test_mask].numpy())
    return {
        "task": "fullbatch", "final_test_acc": final,
        "best_epoch_test_acc": best_test, "epochs": epochs,
        "train_acc_last": train_acc, "seconds": round(time.time() - t0, 1),
        "data": "surrogate-cora" if d.synthetic else "real-cora",
    }


def _graph_to_data(g):
    """Strip a padded ampnet_tpu Graph to an unpadded torch Data object."""
    import torch

    nm = np.asarray(g.node_mask)
    em = np.asarray(g.edge_mask)
    n = int(nm.sum())
    x = np.array(g.x)[:n]  # np.array copies: jax buffers are read-only and
    ei = np.stack([np.asarray(g.senders)[em], np.asarray(g.receivers)[em]])
    # torch.from_numpy warns on non-writable inputs
    return pyg_shim.Data(
        x=torch.from_numpy(x.astype(np.float32)),
        edge_index=torch.from_numpy(ei.astype(np.int64)),
        y=torch.from_numpy(np.array(g.y)[:n].astype(np.int64)),
        train_mask=torch.from_numpy(np.array(g.train_mask)[:n]),
        test_mask=torch.from_numpy(np.array(g.test_mask)[:n]),
        node_norm=torch.from_numpy(np.array(g.node_norm)[:n].astype(np.float32)),
        num_nodes_real=n,
    )


def run_saint(steps: int = 2000, seed: int = 1, log=print) -> dict:
    import torch
    import torch.nn.functional as F

    ref = pyg_shim.load_reference()
    _seed_everything(seed)
    d, data = _cora_data()

    from ampnet_tpu.data.graphsaint import GraphSaintRandomWalkSampler

    sampler = GraphSaintRandomWalkSampler(
        np.asarray(d.x), np.asarray(d.edge_index), y=np.asarray(d.y),
        train_mask=np.asarray(d.train_mask), test_mask=np.asarray(d.test_mask),
        batch_size=8, walk_length=150, num_steps=200, sample_coverage=100,
        seed=seed,
    )
    model = ref.AMPGCN(
        device="cpu", embedding_dim=128, num_heads=4, num_node_features=d.num_features,
        num_sampled_vectors=20, output_dim=7, softmax_out=True, feat_emb_dim=127,
        val_emb_dim=1, downsample_feature_vectors=True, average_pooling_flag=True,
        dropout_rate=0.0, dropout_adj_rate=0.0, feature_repeats=None,
    )
    opt = torch.optim.Adam(model.parameters(), lr=0.1, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, T_0=400, T_mult=2)

    t0 = time.time()
    recent_train_acc = []
    for it in range(steps):
        sub = _graph_to_data(sampler.sample())
        model.train()
        opt.zero_grad()
        out = model(sub)
        loss = F.nll_loss(out, sub.y, reduction="none")
        loss = (loss * sub.node_norm)[sub.train_mask].sum()
        train_acc = _accuracy(
            out[sub.train_mask].argmax(dim=1).numpy(), sub.y[sub.train_mask].numpy()
        ) if int(sub.train_mask.sum()) else float("nan")
        loss.backward()
        opt.step()
        sched.step()
        recent_train_acc.append(train_acc)
        if it % 20 == 0:
            log(f"it {it:05d} LR {sched.get_last_lr()[0]:.5f} | "
                f"loss {loss.item():.4f} | train acc {train_acc:.4f}")

    model.eval()
    with torch.no_grad():
        pred = model(data).argmax(dim=1)
    final = _accuracy(pred[data.test_mask].numpy(), data.y[data.test_mask].numpy())
    tail = [a for a in recent_train_acc[-200:] if a == a]
    return {
        "task": "saint", "final_test_acc": final, "steps": steps,
        "tail_train_acc_mean": float(np.mean(tail)) if tail else None,
        "seconds": round(time.time() - t0, 1),
        "data": "surrogate-cora" if d.synthetic else "real-cora",
    }


def run_xor(epochs: int = 200, seed: int = 1, log=print) -> dict:
    import torch
    import torch.nn as nn
    import torch.nn.functional as F  # noqa: F401

    ref = pyg_shim.load_reference()
    _seed_everything(seed)

    from ampnet_tpu.data.synthetic import create_duplicated_xor_data

    rng = np.random.default_rng(seed)
    datas = []
    for _ in range(2):
        x, y, _, ei = create_duplicated_xor_data(
            400, noise_std=0.3, num_nearest_neighbors=20, feature_repeats=1, rng=rng
        )
        datas.append(pyg_shim.Data(
            x=torch.from_numpy(x.astype(np.float32)),
            edge_index=torch.from_numpy(ei.astype(np.int64)),
            y=torch.from_numpy(y.astype(np.int64)),
        ))
    train_data, test_data = datas

    model = ref.AMPGCN(
        device="cpu", embedding_dim=3, num_heads=1, num_node_features=2,
        num_sampled_vectors=2, output_dim=2, softmax_out=True, feat_emb_dim=2,
        val_emb_dim=1, downsample_feature_vectors=False, average_pooling_flag=True,
        dropout_rate=0.0, dropout_adj_rate=0.0, feature_repeats=1,
    )
    opt = torch.optim.Adam(model.parameters(), lr=0.01, weight_decay=5e-4)
    criterion = nn.NLLLoss()

    max_train, max_test = 0.0, 0.0
    t0 = time.time()
    for epoch in range(epochs):
        model.train()
        opt.zero_grad()
        out = model(train_data)
        loss = criterion(out, train_data.y)
        train_acc = _accuracy(out.argmax(1).numpy(), train_data.y.numpy())
        loss.backward()
        nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        model.eval()
        with torch.no_grad():
            test_acc = _accuracy(model(test_data).argmax(1).numpy(), test_data.y.numpy())
        max_train, max_test = max(max_train, train_acc), max(max_test, test_acc)
        if epoch % 20 == 0:
            log(f"Epoch {epoch:05d} | loss {loss.item():.4f} | "
                f"train {train_acc:.4f} | test {test_acc:.4f}")
    return {
        "task": "xor", "max_train_acc": max_train, "max_test_acc": max_test,
        "epochs": epochs, "seconds": round(time.time() - t0, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=["fullbatch", "saint", "xor"], required=True)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps", type=int, default=2000,
                   help="saint: total iterations (reference full schedule = 10000)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--quiet", action="store_true")
    a = p.parse_args()
    log = (lambda *_: None) if a.quiet else print

    if a.task == "fullbatch":
        res = run_fullbatch(epochs=a.epochs or 150, seed=a.seed, log=log)
    elif a.task == "saint":
        res = run_saint(steps=a.steps, seed=a.seed, log=log)
    else:
        res = run_xor(epochs=a.epochs or 200, seed=a.seed, log=log)
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
