"""Tune the pre-LN transformer-block AMPGCN variant (ROADMAP item 7).

The reference keeps this architecture as its declared next step
(amp_gcn.py:409-451, commented out). Round 1 showed it overfits out of
the box (train 1.00 by epoch 100, test 0.643 vs 0.743 for the plain
stack + tfidf). This sweep attacks the overfit with dropout / weight
decay / adjacency dropout, keeping the winning r1 recipe otherwise
(tfidf S=40 sampling, best-val selection, 8-draw ensemble eval).

Sequential on-device sweep; ONE device process at a time.
"""
import argparse
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "experiments")

import numpy as np

from common import cora_graph  # noqa: E402

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig  # noqa: E402
from ampnet_tpu.models import AMPGCN  # noqa: E402
from ampnet_tpu.ops.tokenize import fit_scaler  # noqa: E402
from ampnet_tpu.train.loop import train_full_batch  # noqa: E402

CONFIGS = [
    # (name, dropout, dropout_adj, weight_decay)
    ("drop0.3_adj0.2_wd1e-3", 0.3, 0.2, 1e-3),
    ("drop0.5_adj0.3_wd5e-4", 0.5, 0.3, 5e-4),
    ("drop0.3_adj0.1_wd5e-3", 0.3, 0.1, 5e-3),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--configs", type=str, default="")
    args = ap.parse_args()

    d, full_g = cora_graph()
    scaler_stats = fit_scaler(np.asarray(d.x))

    rows = []
    todo = CONFIGS if not args.configs else [
        c for c in CONFIGS if c[0] in args.configs.split(",")]
    for name, drop, dadj, wd in todo:
        t0 = time.time()
        cfg = AMPGCNConfig(
            num_sampled_vectors=40, token_sampling="tfidf",
            scaler="precomputed", dropout_rate=drop, dropout_adj_rate=dadj,
            transformer_block=True,
        )
        model = AMPGCN(cfg, scaler_stats=scaler_stats)
        tcfg = TrainConfig(
            learning_rate=3e-3, weight_decay=wd, epochs=args.epochs,
            cosine_t0=None, grad_clip=1.0, select_best_every=10,
            num_eval_samples=8, checkpoint_every=0,
        )
        res = train_full_batch(model, full_g, tcfg, eval_graph=full_g)
        fm = res["final_metrics"]
        rows.append((name, fm))
        print(f"[{time.time()-t0:6.1f}s] {name}: "
              f"val {fm.get('val_acc', float('nan')):.4f} "
              f"test {fm.get('test_acc', float('nan')):.4f}", flush=True)
    print("\n=== summary ===")
    for name, fm in rows:
        print(f"{name}: val {fm.get('val_acc', float('nan')):.4f} "
              f"test {fm.get('test_acc', float('nan')):.4f}", flush=True)


if __name__ == "__main__":
    main()
