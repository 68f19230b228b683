"""Multi-seed robustness of the headline full-batch recipe.

The RESULTS headline rows (tfidf S=40 + best-val selection, 0.760 test)
are single-seed; this reports mean/std/min/max over N seeds so the
accuracy claims carry error bars (the reference reports single runs with
global seed 1, cora_benchmark_graphsaint.py:20-23). Optionally sweeps
the raw-residual variant too. Sequential on-device; ONE device process
at a time.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--raw-residual", type=str, default="",
                help="'' (off) | mlp | gcn | gcn2")
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--dropout-adj", type=float, default=0.0)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--transformer-block", action="store_true",
                    help="pre-LN transformer stack (the 0.901 recipe "
                    "composes this with raw_residual=gcn2)")
    args = ap.parse_args()

    d, full_g = cora_graph()
    scaler_stats = fit_scaler(np.asarray(d.x))

    cfg = AMPGCNConfig(
        num_sampled_vectors=40, token_sampling="tfidf", scaler="precomputed",
        dropout_rate=args.dropout, dropout_adj_rate=args.dropout_adj,
        transformer_block=args.transformer_block,
        raw_residual=args.raw_residual or False,
    )
    rows = []
    for seed in args.seeds:
        t0 = time.time()
        model = AMPGCN(cfg, scaler_stats=scaler_stats)
        tcfg = TrainConfig(
            learning_rate=args.lr, weight_decay=args.weight_decay,
            epochs=args.epochs, cosine_t0=None, grad_clip=1.0,
            select_best_every=10, num_eval_samples=8, checkpoint_every=0,
            seed=seed,
        )
        res = train_full_batch(model, full_g, tcfg, eval_graph=full_g)
        fm = res["final_metrics"]
        rows.append((seed, fm.get("val_acc", float("nan")),
                     fm.get("test_acc", float("nan"))))
        print(f"[{time.time()-t0:6.1f}s] seed {seed}: "
              f"val {rows[-1][1]:.4f} test {rows[-1][2]:.4f}", flush=True)

    tests = np.array([r[2] for r in rows])
    vals = np.array([r[1] for r in rows])
    print(f"\n=== {len(rows)} seeds (raw_residual={args.raw_residual}, "
          f"tblock={args.transformer_block}) ===")
    print(f"test: mean {tests.mean():.4f} std {tests.std():.4f} "
          f"min {tests.min():.4f} max {tests.max():.4f}")
    print(f"val:  mean {vals.mean():.4f} std {vals.std():.4f}")


if __name__ == "__main__":
    main()
