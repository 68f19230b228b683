"""Tune the raw-feature residual head (framework extension; ROADMAP 7).

RESULTS.md isolates AMPNet's accuracy bottleneck to the lossy sampling
frontend (S of F features per pass; GCN over z-scored RAW features gets
0.830 vs AMPNet's best 0.760 on the surrogate, and S=64 did not help).
`AMPGCNConfig.raw_residual=True` concatenates a z-scored raw-feature
projection to the pooled token embedding before the head — a
full-feature view for the classifier while the attention pathway (and
its interpretability outputs) is untouched.

Sweep keeps the winning recipe (tfidf S=40, precomputed scaler,
best-val selection, 8-draw ensemble eval) and varies regularization
around the added capacity. Sequential on-device; ONE device process at
a time.
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

# Round 1 of this sweep measured the 'mlp' mode at 0.644/0.654/0.574 —
# raw features without neighborhood aggregation just overfit (an MLP on
# Cora-like data is ~0.55-0.6; the GCN-raw baseline's 0.830 comes from
# the graph). Round 2 gives the residual 1-2 GCN hops.
CONFIGS = [
    # (name, dropout, dropout_adj, weight_decay, transformer_block, mode)
    ("gcn_drop0.1_adj0.1_wd5e-4", 0.1, 0.1, 5e-4, False, "gcn"),
    ("gcn2_drop0.1_adj0.1_wd5e-4", 0.1, 0.1, 5e-4, False, "gcn2"),
    ("gcn2_drop0.3_adj0.1_wd1e-3", 0.3, 0.1, 1e-3, False, "gcn2"),
    ("mlp_drop0.1_adj0.1_wd5e-4", 0.1, 0.1, 5e-4, False, "mlp"),
    # does the pre-LN transformer stack compose with the hybrid head?
    ("tblock_gcn2_drop0.3_adj0.2_wd1e-3", 0.3, 0.2, 1e-3, True, "gcn2"),
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
    for name, drop, dadj, wd, tblock, mode in todo:
        t0 = time.time()
        cfg = AMPGCNConfig(
            num_sampled_vectors=40, token_sampling="tfidf",
            scaler="precomputed", dropout_rate=drop, dropout_adj_rate=dadj,
            transformer_block=tblock, raw_residual=mode,
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
