"""Scale the token-sampling budget S (ROADMAP item 7 tail).

The GCN-raw baseline (0.830) shows the token-sampling frontend — not the
graph machinery — is AMPNet's accuracy bottleneck. r1's best recipe used
S=40 (0.760 with tfidf + best-val). This probes S=64 (and S=40 control)
on the plain conv stack; the reference's ablation notes flag instability
at S=100/D=64, so S=64/D=128 is the next sensible point.

Sequential on-device; ONE device process at a time.
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
    ap.add_argument("--s", type=str, default="64")
    args = ap.parse_args()

    d, full_g = cora_graph()
    scaler_stats = fit_scaler(np.asarray(d.x))

    rows = []
    for s in [int(v) for v in args.s.split(",")]:
        t0 = time.time()
        cfg = AMPGCNConfig(
            num_sampled_vectors=s, token_sampling="tfidf",
            scaler="precomputed",
        )
        model = AMPGCN(cfg, scaler_stats=scaler_stats)
        tcfg = TrainConfig(
            learning_rate=3e-3, weight_decay=5e-4, epochs=args.epochs,
            cosine_t0=None, grad_clip=1.0, select_best_every=10,
            num_eval_samples=8, checkpoint_every=0,
        )
        res = train_full_batch(model, full_g, tcfg, eval_graph=full_g)
        fm = res["final_metrics"]
        rows.append((s, fm))
        print(f"[{time.time()-t0:6.1f}s] S={s}: "
              f"val {fm.get('val_acc', float('nan')):.4f} "
              f"test {fm.get('test_acc', float('nan')):.4f}", flush=True)
    print("\n=== summary ===")
    for s, fm in rows:
        print(f"S={s}: val {fm.get('val_acc', float('nan')):.4f} "
              f"test {fm.get('test_acc', float('nan')):.4f}", flush=True)


if __name__ == "__main__":
    main()
