"""A/B the multi-epoch scan dispatch (TrainConfig.epochs_per_dispatch)
against the eager per-step loop on the production hybrid config, loop
time only (no eval/checkpoint/selection, warm executables).

Protocol: one process, both executables compiled first (cold pass),
then alternating warm passes (the relay's tenancy drift makes
sequential A/Bs unreliable — ROADMAP environment notes). Reports
seconds per epoch for each mode.
"""
import time

import numpy as np
from common import cora_graph

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import train_full_batch


def main(epochs=100, reps=3):
    d, g = cora_graph()
    from ampnet_tpu.ops.tokenize import fit_scaler

    cfg = AMPGCNConfig(
        num_sampled_vectors=40, token_sampling="tfidf", scaler="precomputed",
        dropout_rate=0.3, raw_residual="gcn2", use_pallas=True,
    )
    model = AMPGCN(config=cfg, scaler_stats=fit_scaler(np.asarray(d.x)))

    def run(k):
        tcfg = TrainConfig(
            learning_rate=3e-3, weight_decay=1e-3, epochs=epochs,
            cosine_t0=None, grad_clip=1.0, checkpoint_every=0, log_every=10**9,
            epochs_per_dispatch=k,
        )
        t0 = time.time()
        train_full_batch(model, g, tcfg)
        return time.time() - t0

    # cold pass compiles both executables (not reported)
    run(1), run(10)
    times = {1: [], 10: []}
    for _ in range(reps):
        for k in (1, 10):
            times[k].append(run(k))
    for k in (1, 10):
        med = sorted(times[k])[len(times[k]) // 2]
        print(f"k={k:2d}: median {med:.2f}s total, "
              f"{1e3 * med / epochs:.2f} ms/epoch  (reps: "
              + ", ".join(f"{t:.2f}" for t in times[k]) + ")")


if __name__ == "__main__":
    main()
