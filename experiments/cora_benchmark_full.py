"""Full-batch Cora training — mirrors experiments/cora_benchmark_full.py:
whole-graph forward, masked mean NLL, Adam lr=3e-3 wd=5e-4, 150 epochs,
final test accuracy (:97-102)."""
import argparse

from common import cora_graph

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig
from ampnet_tpu.interpret.curves import plot_history
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import Logfile, create_run_dir, train_full_batch


def main(epochs=150, run_base="runs", tuned=False, raw_residual=False,
         profile_steps=0, epochs_per_dispatch=0):
    d, g = cora_graph()
    if tuned or raw_residual:
        # framework recipe: tfidf S=40, dataset-level scaler stats,
        # best-val selection added below; --raw-residual adds the hybrid
        # head (RESULTS.md: 0.760 tuned, 0.864 hybrid)
        from ampnet_tpu.ops.tokenize import fit_scaler

        import numpy as np

        cfg = AMPGCNConfig(
            num_sampled_vectors=40, token_sampling="tfidf",
            scaler="precomputed",
            dropout_rate=0.3 if raw_residual else 0.1,
            raw_residual="gcn2" if raw_residual else False,
            # fused kernels: exact-parity tested vs the XLA convs; the
            # production step is 29.5 ms device-loop at these shapes
            # (experiments/production_step_probe.py) vs ~3 s/epoch
            # wall for the XLA path through this driver (r5)
            use_pallas=True,
        )
        model = AMPGCN(config=cfg, scaler_stats=fit_scaler(np.asarray(d.x)))
    else:
        cfg = AMPGCNConfig(
            embedding_dim=128, num_heads=4, num_node_features=1433,
            num_sampled_vectors=20, output_dim=7, feat_emb_dim=127, val_emb_dim=1,
        )
        model = AMPGCN(config=cfg)
    run_dir = create_run_dir(run_base, details="cora full batch")
    tcfg = TrainConfig(
        learning_rate=3e-3,
        weight_decay=1e-3 if raw_residual else 5e-4, epochs=epochs,
        cosine_t0=None, checkpoint_every=10, run_dir=run_dir, log_every=10,
        grad_clip=1.0 if (tuned or raw_residual) else None,
        select_best_every=10 if (tuned or raw_residual) else 0,
        num_eval_samples=8 if (tuned or raw_residual) else 1,
        profile_steps=profile_steps,
        # tuned/hybrid recipe: scan 10 epochs per dispatch (= the eval /
        # checkpoint cadence, so boundaries align) — identical math
        # (tests/test_scan_loop.py), ~0 per-epoch host overhead
        epochs_per_dispatch=(
            epochs_per_dispatch or (10 if (tuned or raw_residual) else 1)
        ),
    )
    log = Logfile(f"{run_dir}/_details.txt")
    result = train_full_batch(model, g, tcfg, log=log)
    plot_history(result["history"], run_dir)
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--tuned", action="store_true",
                   help="framework recipe: tfidf S=40 + precomputed scaler "
                        "+ best-val selection + ensemble eval")
    p.add_argument("--raw-residual", action="store_true",
                   help="--tuned plus the hybrid gcn2 raw-residual head")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture a jax.profiler trace of N post-compile "
                        "epochs into <run_dir>/profile")
    p.add_argument("--epochs-per-dispatch", type=int, default=0, metavar="K",
                   help="scan K epochs per device dispatch (0 = recipe "
                        "default: 10 for --tuned/--raw-residual, else 1)")
    a = p.parse_args()
    main(a.epochs, tuned=a.tuned, raw_residual=a.raw_residual,
         profile_steps=a.profile, epochs_per_dispatch=a.epochs_per_dispatch)
