"""Main Cora GraphSAINT driver — mirrors the reference's development locus
(experiments/cora_benchmark_graphsaint.py: AMPGCN emb=128/heads=4/S=20,
sampler bs=8/wl=150/steps=200/coverage=100, Adam lr=0.1 wd=1e-4,
CosineAnnealingWarmRestarts T0=400 T_mult=2 stepped per iteration,
50 epochs, final full-graph test accuracy :159-164)."""
import argparse

import numpy as np

from common import cora_graph

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig
from ampnet_tpu.data.graphsaint import GraphSaintRandomWalkSampler
from ampnet_tpu.data.planetoid import load_cora
from ampnet_tpu.interpret.curves import plot_history
from ampnet_tpu.models import AMPGCN, GCN
from ampnet_tpu.train import Logfile, create_run_dir, train_saint

TRAIN_AMPCONV = True  # reference switch at :27


def main(epochs=50, steps_per_epoch=200, train_ampconv=TRAIN_AMPCONV, run_base="runs",
         fused=False, stabilized=False, decay_lr=False, raw_residual=False,
         profile_steps=0):
    np.random.seed(1)  # reference seeds :20-23
    d, full_g = cora_graph()
    sampler = GraphSaintRandomWalkSampler(
        d.x, d.edge_index, y=d.y,
        train_mask=d.train_mask, val_mask=d.val_mask, test_mask=d.test_mask,
        batch_size=8, walk_length=150, num_steps=steps_per_epoch,
        sample_coverage=100, seed=1,
    )
    # Dataset-level scaler stats: the reference refits its StandardScaler on
    # every forward (amp_gcn.py:122-124), so under GraphSAINT each subgraph
    # is z-scored with its own stats and the full-graph eval distribution is
    # unlike anything seen in training — subgraph training then never moves
    # the full-graph accuracy (diagnosed round 2). The stabilized recipe
    # normalizes with stats fit once on the full graph.
    from ampnet_tpu.ops.tokenize import fit_scaler

    scaler_stats = fit_scaler(np.asarray(d.x)) if stabilized else None
    if train_ampconv:
        cfg = AMPGCNConfig(
            embedding_dim=128, num_heads=4, num_node_features=1433,
            num_sampled_vectors=40 if stabilized else 20,
            output_dim=7, feat_emb_dim=127, val_emb_dim=1,
            token_sampling="tfidf" if stabilized else "uniform",
            scaler="precomputed" if stabilized else "batch",
            dropout_adj_rate=0.0 if fused else 0.1,
            use_pallas=fused,
            raw_residual="gcn2" if raw_residual else False,
        )
        model = AMPGCN(config=cfg, scaler_stats=scaler_stats)
    else:
        model = GCN(num_node_features=1433, feat_emb_dim=127, val_emb_dim=1, output_dim=7,
                    scaler_stats=scaler_stats)

    run_dir = create_run_dir(
        run_base,
        details=f"cora graphsaint ampconv={train_ampconv} stabilized={stabilized}",
    )
    if stabilized:
        # The framework's recipe for SAINT that actually learns: the
        # reference's lr=0.1 warm-restart schedule diverges (RESULTS r1);
        # full-batch-grade LR + grad clip + TF-IDF tokens + per-epoch
        # best-val selection + ensemble eval bring the subgraph path to
        # full-batch-level accuracy.
        # single-cycle cosine decay over the whole run (t_mult=1, no
        # restart): the constant-LR run peaked at ~epoch 20 then overfit
        # the subgraph stream; decaying into the peak holds it.
        tcfg = TrainConfig(
            learning_rate=3e-3, weight_decay=5e-4, epochs=epochs,
            cosine_t0=(epochs * steps_per_epoch if decay_lr else None),
            cosine_t_mult=1,
            grad_clip=1.0, checkpoint_every=10,
            run_dir=run_dir, select_best_every=1, num_eval_samples=8,
            log_every_steps=50, saint_loss="mean",
        )
    else:
        # exact reference recipe (documented-instability artifact)
        tcfg = TrainConfig(
            learning_rate=0.1, weight_decay=1e-4, epochs=epochs,
            cosine_t0=400, cosine_t_mult=2, checkpoint_every=10, run_dir=run_dir,
        )
    if profile_steps:
        import dataclasses

        tcfg = dataclasses.replace(tcfg, profile_steps=profile_steps)
    log = Logfile(f"{run_dir}/_details.txt")
    result = train_saint(model, sampler, full_g, tcfg, log=log)
    plot_history(result["history"], run_dir)
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--gcn", action="store_true", help="train the GCN baseline instead")
    p.add_argument("--fused", action="store_true",
                   help="fused Pallas conv kernels (cfg.use_pallas)")
    p.add_argument("--stabilized", action="store_true",
                   help="the framework's stable SAINT recipe (the default "
                        "replicates the reference's diverging lr=0.1 schedule)")
    p.add_argument("--raw-residual", action="store_true",
                   help="hybrid head: 2 GCN hops over z-scored raw features "
                        "concat to the pooled tokens (framework extension; "
                        "full-batch: 0.864 test vs 0.760 tokens-only)")
    p.add_argument("--decay-lr", action="store_true",
                   help="with --stabilized: single-cycle cosine LR decay "
                        "over the full run")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture a jax.profiler trace of N post-compile "
                        "steps into <run_dir>/profile")
    a = p.parse_args()
    main(a.epochs, a.steps, train_ampconv=not a.gcn, fused=a.fused,
         stabilized=a.stabilized, decay_lr=a.decay_lr,
         raw_residual=a.raw_residual, profile_steps=a.profile)
