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
         fused=False):
    np.random.seed(1)  # reference seeds :20-23
    d, full_g = cora_graph()
    sampler = GraphSaintRandomWalkSampler(
        d.x, d.edge_index, y=d.y,
        train_mask=d.train_mask, val_mask=d.val_mask, test_mask=d.test_mask,
        batch_size=8, walk_length=150, num_steps=steps_per_epoch,
        sample_coverage=100, seed=1,
    )
    if train_ampconv:
        cfg = AMPGCNConfig(
            embedding_dim=128, num_heads=4, num_node_features=1433,
            num_sampled_vectors=20, output_dim=7, feat_emb_dim=127, val_emb_dim=1,
        )
        model = AMPGCN(config=cfg)
    else:
        model = GCN(num_node_features=1433, feat_emb_dim=127, val_emb_dim=1, output_dim=7)

    run_dir = create_run_dir(run_base, details=f"cora graphsaint ampconv={train_ampconv}")
    tcfg = TrainConfig(
        learning_rate=0.1, weight_decay=1e-4, epochs=epochs,
        cosine_t0=400, cosine_t_mult=2, checkpoint_every=10, run_dir=run_dir,
    )
    log = Logfile(f"{run_dir}/_details.txt")
    if fused and train_ampconv:
        result = train_saint_fused(model, sampler, full_g, tcfg, log)
    else:
        result = train_saint(model, sampler, full_g, tcfg, log=log)
    plot_history(result["history"], run_dir)
    return result


def train_saint_fused(model, sampler, full_g, tcfg, log):
    """SAINT loop with the fused Pallas conv kernels: one executable across
    subgraphs via a fixed per-tile edge budget."""
    import jax

    from ampnet_tpu.train import create_train_state, make_eval_step
    from ampnet_tpu.train.loop import _opt
    from ampnet_tpu.train.pallas_step import (
        compute_layout,
        default_edge_budget,
        make_pallas_train_step,
    )

    probe = sampler.sample()
    budget = default_edge_budget(
        probe.num_edges_padded, probe.num_nodes_padded // 64, slack=4.0
    )
    state = create_train_state(model, probe, _opt(tcfg), seed=tcfg.seed)
    step = make_pallas_train_step(model, loss_mode="saint")
    eval_step = make_eval_step(model)
    history = []
    for epoch in range(tcfg.epochs):
        for sub in sampler.prefetch():
            layout = compute_layout(sub, tile_nodes=64, edges_per_tile=budget)
            state, metrics = step(state, sub, layout)
        row = {k: float(v) for k, v in metrics.items()}
        row["epoch"] = epoch
        history.append(row)
        log.log(f"Epoch {epoch:4d} | loss {row['loss']:.4f} | "
                f"sub train acc {row.get('train_acc', float('nan')):.4f}")
    final = eval_step(state.params, full_g, jax.random.PRNGKey(tcfg.seed + 999))
    final = {k: float(v) for k, v in final.items()}
    log.log(f"Final Test Accuracy: {final.get('test_acc', float('nan')):.4f}")
    return {"state": state, "history": history, "final_metrics": final}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--gcn", action="store_true", help="train the GCN baseline instead")
    p.add_argument("--fused", action="store_true", help="use the fused Pallas conv kernels")
    a = p.parse_args()
    main(a.epochs, a.steps, train_ampconv=not a.gcn, fused=a.fused)
