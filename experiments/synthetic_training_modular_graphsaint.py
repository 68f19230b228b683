"""Modular XOR trainer, GraphSAINT variant — mirrors
synthetic_benchmark/synthetic_training_modular_graphsaint.py: train/test
each streamed through their own GraphSAINT sampler with
node_norm-weighted loss (:43-46, :62-63)."""
import argparse

import jax
import numpy as np

from common import *  # noqa: F401,F403
from synthetic_training_modular import ARGS

from ampnet_tpu.data.graphsaint import GraphSaintRandomWalkSampler
from ampnet_tpu.data.synthetic import create_duplicated_xor_data
from ampnet_tpu.models import get_model
from ampnet_tpu.train import (
    Logfile,
    create_run_dir,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def train_model(args=None, run_base="runs"):
    args = {**ARGS, **(args or {})}
    rng = np.random.default_rng(args["seed"])
    samplers = []
    for ns in (args["num_train_samples"], args["num_test_samples"]):
        x, y, _, ei = create_duplicated_xor_data(
            ns, args["noise_std"], args["num_nearest_neighbors"],
            args["feature_repeats"], rng,
        )
        samplers.append(
            GraphSaintRandomWalkSampler(
                x, ei, y=y.astype(np.int32), train_mask=np.ones(ns, bool),
                batch_size=4, walk_length=20, num_steps=10, sample_coverage=20,
                seed=args["seed"],
            )
        )
    train_sampler, test_sampler = samplers
    n_feats = 2 * args["feature_repeats"]
    model = get_model(
        "AMPNet",
        embedding_dim=args["embedding_dim"], num_heads=args["num_heads"],
        num_node_features=n_feats, num_sampled_vectors=args["num_sampled_vectors"],
        output_dim=2, feat_emb_dim=args["embedding_dim"] - 1, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    )
    tx = make_optimizer(args["learning_rate"], grad_clip=1.0)
    state = create_train_state(model, train_sampler.sample(), tx, seed=args["seed"])
    step = make_train_step(model, loss_mode="saint")
    eval_step = make_eval_step(model)

    run_dir = create_run_dir(run_base, details=str(args))
    log = Logfile(f"{run_dir}/_details.txt")
    max_train = max_test = 0.0
    for epoch in range(args["epochs"]):
        for sub in train_sampler:
            state, metrics = step(state, sub)
        test_sub = test_sampler.sample()
        test_m = eval_step(state.params, test_sub, jax.random.PRNGKey(epoch))
        tr, te = float(metrics["train_acc"]), float(test_m["train_acc"])
        max_train, max_test = max(max_train, tr), max(max_test, te)
        if epoch % 10 == 0:
            log.log(f"Epoch {epoch:4d} | loss {float(metrics['loss']):.4f} | "
                    f"train {tr:.4f} | test {te:.4f}")
    log.log(f"Max train acc {max_train:.4f} | max test acc {max_test:.4f}")
    return max_train, max_test


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    a = p.parse_args()
    train_model({"epochs": a.epochs})
