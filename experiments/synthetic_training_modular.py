"""Modular XOR trainer — mirrors
synthetic_benchmark/synthetic_training_modular.py: ARGS-dict config
(:124-137), NLLLoss, grad clip 1.0 (:60), checkpoints every 20 epochs
(:89-94), returns (max train acc, max test acc)."""
import argparse

import jax

from common import *  # noqa: F401,F403  (sys.path setup)

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig
from ampnet_tpu.data.synthetic import get_duplicated_xor_graphs, get_xor_graphs
from ampnet_tpu.interpret.curves import plot_history
from ampnet_tpu.models import get_model
from ampnet_tpu.train import (
    Logfile,
    create_run_dir,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

ARGS = {
    "model_name": "AMPNet",      # AMPNet | GCN | LinearLayer | TwoLayerSigmoid
    "duplicated_features": True,
    "feature_repeats": 5,
    "num_train_samples": 400,
    "num_test_samples": 400,
    "noise_std": 0.3,
    "num_nearest_neighbors": 10,
    "epochs": 200,
    "learning_rate": 5e-3,
    "embedding_dim": 32,
    "num_heads": 2,
    "num_sampled_vectors": 20,
    "seed": 0,
}


def train_model(args=None, run_base="runs", log: Logfile = None):
    args = {**ARGS, **(args or {})}
    assert args["num_train_samples"] % 4 == 0
    if args["duplicated_features"]:
        train_g, test_g = get_duplicated_xor_graphs(
            args["num_train_samples"], args["num_test_samples"],
            args["noise_std"], args["num_nearest_neighbors"],
            args["feature_repeats"], seed=args["seed"],
        )
        n_feats = 2 * args["feature_repeats"]
    else:
        train_g, test_g = get_xor_graphs(
            args["num_train_samples"], args["num_test_samples"],
            args["noise_std"], seed=args["seed"],
        )
        n_feats = 2

    run_dir = create_run_dir(run_base, details=str(args))
    log = log or Logfile(f"{run_dir}/_details.txt")

    name = args["model_name"]
    if name == "AMPNet":
        model = get_model(
            "AMPNet",
            embedding_dim=args["embedding_dim"], num_heads=args["num_heads"],
            num_node_features=n_feats,
            num_sampled_vectors=args["num_sampled_vectors"],
            output_dim=2,
            feat_emb_dim=args["embedding_dim"] - 1, val_emb_dim=1,
            dropout_rate=0.0, dropout_adj_rate=0.0,
        )
    elif name == "GCN":
        model = get_model("GCN", num_node_features=n_feats, feat_emb_dim=7,
                          val_emb_dim=1, output_dim=2)
    else:
        model = get_model(name)

    tx = make_optimizer(args["learning_rate"], grad_clip=1.0)
    state = create_train_state(model, train_g, tx, seed=args["seed"])
    step = make_train_step(model, loss_mode="full")
    eval_step = make_eval_step(model)

    history, max_train, max_test = [], 0.0, 0.0
    for epoch in range(args["epochs"]):
        state, metrics = step(state, train_g)
        test_m = eval_step(state.params, test_g, jax.random.PRNGKey(epoch))
        row = {
            "epoch": epoch,
            "loss": float(metrics["loss"]),
            "train_acc": float(metrics["train_acc"]),
            "test_acc": float(test_m["train_acc"]),
        }
        history.append(row)
        max_train = max(max_train, row["train_acc"])
        max_test = max(max_test, row["test_acc"])
        if epoch % 20 == 0:
            log.log(f"Epoch {epoch:4d} | loss {row['loss']:.4f} | "
                    f"train {row['train_acc']:.4f} | test {row['test_acc']:.4f}")
    plot_history(history, run_dir)
    log.log(f"Max train acc {max_train:.4f} | max test acc {max_test:.4f}")
    return max_train, max_test


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=ARGS["model_name"])
    p.add_argument("--epochs", type=int, default=ARGS["epochs"])
    p.add_argument("--noise-std", type=float, default=ARGS["noise_std"])
    a = p.parse_args()
    train_model({"model_name": a.model, "epochs": a.epochs, "noise_std": a.noise_std})
