"""Hyperparameter grid search — mirrors synthetic_benchmark/grid_search.py:
sweep noise_std in {0.1..0.6} x repeats, per-experiment run dirs +
logfiles, aggregated CSV + boxplot (:76-122). Parallelism via
multiprocessing matches the reference's mp.Pool (grid_search.py:84):
--workers N runs experiments in a spawn-context process pool (children
forced onto CPU — the TPU tunnel admits one device client at a time);
the default stays sequential for device runs."""
import argparse
import csv
import multiprocessing as mp
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from common import *  # noqa: F401,F403
from synthetic_training_modular import train_model

from ampnet_tpu.train import create_run_dir


def _pool_init():
    # children must not claim the TPU: the tunnel serializes clients and a
    # second device process blocks forever (ROADMAP env notes)
    import jax

    jax.config.update("jax_platforms", "cpu")


def run_experiment(noise_std: float, repeat: int, run_base: str):
    max_train, max_test = train_model(
        {"noise_std": noise_std, "seed": repeat, "epochs": 100},
        run_base=os.path.join(run_base, f"noise{noise_std}_rep{repeat}"),
    )
    return noise_std, max_train, max_test


def controller(noise_stds=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6), repeats=5,
               run_base=None, workers: int = 0):
    run_base = run_base or create_run_dir("runs", details="grid search")
    jobs = [(ns, rep) for ns in noise_stds for rep in range(repeats)]
    if workers > 1:
        # reference pattern: mp.Pool(3).apply_async per experiment
        # (synthetic_benchmark/grid_search.py:76-95)
        ctx = mp.get_context("spawn")
        results = []
        with ctx.Pool(workers, initializer=_pool_init) as pool:
            handles = [
                pool.apply_async(run_experiment, (ns, rep, run_base))
                for ns, rep in jobs
            ]
            for h in handles:
                results.append(h.get())
    else:
        results = [run_experiment(ns, rep, run_base) for ns, rep in jobs]
    results.sort(key=lambda r: r[0])
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
    # matplotlib >=3.9 renamed labels= to tick_labels=; set ticks directly
    ax.boxplot([by_noise[k] for k in keys])
    ax.set_xticks(range(1, len(keys) + 1), [str(k) for k in keys])
    ax.set_xlabel("noise_std")
    ax.set_ylabel("max test accuracy")
    ax.set_title("XOR grid search")
    fig.savefig(os.path.join(run_base, "grid_search_boxplot.png"),
                bbox_inches="tight", facecolor="white")
    plt.close(fig)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--workers", type=int, default=0,
                   help="process-pool size (reference used mp.Pool(3)); "
                        "0/1 = sequential")
    a = p.parse_args()
    controller(repeats=a.repeats, workers=a.workers)
