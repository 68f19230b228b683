"""RPG/RGB dataset generator driver — mirrors the argparse config of
synthetic_benchmark/synthetic_rgb.py:153-175: emit train/valid/test splits
of random-partition community graphs with RGB node features."""
import argparse
import os
import pickle

import numpy as np

from common import *  # noqa: F401,F403

from ampnet_tpu.data.synthetic import random_partition_graph, rpg_rgb_features


def parse_args():
    p = argparse.ArgumentParser(description="Synthetic RGB Random Partition Graph Datasets")
    p.add_argument("-D", "--dataset", type=str, default="Colors")
    p.add_argument("-o", "--out_dir", type=str, default="./data/synthetic_RGB")
    p.add_argument("--RGB_train", type=int, default=100)
    p.add_argument("--RGB_valid", type=int, default=300)
    p.add_argument("--RGB_test", type=int, default=300)
    p.add_argument("--Nodes_min", type=int, default=3)
    p.add_argument("--Nodes_max", type=int, default=10)
    p.add_argument("--Homophily_min", type=float, default=0.5)
    p.add_argument("--Homophily_max", type=float, default=0.9)
    p.add_argument("--Heterophily_min", type=float, default=0.1)
    p.add_argument("--Heterophily_max", type=float, default=0.5)
    p.add_argument("--dim", type=int, default=3)
    p.add_argument("--Max_index", type=int, default=255)
    p.add_argument("--seed", type=int, default=111)
    return p.parse_args()


def generate_split(n_graphs, args, rng):
    graphs = []
    for _ in range(n_graphs):
        nv = int(rng.integers(args.Nodes_min, args.Nodes_max + 1))
        hom = rng.uniform(args.Homophily_min, args.Homophily_max)
        het = rng.uniform(args.Heterophily_min, args.Heterophily_max)
        adj, labels = random_partition_graph(args.dim, nv, hom, het, rng)
        feats = rpg_rgb_features(adj, args.dim, nv, args.Max_index)
        graphs.append({"adj": adj, "labels": labels, "features": feats})
    return graphs


def main():
    args = parse_args()
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    for split, n in [("train", args.RGB_train), ("valid", args.RGB_valid), ("test", args.RGB_test)]:
        graphs = generate_split(n, args, rng)
        path = os.path.join(args.out_dir, f"{args.dataset}_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump(graphs, f)
        print(f"wrote {n} graphs -> {path}")


if __name__ == "__main__":
    main()
