"""Full-batch Cora training — mirrors experiments/cora_benchmark_full.py:
whole-graph forward, masked mean NLL, Adam lr=3e-3 wd=5e-4, 150 epochs,
final test accuracy (:97-102)."""
import argparse

from common import cora_graph

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig
from ampnet_tpu.interpret.curves import plot_history
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import Logfile, create_run_dir, train_full_batch


def main(epochs=150, run_base="runs"):
    _, g = cora_graph()
    cfg = AMPGCNConfig(
        embedding_dim=128, num_heads=4, num_node_features=1433,
        num_sampled_vectors=20, output_dim=7, feat_emb_dim=127, val_emb_dim=1,
    )
    model = AMPGCN(config=cfg)
    run_dir = create_run_dir(run_base, details="cora full batch")
    tcfg = TrainConfig(
        learning_rate=3e-3, weight_decay=5e-4, epochs=epochs,
        cosine_t0=None, checkpoint_every=10, run_dir=run_dir, log_every=10,
    )
    log = Logfile(f"{run_dir}/_details.txt")
    result = train_full_batch(model, g, tcfg, log=log)
    plot_history(result["history"], run_dir)
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=150)
    a = p.parse_args()
    main(a.epochs)
