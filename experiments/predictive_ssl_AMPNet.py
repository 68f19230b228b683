"""Predictive SSL pretraining — the reference's predictive_ssl_AMPNet.py
is byte-identical to the contrastive stub (criterion=None); here it runs
the masked-feature predictive head (ampnet_tpu/train/ssl.py)."""
import argparse

from contrastive_ssl_AMPNet import train_model

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=100)
    a = p.parse_args()
    train_model(a.epochs, mode="predictive")
