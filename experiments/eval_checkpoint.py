"""Evaluate a saved checkpoint on the full graph.

The reference's eval-time reload lives inside its visualizers
(experiments/visualize_cora_attn_coeffs.py:200-211: torch.load +
load_state_dict + full-graph forward); here it is a first-class CLI —
point it at a run dir (uses checkpoint_best.pkl, else the newest
checkpoint_ep*.pkl) or a checkpoint file, give the model flags the run
used, and it prints val/test accuracy under the ensemble eval protocol.

Also the recovery path when a long run wedges mid-stream (see
ROADMAP.md environment notes): best-val params are banked as
checkpoint_best.pkl every eval, so the selected model survives a kill.

Example:
    python experiments/eval_checkpoint.py runs/2026-08-17-22_41_05 \
        --stabilized --raw-residual gcn2 --fused
"""
import argparse
import glob
import os
import re
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "experiments")

import numpy as np

from common import cora_graph  # noqa: E402


def find_checkpoint(path: str) -> str:
    if os.path.isfile(path):
        return path
    best = os.path.join(path, "checkpoint_best.pkl")
    if os.path.exists(best):
        return best
    cands = glob.glob(os.path.join(path, "checkpoint_ep*.pkl"))
    cands += glob.glob(os.path.join(path, "checkpoint_final.pkl"))
    if not cands:
        raise FileNotFoundError(f"no checkpoints under {path}")

    def ep(p):
        m = re.search(r"ep(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else 10**9  # final sorts last

    return sorted(cands, key=ep)[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="run dir or checkpoint file")
    ap.add_argument("--stabilized", action="store_true",
                    help="model flags of the stabilized recipe "
                         "(tfidf S=40, precomputed scaler)")
    ap.add_argument("--raw-residual", type=str, default="",
                    help="'' | mlp | gcn | gcn2 (must match the run)")
    ap.add_argument("--fused", action="store_true",
                    help="use_pallas model flag (must match the run)")
    ap.add_argument("--transformer-block", action="store_true")
    ap.add_argument("--ensemble", type=int, default=8,
                    help="token-sampling draws averaged at eval")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (this environment's "
                         "sitecustomize pins the TPU plugin, so "
                         "JAX_PLATFORMS=cpu alone is not honored) — the "
                         "fallback when the TPU tunnel is wedged")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ampnet_tpu.core.config import AMPGCNConfig
    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.ops.tokenize import fit_scaler
    from ampnet_tpu.train.checkpoint import load_checkpoint_params
    from ampnet_tpu.train.loop import make_eval_step
    from ampnet_tpu.train.optim import make_optimizer
    from ampnet_tpu.train.state import create_train_state

    ckpt = find_checkpoint(args.path)
    print(f"checkpoint: {ckpt}", flush=True)

    d, full_g = cora_graph()
    stats = fit_scaler(np.asarray(d.x)) if args.stabilized else None
    cfg = AMPGCNConfig(
        embedding_dim=128, num_heads=4, num_node_features=1433,
        num_sampled_vectors=40 if args.stabilized else 20,
        output_dim=7, feat_emb_dim=127, val_emb_dim=1,
        token_sampling="tfidf" if args.stabilized else "uniform",
        scaler="precomputed" if args.stabilized else "batch",
        dropout_adj_rate=0.0 if args.fused else 0.1,
        use_pallas=args.fused,
        transformer_block=args.transformer_block,
        raw_residual=args.raw_residual or False,
    )
    model = AMPGCN(config=cfg, scaler_stats=stats)
    tx = make_optimizer(3e-3, weight_decay=5e-4, cosine_t0=None, grad_clip=1.0)
    state = create_train_state(model, full_g, tx, seed=args.seed)
    params = load_checkpoint_params(ckpt, state.params)
    ev = make_eval_step(model, num_eval_samples=args.ensemble)
    m = ev(params, full_g, jax.random.PRNGKey(args.seed + 999))
    print(f"val acc {float(m['val_acc']):.4f} | "
          f"test acc {float(m['test_acc']):.4f}")


if __name__ == "__main__":
    main()
