"""Seed-ensemble evaluation of the recommended hybrid recipe.

Trains K independent seeds of the plain-stack hybrid (raw_residual=gcn2,
tfidf S=40, precomputed scaler, best-val selection — the 0.857 +- 0.005
recipe) and evaluates the ENSEMBLE: per-seed 8-draw mean log-probs,
averaged across seeds, argmax. Model ensembling is a framework extension
the reference has no analogue for (it evaluates one stochastic draw of
one model); K x training cost, reported as its own row.
"""
import argparse
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "experiments")

import numpy as np

from common import cora_graph  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig  # noqa: E402
from ampnet_tpu.models import AMPGCN  # noqa: E402
from ampnet_tpu.ops.tokenize import fit_scaler  # noqa: E402
from ampnet_tpu.train.loop import train_full_batch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--eval-draws", type=int, default=8)
    args = ap.parse_args()

    d, full_g = cora_graph()
    scaler_stats = fit_scaler(np.asarray(d.x))
    cfg = AMPGCNConfig(
        num_sampled_vectors=40, token_sampling="tfidf", scaler="precomputed",
        dropout_rate=0.3, dropout_adj_rate=0.1, raw_residual="gcn2",
    )
    model = AMPGCN(cfg, scaler_stats=scaler_stats)

    members = []
    for seed in args.seeds:
        t0 = time.time()
        tcfg = TrainConfig(
            learning_rate=3e-3, weight_decay=1e-3, epochs=args.epochs,
            cosine_t0=None, grad_clip=1.0, select_best_every=10,
            num_eval_samples=8, checkpoint_every=0, seed=seed,
        )
        res = train_full_batch(model, full_g, tcfg, eval_graph=full_g)
        fm = res["final_metrics"]
        members.append((seed, res["final_params"], fm))
        print(f"[{time.time()-t0:6.1f}s] seed {seed}: "
              f"val {fm.get('val_acc', float('nan')):.4f} "
              f"test {fm.get('test_acc', float('nan')):.4f}", flush=True)

    @jax.jit
    def logprobs(params, key):
        out = model.apply({"params": params}, full_g, deterministic=True,
                          return_aux=False, rngs={"sample": key})
        return out.logits  # log-probs

    def ensemble_acc(mask_name):
        mask = np.asarray(getattr(full_g, mask_name)) & np.asarray(full_g.node_mask)
        acc_input = None
        for seed, params, _ in members:
            draws = jnp.stack([
                logprobs(params, jax.random.PRNGKey(seed * 1000 + i))
                for i in range(args.eval_draws)
            ])
            mean_lp = jnp.mean(draws, axis=0)
            acc_input = mean_lp if acc_input is None else acc_input + mean_lp
        pred = np.asarray(jnp.argmax(acc_input, axis=-1))
        y = np.asarray(full_g.y)
        return float((pred[mask] == y[mask]).mean())

    va, ta = ensemble_acc("val_mask"), ensemble_acc("test_mask")
    singles = [m[2].get("test_acc", float("nan")) for m in members]
    print(f"\nensemble of {len(members)} seeds (best-val params): "
          f"val {va:.4f} test {ta:.4f}")
    print(f"single-model (best-val-selected) tests: "
          f"{['%.4f' % s for s in singles]}")


if __name__ == "__main__":
    main()
