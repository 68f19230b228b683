"""SSL transfer measurement (VERDICT r2 #5): give the SSL heads a real
number, not just a unit test.

The reference intended SSL pretraining as a training harness but shipped
`criterion = None` stubs (synthetic_benchmark/contrastive_ssl_AMPNet.py:79,
intent transcribed in comments :14-49). ampnet_tpu.train.ssl implements
both heads for real; this driver measures whether pretraining actually
HELPS downstream classification on surrogate Cora, per seed:

  scratch       tuned full-batch recipe from random init (the RESULTS.md
                0.760 tokens-only recipe: tfidf S=40, precomputed scaler)
  ft-<mode>     SSL pretrain --pretrain-epochs -> finetune ALL params with
                the identical recipe (head stays at its fresh random init)
  probe-<mode>  SSL pretrain -> LINEAR PROBE: freeze everything except
                final_linear_out (optax.multi_transform, the
                ampnet_freeze_check pattern)
  probe-rand    linear probe on the RANDOM backbone (control separating
                "SSL features" from "any frozen random features")

All arms share the seed-matched downstream TrainConfig (Adam lr=3e-3
wd=5e-4 grad_clip=1.0, 150 epochs, best-val selection every 10, 8-sample
eval ensemble — experiments/cora_benchmark_full.py --tuned). Prints one
summary table; paste the means into RESULTS.md.
"""
import argparse
import json

import jax
import numpy as np
import optax

from common import cora_graph

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.ops.tokenize import fit_scaler
from ampnet_tpu.train import create_train_state, train_full_batch
from ampnet_tpu.train.optim import make_optimizer
from ampnet_tpu.train.ssl import SSLPretrainer, make_ssl_train_step
from ampnet_tpu.train.state import TrainState


def build_model(d, hybrid=False):
    cfg = AMPGCNConfig(
        num_sampled_vectors=40, token_sampling="tfidf",
        scaler="precomputed",
        dropout_rate=0.3 if hybrid else 0.1,
        dropout_adj_rate=0.1 if hybrid else 0.0,
        raw_residual="gcn2" if hybrid else False,
    )
    return AMPGCN(config=cfg, scaler_stats=fit_scaler(np.asarray(d.x)))


def pretrain_backbone(model, g, mode, epochs, seed, log_every=50):
    ssl = SSLPretrainer(backbone=model, mode=mode,
                        num_features=int(g.x.shape[1]))
    rngs = {k: jax.random.PRNGKey(seed) for k in
            ("params", "sample", "dropout", "edges", "negatives")}
    variables = ssl.init(rngs, g, deterministic=True)
    state = TrainState.create(
        apply_fn=ssl.apply, params=variables["params"],
        tx=make_optimizer(1e-3, grad_clip=1.0),
        rng=jax.random.PRNGKey(seed + 1),
    )
    step = make_ssl_train_step(ssl)
    first = last = None
    for epoch in range(epochs):
        state, metrics = step(state, g)
        loss = float(metrics["loss"])
        first = loss if first is None else first
        last = loss
        if epoch % log_every == 0:
            print(f"  [{mode} pretrain] epoch {epoch:4d} loss {loss:.4f}",
                  flush=True)
    print(f"  [{mode} pretrain] loss {first:.4f} -> {last:.4f}", flush=True)
    return state.params["backbone"]


def downstream_cfg(seed, epochs, weight_decay=5e-4):
    return TrainConfig(
        learning_rate=3e-3, weight_decay=weight_decay, epochs=epochs,
        cosine_t0=None, grad_clip=1.0, seed=seed,
        select_best_every=10, num_eval_samples=8,
        checkpoint_every=0, run_dir=None, log_every=50,
    )


def transfer(fresh_params, backbone_params):
    """Backbone params from SSL, classification head from the fresh init
    (the head never receives gradient during pretraining)."""
    return {k: (fresh_params[k] if k == "final_linear_out" else backbone_params[k])
            for k in fresh_params}


def probe_tx():
    def label_fn(params):
        return {k: ("train" if k == "final_linear_out" else "freeze")
                for k in params}
    return optax.multi_transform(
        {"train": make_optimizer(3e-3, weight_decay=5e-4, grad_clip=1.0),
         "freeze": optax.set_to_zero()}, label_fn)


def run_arm(model, g, cfg, params, tx, seed):
    # the jitted train step donates the state, so each arm gets its own copy
    params = jax.tree_util.tree_map(lambda a: a.copy(), params)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                              rng=jax.random.PRNGKey(seed + 2))
    res = train_full_batch(model, g, cfg, state=state)
    return float(res["final_metrics"]["test_acc"])


def main(seeds, pretrain_epochs, epochs, modes, hybrid=False, probes=True):
    d, g = cora_graph()
    results = {}
    for seed in seeds:
        model = build_model(d, hybrid=hybrid)
        cfg = downstream_cfg(seed, epochs,
                             weight_decay=1e-3 if hybrid else 5e-4)
        full_tx = make_optimizer(cfg.learning_rate, weight_decay=cfg.weight_decay,
                                 grad_clip=cfg.grad_clip)
        fresh = create_train_state(model, g, full_tx, seed=seed).params

        def record(arm, acc):
            results.setdefault(arm, []).append(acc)
            print(f"== seed {seed} {arm}: test acc {acc:.4f}", flush=True)

        record("scratch", run_arm(model, g, cfg, fresh, full_tx, seed))
        if probes:
            record("probe-rand", run_arm(model, g, cfg, fresh, probe_tx(), seed))
        for mode in modes:
            bb = pretrain_backbone(model, g, mode, pretrain_epochs, seed)
            pre = transfer(fresh, bb)
            record(f"ft-{mode}", run_arm(model, g, cfg, pre, full_tx, seed))
            if probes:
                record(f"probe-{mode}", run_arm(model, g, cfg, pre, probe_tx(), seed))

    print("\n=== SSL transfer summary (test acc, mean +/- std over seeds) ===")
    summary = {}
    for arm, accs in results.items():
        summary[arm] = {"mean": float(np.mean(accs)), "std": float(np.std(accs)),
                        "accs": accs}
        print(f"{arm:18s} {np.mean(accs):.4f} +/- {np.std(accs):.4f}  {accs}")
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--pretrain-epochs", type=int, default=300)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--modes", nargs="+",
                   default=["contrastive", "predictive"])
    p.add_argument("--hybrid", action="store_true",
                   help="downstream = the hybrid raw-residual recipe "
                        "(drop 0.3/adj 0.1/wd 1e-3, raw_residual=gcn2)")
    p.add_argument("--no-probes", action="store_true")
    a = p.parse_args()
    main(a.seeds, a.pretrain_epochs, a.epochs, a.modes, hybrid=a.hybrid,
         probes=not a.no_probes)
