"""Multi-epoch scan dispatch (train/state.py::make_scan_train_step,
TrainConfig.epochs_per_dispatch): k optimizer steps folded into one
jitted lax.scan must be step-for-step identical to the eager loop —
same PRNG stream, same params, same per-epoch metric rows. The
reference's torch loop is eager per-step (cora_benchmark_full.py); the
scan dispatch is a framework addition that amortizes per-dispatch host
overhead (r5 step decomposition: ~3.8 ms/step through the relay)."""
import dataclasses

import jax
import numpy as np
import pytest

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig
from ampnet_tpu.data.synthetic import get_xor_graphs
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import (
    create_train_state,
    make_optimizer,
    make_scan_train_step,
    make_train_step,
    train_full_batch,
)


def _tiny():
    train_g, _ = get_xor_graphs(num_train_samples=16, num_test_samples=8, seed=0)
    cfg = AMPGCNConfig(
        embedding_dim=16, num_heads=2, num_node_features=2,
        num_sampled_vectors=8, output_dim=2, feat_emb_dim=15, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    )
    return AMPGCN(config=cfg), train_g


def test_scan_step_matches_k_eager_steps():
    model, g = _tiny()
    tx = make_optimizer(1e-3)
    k = 4

    s_eager = create_train_state(model, g, tx, seed=3)
    step = make_train_step(model, loss_mode="full")
    eager_metrics = []
    for _ in range(k):
        s_eager, m = step(s_eager, g)
        eager_metrics.append({kk: float(v) for kk, v in m.items()})

    s_scan = create_train_state(model, g, tx, seed=3)
    multi = make_scan_train_step(model, loss_mode="full", num_steps=k)
    s_scan, stacked = multi(s_scan, g)

    # identical param trajectory (same split_rngs stream inside scan)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        s_eager.params, s_scan.params,
    )
    assert int(s_scan.step) == k
    # metric leaves stacked [k], one row per step, matching eager rows
    for i, row in enumerate(eager_metrics):
        for kk, v in row.items():
            np.testing.assert_allclose(
                float(stacked[kk][i]), v, rtol=1e-5, atol=1e-6,
                err_msg=f"step {i} metric {kk}",
            )


@pytest.mark.parametrize("k", [3, 5])
def test_train_full_batch_epochs_per_dispatch_parity(k):
    """7 epochs with epochs_per_dispatch=k (non-dividing -> scan chunks +
    eager tail) reproduces the eager loop's history exactly."""
    model, g = _tiny()
    base = TrainConfig(learning_rate=1e-3, weight_decay=0.0, epochs=7,
                       cosine_t0=None, log_every=100)

    r_eager = train_full_batch(model, g, base)
    r_scan = train_full_batch(
        model, g, dataclasses.replace(base, epochs_per_dispatch=k)
    )

    assert [h["epoch"] for h in r_scan["history"]] == list(range(7))
    for he, hs in zip(r_eager["history"], r_scan["history"]):
        np.testing.assert_allclose(hs["loss"], he["loss"], rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(hs["train_acc"], he["train_acc"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        r_eager["state"].params, r_scan["state"].params,
    )


def test_epochs_per_dispatch_respects_eval_cadence(tmp_path):
    """select_best_every=2 with k=4 must still evaluate at epochs 2,4,6:
    k is clipped to the cadence gcd so boundaries align."""
    model, g = _tiny()
    # the XOR train graph carries only a train mask; select on it as a
    # stand-in val so the cadence machinery runs
    g = g.replace(val_mask=g.train_mask)
    base = dict(learning_rate=1e-3, weight_decay=0.0, epochs=6,
                cosine_t0=None, log_every=100, select_best_every=2)
    r_eager = train_full_batch(model, g, TrainConfig(**base))
    r_scan = train_full_batch(
        model, g, TrainConfig(**base, epochs_per_dispatch=4)
    )
    np.testing.assert_allclose(
        r_scan["final_metrics"]["val_acc"], r_eager["final_metrics"]["val_acc"]
    )
    for he, hs in zip(r_eager["history"], r_scan["history"]):
        np.testing.assert_allclose(hs["loss"], he["loss"], rtol=1e-5,
                                   atol=1e-6)
