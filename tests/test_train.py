"""Training integration: XOR learnability (the reference's de-facto
integration test — SURVEY §4.2), losses, checkpointing."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig
from ampnet_tpu.data.synthetic import get_xor_graphs
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import (
    create_train_state,
    load_checkpoint,
    make_optimizer,
    make_train_step,
    masked_accuracy,
    masked_mean_nll,
    nll_loss,
    saint_weighted_nll,
    save_checkpoint,
    train_full_batch,
)


def test_nll_losses_match_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    logp = np.log(rng.dirichlet(np.ones(5), size=12)).astype(np.float32)
    y = rng.integers(0, 5, 12)
    ours = np.asarray(nll_loss(jnp.asarray(logp), jnp.asarray(y)))
    theirs = F.nll_loss(torch.from_numpy(logp), torch.from_numpy(y), reduction="none").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)

    mask = rng.random(12) < 0.5
    ours_m = float(masked_mean_nll(jnp.asarray(logp), jnp.asarray(y), jnp.asarray(mask)))
    np.testing.assert_allclose(ours_m, theirs[mask].mean(), rtol=1e-5)

    norm = rng.random(12).astype(np.float32)
    ours_s = float(saint_weighted_nll(jnp.asarray(logp), jnp.asarray(y), jnp.asarray(norm), jnp.asarray(mask)))
    np.testing.assert_allclose(ours_s, (theirs * norm)[mask].sum(), rtol=1e-5)


def xor_cfg(feature_repeats=5):
    # XOR ablation matrix: S=20 tokens, D=32 converges
    # (notes_scaling_to_cora_size.txt, SURVEY §6)
    return AMPGCNConfig(
        embedding_dim=16, num_heads=2, num_node_features=2 * feature_repeats,
        num_sampled_vectors=8, output_dim=2, feat_emb_dim=15, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    )


@pytest.mark.slow
def test_xor_integration_reaches_high_accuracy():
    """AMPNet must learn fuzzy XOR (reference expects 100% train acc)."""
    train_g, _ = get_xor_graphs(num_train_samples=80, num_test_samples=16, noise_std=0.2, seed=3)
    cfg = AMPGCNConfig(
        embedding_dim=16, num_heads=2, num_node_features=2,
        num_sampled_vectors=8, output_dim=2, feat_emb_dim=15, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    )
    model = AMPGCN(config=cfg)
    tcfg = TrainConfig(learning_rate=5e-3, weight_decay=0.0, epochs=150,
                       cosine_t0=None, grad_clip=1.0, log_every=50)
    result = train_full_batch(model, train_g, tcfg)
    accs = [h["train_acc"] for h in result["history"][-10:]]
    assert max(accs) > 0.85, f"XOR did not converge: {accs}"


def test_checkpoint_roundtrip(tmp_path, rng):
    train_g, _ = get_xor_graphs(num_train_samples=16, num_test_samples=8, seed=0)
    cfg = xor_cfg(1)
    model = AMPGCN(config=cfg)
    tx = make_optimizer(1e-3)
    state = create_train_state(model, train_g, tx, seed=0)
    step = make_train_step(model, loss_mode="full")
    state, _ = step(state, train_g)

    path = str(tmp_path / "ckpt.pkl")
    save_checkpoint(path, state, epoch=0, validation_loss=1.23)
    template = create_train_state(model, train_g, tx, seed=99)
    restored = load_checkpoint(path, template)
    assert restored["epoch"] == 0
    assert restored["validation_loss"] == 1.23
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b),
        state.params, restored["state"].params,
    )
    assert int(restored["state"].step) == 1


def test_saint_mean_loss_is_o1_scale_and_ratio_preserving(rng):
    """The stabilized SAINT loss: same relative node weighting as the
    reference's weighted sum, but O(1) magnitude so torch-style L2 weight
    decay cannot dominate the update direction (r2 diagnosis)."""
    from ampnet_tpu.train import saint_weighted_mean_nll

    n, c = 64, 7
    logp = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(n, c))), -1)
    y = jnp.asarray(rng.integers(0, c, n))
    norm = jnp.asarray(rng.uniform(1e-4, 1e-2, n).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=n) < 0.5)

    s = saint_weighted_nll(logp, y, norm, mask)
    m = saint_weighted_mean_nll(logp, y, norm, mask)
    # mean = sum / total weight — exact relationship
    total_w = float(jnp.sum(norm * mask))
    assert np.isclose(float(m), float(s) / total_w, rtol=1e-5)
    # O(1) scale: for ~ln(7) per-node NLL, the mean stays near ln(7)
    assert 0.5 < float(m) < 5.0
    # scaling ALL weights leaves the mean invariant (only ratios matter)
    m2 = saint_weighted_mean_nll(logp, y, norm * 123.0, mask)
    assert np.isclose(float(m), float(m2), rtol=1e-5)


def test_fit_scaler_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn")
    from sklearn.preprocessing import StandardScaler

    from ampnet_tpu.ops.tokenize import fit_scaler, standardize

    x = (rng.uniform(size=(40, 9)) < 0.2).astype(np.float32)
    x[:, 0] = 0.0  # zero-variance column
    mean, std = fit_scaler(x)
    ref = StandardScaler().fit(x)
    np.testing.assert_allclose(mean, ref.mean_, rtol=1e-6)
    np.testing.assert_allclose(
        standardize(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(std)),
        ref.transform(x), rtol=1e-5, atol=1e-6)


def test_precomputed_scaler_consistent_between_subgraph_and_full(rng):
    """With dataset-level scaler stats, a node's normalized features are
    IDENTICAL whether it appears in a subgraph batch or the full graph —
    the property that makes GraphSAINT training transfer to full-graph
    eval (refit-per-batch, the reference's behavior, breaks it)."""
    from ampnet_tpu.core.graph import from_arrays
    from ampnet_tpu.models.classifiers import GCN
    from ampnet_tpu.ops.tokenize import fit_scaler

    n, f = 30, 12
    x = (rng.uniform(size=(n, f)) < 0.3).astype(np.float32)
    # edge-free graphs (GCN adds self-loops): each node's logits depend
    # only on its own normalized features, isolating the scaler property
    no_edges = np.empty((2, 0), dtype=np.int64)
    stats = fit_scaler(x)
    model = GCN(num_node_features=f, feat_emb_dim=5, val_emb_dim=1,
                output_dim=3, scaler_stats=stats)
    full = from_arrays(x, no_edges)
    params = model.init(jax.random.PRNGKey(0), full)["params"]

    sub = from_arrays(x[:10], no_edges)
    out_full = model.apply({"params": params}, full).logits
    out_sub = model.apply({"params": params}, sub).logits
    np.testing.assert_allclose(
        np.asarray(out_sub)[:10], np.asarray(out_full)[:10],
        rtol=1e-4, atol=1e-5)

    # and WITHOUT stats (reference refit-per-batch), the same comparison
    # breaks — the quirk the stabilized recipe removes
    model_b = GCN(num_node_features=f, feat_emb_dim=5, val_emb_dim=1,
                  output_dim=3)
    params_b = model_b.init(jax.random.PRNGKey(0), full)["params"]
    d_full = model_b.apply({"params": params_b}, full).logits
    d_sub = model_b.apply({"params": params_b}, sub).logits
    assert not np.allclose(np.asarray(d_sub)[:10], np.asarray(d_full)[:10],
                           rtol=1e-4, atol=1e-5)


def test_xor_hybrid_raw_residual_trains():
    """The hybrid raw-residual head trains end-to-end through the full
    loop (optimizer, eval, best-val selection) and still learns XOR."""
    import dataclasses

    train_g, _ = get_xor_graphs(num_train_samples=80, num_test_samples=16, noise_std=0.2, seed=3)
    cfg = AMPGCNConfig(
        embedding_dim=16, num_heads=2, num_node_features=2,
        num_sampled_vectors=8, output_dim=2, feat_emb_dim=15, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0, raw_residual="gcn2",
    )
    model = AMPGCN(config=cfg)
    tcfg = TrainConfig(learning_rate=5e-3, weight_decay=0.0, epochs=120,
                       cosine_t0=None, grad_clip=1.0, log_every=50)
    result = train_full_batch(model, train_g, tcfg)
    accs = [h["train_acc"] for h in result["history"][-10:]]
    assert max(accs) > 0.85, f"hybrid XOR did not converge: {accs}"


def test_profile_steps_writes_trace(tmp_path):
    """TrainConfig.profile_steps captures a bounded jax.profiler trace
    under <run_dir>/profile (SURVEY §5.1: the reference has none)."""
    train_g, _ = get_xor_graphs(num_train_samples=16, num_test_samples=8, seed=0)
    cfg = AMPGCNConfig(
        embedding_dim=16, num_heads=2, num_node_features=2,
        num_sampled_vectors=2, output_dim=2, feat_emb_dim=15, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    )
    model = AMPGCN(config=cfg)
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    tcfg = TrainConfig(learning_rate=1e-3, weight_decay=0.0, epochs=4,
                       cosine_t0=None, log_every=10, checkpoint_every=0,
                       run_dir=run_dir, profile_steps=2)
    train_full_batch(model, train_g, tcfg)
    pdir = os.path.join(run_dir, "profile")
    traces = [os.path.join(r, f) for r, _, fs in os.walk(pdir) for f in fs]
    assert traces, "no profiler trace written"
