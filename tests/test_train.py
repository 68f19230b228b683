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
