"""SSL heads: loss sanity + training smoke (the reference's SSL scripts
were criterion=None stubs — SURVEY §2.4)."""
import jax
import jax.numpy as jnp
import numpy as np

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.core.graph import from_arrays
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train.optim import make_optimizer
from ampnet_tpu.train.ssl import SSLPretrainer, make_ssl_train_step, skipgram_loss
from ampnet_tpu.train.state import TrainState


def tiny_graph(rng, n=12, e=40, f=16):
    x = (rng.random((n, f)) < 0.4).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    return from_arrays(x, ei, y=rng.integers(0, 2, n))


def test_skipgram_loss_prefers_aligned_embeddings():
    # positive pairs aligned (z_v = z_u) must beat anti-aligned (z_v = -z_u),
    # negatives held statistically identical
    rng_ = np.random.default_rng(0)
    base = rng_.normal(size=(4, 8)).astype(np.float32)
    z_good = jnp.asarray(np.concatenate([base, base]))
    z_bad = jnp.asarray(np.concatenate([base, -base]))
    senders = jnp.asarray([0, 1, 2, 3])
    receivers = jnp.asarray([4, 5, 6, 7])
    mask = jnp.ones(4, bool)
    key = jax.random.PRNGKey(0)
    good = float(skipgram_loss(z_good, senders, receivers, mask, key))
    bad = float(skipgram_loss(z_bad, senders, receivers, mask, key))
    assert good < bad


def _pretrain(rng, mode, f=16):
    g = tiny_graph(rng, f=f)
    backbone = AMPGCN(config=AMPGCNConfig(
        embedding_dim=8, num_heads=2, num_node_features=f,
        num_sampled_vectors=4, output_dim=2, feat_emb_dim=7, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    ))
    model = SSLPretrainer(backbone=backbone, mode=mode, num_features=f)
    k = jax.random.PRNGKey(0)
    rngs = {n: k for n in ("params", "sample", "dropout", "edges", "negatives")}
    variables = model.init(rngs, g, deterministic=True)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(1e-2), rng=jax.random.PRNGKey(1),
    )
    step = make_ssl_train_step(model)
    losses = []
    for _ in range(15):
        state, m = step(state, g)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[5:]) < losses[0]  # optimizing something real
    return losses


def test_contrastive_pretraining_decreases_loss(rng):
    _pretrain(rng, "contrastive")


def test_predictive_pretraining_decreases_loss(rng):
    _pretrain(rng, "predictive")
