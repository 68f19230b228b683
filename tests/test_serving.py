"""Predictor: bucketed executables, hot-swap, node-only outputs."""
import jax
import numpy as np

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.core.graph import from_arrays
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.serving import Predictor

CFG = AMPGCNConfig(
    embedding_dim=8, num_heads=2, num_node_features=24, num_sampled_vectors=6,
    output_dim=3, feat_emb_dim=7, val_emb_dim=1,
    dropout_rate=0.0, dropout_adj_rate=0.0,
)


def make_inputs(rng, n=10, e=30, f=24):
    x = (rng.random((n, f)) < 0.3).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    return x, ei


def test_predictor(rng, tmp_path):
    x, ei = make_inputs(rng)
    g = from_arrays(x, ei)
    model = AMPGCN(config=CFG)
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "sample": k, "dropout": k, "edges": k}, g)["params"]
    pred = Predictor(model, params, bucket_nodes=32, bucket_edges=64)

    out = pred.predict(x, ei, key=jax.random.PRNGKey(1))
    assert out.shape == (10, 3)
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, rtol=1e-4)

    # same bucket -> one cached executable
    x2, ei2 = make_inputs(rng, n=12, e=40)
    pred.predict(x2, ei2)
    assert len(pred._fns) == 1

    # deterministic given a key
    a = pred.predict(x, ei, key=jax.random.PRNGKey(5))
    b = pred.predict(x, ei, key=jax.random.PRNGKey(5))
    np.testing.assert_allclose(a, b)

    # hot swap from a checkpoint with different params changes outputs
    from ampnet_tpu.train import create_train_state, make_optimizer, make_train_step, save_checkpoint

    state = create_train_state(model, g, make_optimizer(1e-2), seed=7)
    step = make_train_step(model, loss_mode="full")
    g_train = from_arrays(x, ei, y=rng.integers(0, 3, 10), train_mask=np.ones(10, bool))
    state, _ = step(state, g_train)
    path = str(tmp_path / "ck.pkl")
    save_checkpoint(path, state, epoch=0)
    pred.load_params(path)
    c = pred.predict(x, ei, key=jax.random.PRNGKey(5))
    assert not np.allclose(a, c)
