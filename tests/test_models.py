"""Model forward/backward shape and semantics tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.core.graph import from_arrays
from ampnet_tpu.models import (
    AMPGCN,
    AMPNetClassifier,
    GCN,
    GCNOneLayer,
    LinearLayer,
    TwoLayerSigmoid,
    get_model,
)
from ampnet_tpu.ops.tokenize import pca_feature_embedding


def tiny_graph(rng, n=10, e=30, f=24):
    x = (rng.random((n, f)) < 0.3).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0  # no empty nodes
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    y = rng.integers(0, 3, n)
    return from_arrays(x, ei, y=y, train_mask=np.ones(n, bool), test_mask=np.ones(n, bool))


CFG = AMPGCNConfig(
    embedding_dim=8, num_heads=2, num_node_features=24, num_sampled_vectors=6,
    output_dim=3, feat_emb_dim=7, val_emb_dim=1,
)


def init_rngs(seed=0):
    k = jax.random.PRNGKey(seed)
    return {"params": k, "sample": k, "dropout": k, "edges": k}


def test_ampgcn_forward_shapes(rng):
    g = tiny_graph(rng)
    model = AMPGCN(config=CFG)
    variables = model.init(init_rngs(), g, deterministic=True)
    out = model.apply(variables, g, deterministic=True, rngs={"sample": jax.random.PRNGKey(1)})
    n_pad = g.num_nodes_padded
    assert out.logits.shape == (n_pad, 3)
    # log_softmax rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(out.logits).sum(-1), 1.0, rtol=1e-4)
    assert out.aux["sampled_idx"].shape == (n_pad, 6)
    e_pad = g.num_edges_padded
    assert out.aux["attn_weights_1"].shape == (e_pad, 6, 6)
    assert out.aux["conv1_embedding"].shape == (n_pad, 6, 8)
    # softmax attention rows sum to one
    np.testing.assert_allclose(
        np.asarray(out.aux["attn_weights_1"]).sum(-1), 1.0, rtol=1e-4
    )


def test_ampgcn_train_mode_stochastic(rng):
    g = tiny_graph(rng)
    model = AMPGCN(config=CFG)
    variables = model.init(init_rngs(), g, deterministic=True)

    def run(seed):
        ks = {k: jax.random.PRNGKey(seed) for k in ("sample", "dropout", "edges")}
        return model.apply(variables, g, deterministic=False, return_aux=False, rngs=ks).logits

    a, b = run(1), run(2)
    assert not np.allclose(a, b)  # dropout + resampling differ per key
    np.testing.assert_allclose(run(3), run(3))  # same key deterministic


def test_ampgcn_fixed_sampled_idx_override(rng):
    """Parity fixture hook (SURVEY §7.4): injecting sampled indices makes the
    deterministic forward a pure function of params."""
    g = tiny_graph(rng)
    model = AMPGCN(config=CFG)
    variables = model.init(init_rngs(), g, deterministic=True)
    idx = jnp.zeros((g.num_nodes_padded, 6), jnp.int32)
    a = model.apply(variables, g, deterministic=True, sampled_idx=idx, return_aux=False)
    b = model.apply(variables, g, deterministic=True, sampled_idx=idx, return_aux=False)
    np.testing.assert_allclose(a.logits, b.logits)


def test_ampgcn_cls_token_mode(rng):
    g = tiny_graph(rng)
    import dataclasses

    cfg = dataclasses.replace(CFG, average_pooling=False)
    model = AMPGCN(config=cfg)
    variables = model.init(init_rngs(), g, deterministic=True)
    assert "cls_token" in variables["params"]
    out = model.apply(variables, g, deterministic=True, rngs={"sample": jax.random.PRNGKey(0)})
    assert out.logits.shape == (g.num_nodes_padded, 3)


def test_ampgcn_no_softmax_mode(rng):
    g = tiny_graph(rng)
    import dataclasses

    cfg = dataclasses.replace(CFG, attn_softmax=False)
    model = AMPGCN(config=cfg)
    variables = model.init(init_rngs(), g, deterministic=True)
    out = model.apply(variables, g, deterministic=True, rngs={"sample": jax.random.PRNGKey(0)})
    w = np.asarray(out.aux["attn_weights_1"])
    assert np.any(w < 0)  # raw dot products, unbounded


def test_gcn_baseline(rng):
    g = tiny_graph(rng)
    model = GCN(num_node_features=24, feat_emb_dim=4, val_emb_dim=1, output_dim=3)
    variables = model.init(init_rngs(), g, deterministic=True)
    out = model.apply(variables, g, deterministic=True)
    assert out.logits.shape == (g.num_nodes_padded, 3)
    np.testing.assert_allclose(np.exp(out.logits).sum(-1), 1.0, rtol=1e-4)


def test_gcn_one_layer(rng):
    g = tiny_graph(rng)
    pca = pca_feature_embedding(np.asarray(g.x), 4)
    model = GCNOneLayer(
        pca_embedding=jnp.asarray(pca), num_node_features=24,
        num_sampled_vectors=6, output_dim=3, feat_emb_dim=4, val_emb_dim=1,
    )
    variables = model.init(init_rngs(), g, deterministic=True)
    out = model.apply(variables, g, deterministic=True, rngs={"sample": jax.random.PRNGKey(0)})
    assert out.logits.shape == (g.num_nodes_padded, 3)


def test_ampnet_classifier(rng):
    n, s, d = 6, 4, 8
    tokens = rng.normal(size=(n, s * d)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, 12), rng.integers(0, n, 12)])
    g = from_arrays(tokens, ei, y=rng.integers(0, 3, n))
    model = AMPNetClassifier(num_heads=2, embed_dim=d, n_original_features=s, out_dim=3)
    variables = model.init(init_rngs(), g, deterministic=True)
    out = model.apply(variables, g, deterministic=True)
    assert out.logits.shape == (g.num_nodes_padded, 3)


def test_mlp_baselines(rng):
    n = 8
    x = rng.normal(size=(n, 2)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, 10), rng.integers(0, n, 10)])
    g = from_arrays(x, ei, y=rng.integers(0, 2, n))
    for m in (LinearLayer(), TwoLayerSigmoid()):
        variables = m.init(init_rngs(), g, deterministic=True)
        out = m.apply(variables, g, deterministic=True)
        assert out.logits.shape == (g.num_nodes_padded, 1)


def test_model_registry():
    assert isinstance(get_model("LinearLayer"), LinearLayer)
    with pytest.raises(KeyError):
        get_model("nope")


def test_ampgcn_transformer_block_variant(rng):
    """Pre-LN transformer-block architecture (the reference's declared
    next architecture, amp_gcn.py:409-451)."""
    import dataclasses

    g = tiny_graph(rng)
    cfg = dataclasses.replace(CFG, transformer_block=True)
    model = AMPGCN(config=cfg)
    variables = model.init(init_rngs(), g, deterministic=True)
    params = variables["params"]
    assert "layer_norm1" not in params  # no-affine LayerNorms carry no params
    assert "post_conv_linear1" in params and "post_conv_linear2" in params
    out = model.apply(variables, g, deterministic=True,
                      rngs={"sample": jax.random.PRNGKey(0)})
    assert out.logits.shape == (g.num_nodes_padded, 3)
    np.testing.assert_allclose(np.exp(out.logits).sum(-1), 1.0, rtol=1e-4)
    # gradients flow through both blocks
    def loss(p):
        o = model.apply({"params": p}, g, deterministic=True,
                        sampled_idx=jnp.zeros((g.num_nodes_padded, 6), jnp.int32),
                        return_aux=False)
        return jnp.sum(o.logits ** 2)
    grads = jax.grad(loss)(params)
    for name in ("conv1", "conv2", "post_conv_linear1", "post_conv_linear2"):
        leaf_sum = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(grads[name]))
        assert leaf_sum > 0, name


@pytest.mark.parametrize("mode,param", [
    (True, "raw_residual_proj"),          # bool True == 'mlp'
    ("gcn2", "raw_residual_conv2"),       # 2 GCN hops over raw features
])
def test_ampgcn_raw_residual(rng, mode, param):
    """raw_residual adds the full-feature pathway params, changes the
    head input, and keeps logits valid + differentiable."""
    import dataclasses

    g = tiny_graph(rng)
    cfg = dataclasses.replace(CFG, raw_residual=mode)
    model = AMPGCN(config=cfg)
    variables = model.init(init_rngs(), g, deterministic=True)
    assert param in variables["params"]
    # head sees pooled (D) + residual (D)
    assert variables["params"]["final_linear_out"]["kernel"].shape == (16, 3)
    out = model.apply(variables, g, deterministic=True,
                      rngs={"sample": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.exp(out.logits).sum(-1), 1.0, rtol=1e-4)

    def loss(p):
        o = model.apply({"params": p}, g, deterministic=False,
                        return_aux=False, rngs=init_rngs(1))
        return -o.logits[np.arange(g.num_nodes_padded), np.asarray(g.y)].mean()

    grads = jax.grad(loss)(variables["params"])
    gsum = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(np.asarray(b)).sum()), grads, 0.0)
    assert np.isfinite(gsum) and gsum > 0
    rsum = sum(float(np.abs(np.asarray(l)).sum())
               for l in jax.tree_util.tree_leaves(grads[param]))
    assert rsum > 0


def test_ampgcn_non_downsampled_tiled_tokens(rng):
    """downsample_feature_vectors=False with feature_repeats > 1 (the
    reference's tiled-table XOR variant, amp_gcn.py:168-180): tokens
    cover every feature feature_repeats times. This path was broken at
    trace time until r2 (tile_all_tokens clipped the value columns)."""
    n, f, reps = 10, 4, 3
    x = rng.normal(size=(n, f)).astype(np.float32)
    ei = np.stack([rng.integers(0, n, 30), rng.integers(0, n, 30)])
    g = from_arrays(x, ei, y=rng.integers(0, 3, n), train_mask=np.ones(n, bool))
    cfg = AMPGCNConfig(
        embedding_dim=8, num_heads=2, num_node_features=f, output_dim=3,
        feat_emb_dim=7, val_emb_dim=1, downsample_feature_vectors=False,
        feature_repeats=reps, num_sampled_vectors=4,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    )
    model = AMPGCN(config=cfg)
    variables = model.init(init_rngs(), g, deterministic=True)
    out = model.apply(variables, g, deterministic=True,
                      rngs={"sample": jax.random.PRNGKey(1)})
    assert out.aux["conv1_embedding"].shape == (g.num_nodes_padded, f * reps, 8)
    assert np.isfinite(np.asarray(out.logits)).all()
