"""Head-axis tensor parallelism (SURVEY §2.6 optional TP): exact parity
of the head-sharded edge attention vs the single-device op on the
virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.ops.edge_attention import MHAParams, amp_edge_attention
from ampnet_tpu.parallel.head_parallel import (
    head_sharded_amp_edge_attention,
    shard_mha_params,
)
from ampnet_tpu.parallel.mesh import make_mesh


def _setup(rng, n=12, e=40, s=5, d=16):
    x = jnp.asarray(rng.standard_normal((n, s, d)), jnp.float32)
    senders = jnp.asarray(rng.integers(0, n, e))
    receivers = jnp.asarray(rng.integers(0, n, e))
    edge_mask = jnp.asarray(rng.random(e) < 0.8)
    params = MHAParams(
        w_qkv=jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.1, jnp.float32),
        b_qkv=jnp.asarray(rng.standard_normal(3 * d) * 0.1, jnp.float32),
        w_out=jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32),
        b_out=jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32),
    )
    return x, senders, receivers, edge_mask, params


@pytest.mark.parametrize("n_shards,softmax", [(2, True), (4, True), (4, False)])
def test_head_sharded_matches_single_device(rng, n_shards, softmax):
    num_heads = 4
    x, senders, receivers, edge_mask, params = _setup(rng)
    ref_out, ref_w = amp_edge_attention(
        x, senders, receivers, edge_mask, params, num_heads, softmax=softmax
    )
    mesh = make_mesh(heads=n_shards)
    with mesh:
        out, w = head_sharded_amp_edge_attention(
            x, senders, receivers, edge_mask, params, num_heads, mesh,
            softmax=softmax,
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w), rtol=1e-5, atol=1e-5)


def test_head_sharded_no_weights(rng):
    x, senders, receivers, edge_mask, params = _setup(rng)
    mesh = make_mesh(heads=2)
    ref_out, _ = amp_edge_attention(
        x, senders, receivers, edge_mask, params, 4, return_weights=False
    )
    with mesh:
        out, w = head_sharded_amp_edge_attention(
            x, senders, receivers, edge_mask, params, 4, mesh, return_weights=False
        )
    assert w is None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-5)


def test_shard_params_roundtrip_shapes(rng):
    _, _, _, _, params = _setup(rng, d=16)
    sp = shard_mha_params(params, num_heads=4, n_shards=4)
    assert sp.w_qkv.shape == (4, 16, 12)
    assert sp.b_qkv.shape == (4, 12)
    assert sp.w_out.shape == (4, 4, 16)
    assert sp.b_out.shape == (4, 16)
    # b_out slices psum back to the original
    np.testing.assert_allclose(np.asarray(sp.b_out.sum(0)), np.asarray(params.b_out), rtol=1e-6)


def test_indivisible_heads_raises(rng):
    _, _, _, _, params = _setup(rng)
    with pytest.raises(ValueError):
        shard_mha_params(params, num_heads=4, n_shards=3)


def test_head_sharded_gradients_match(rng):
    """TP must be transparent to autodiff: grads w.r.t. x and params match
    the single-device op."""
    num_heads = 4
    x, senders, receivers, edge_mask, params = _setup(rng, n=8, e=20, s=4, d=8)
    mesh = make_mesh(heads=2)

    def loss_ref(x, p):
        out, _ = amp_edge_attention(
            x, senders, receivers, edge_mask, p, num_heads, return_weights=False
        )
        return jnp.sum(out ** 2)

    def loss_tp(x, p):
        with mesh:
            out, _ = head_sharded_amp_edge_attention(
                x, senders, receivers, edge_mask, p, num_heads, mesh,
                return_weights=False,
            )
        return jnp.sum(out ** 2)

    gx_ref, gp_ref = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    gx_tp, gp_tp = jax.grad(loss_tp, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_tp), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)
    for a, b in zip(gp_tp, gp_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def _tiny_model(rng, raw_residual=False):
    from ampnet_tpu.core.config import AMPGCNConfig
    from ampnet_tpu.core.graph import from_arrays
    from ampnet_tpu.models import AMPGCN

    n, e, f = 24, 80, 12
    x = (rng.random((n, f)) < 0.3).astype(np.float32) * rng.random((n, f))
    x[x.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = from_arrays(x, ei, y=rng.integers(0, 3, n), train_mask=np.ones(n, bool),
                    node_norm=np.ones(n, np.float32))
    cfg = AMPGCNConfig(
        embedding_dim=16, num_heads=4, num_node_features=f,
        num_sampled_vectors=4, output_dim=3, feat_emb_dim=15, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
        raw_residual=raw_residual,
    )
    model = AMPGCN(config=cfg)
    k = jax.random.PRNGKey(0)
    params = model.init(
        {"params": k, "sample": k, "dropout": k, "edges": k}, g,
        deterministic=True,
    )["params"]
    return model, cfg, params, g


def test_tp_shard_unshard_roundtrip(rng):
    from ampnet_tpu.parallel.head_parallel import tp_shard_params, tp_unshard_params

    _, cfg, params, _ = _tiny_model(rng)
    back = tp_unshard_params(tp_shard_params(params, cfg.num_heads, 4),
                             cfg.num_heads)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        params, back)


@pytest.mark.parametrize("raw_residual", [False, "gcn2"])
def test_tp_forward_matches_single_device(rng, raw_residual):
    from ampnet_tpu.ops.tokenize import sample_present_features
    from ampnet_tpu.parallel.head_parallel import (
        amp_gcn_forward_heads,
        shard_map,
        tp_param_specs,
        tp_shard_params,
    )
    from jax.sharding import PartitionSpec as P

    model, cfg, params, g = _tiny_model(rng, raw_residual=raw_residual)
    key = jax.random.PRNGKey(7)
    sidx = sample_present_features(key, g.x, cfg.num_sampled_vectors)
    single = model.apply({"params": params}, g, deterministic=True,
                         sampled_idx=sidx, return_aux=False).logits

    mesh = make_mesh(heads=4)
    tpp = tp_shard_params(params, cfg.num_heads, 4)

    def body(p, graph, k):
        return amp_gcn_forward_heads(p, graph, cfg, k)

    with mesh:
        logp = shard_map(
            body, mesh=mesh,
            in_specs=(tp_param_specs(tpp),
                      jax.tree_util.tree_map(lambda _: P(), g), P()),
            out_specs=P(), check_vma=False,
        )(tpp, g, key)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(single),
                               rtol=2e-5, atol=2e-6)


def test_tp_train_step_matches_single_device_sgd(rng):
    """One TP train step (SGD) must produce the same updated params as a
    single-device gradient step on the identical loss — gradient
    all-reduce for replicated leaves and per-shard head-group gradients
    both correct through shard_map's transpose."""
    import optax

    from ampnet_tpu.ops.tokenize import sample_present_features
    from ampnet_tpu.parallel.head_parallel import (
        make_tp_train_step,
        tp_shard_params,
        tp_unshard_params,
    )

    model, cfg, params, g = _tiny_model(rng)
    key = jax.random.PRNGKey(7)
    lr = 0.1

    mesh = make_mesh(heads=4)
    tx = optax.sgd(lr)
    tpp = tp_shard_params(params, cfg.num_heads, 4)
    step = make_tp_train_step(cfg, mesh, tx, loss_mode="full")
    with mesh:
        tpp2, _, metrics = step(tpp, tx.init(tpp), g, key)
    tp_updated = tp_unshard_params(tpp2, cfg.num_heads)

    sidx = sample_present_features(key, g.x, cfg.num_sampled_vectors)

    def ref_loss(p):
        logits = model.apply({"params": p}, g, deterministic=True,
                             sampled_idx=sidx, return_aux=False).logits
        m = (g.train_mask & g.node_mask).astype(logits.dtype)
        nll = -jnp.take_along_axis(logits, g.y[:, None].astype(jnp.int32), axis=1)[:, 0]
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    ref_updated = jax.tree_util.tree_map(lambda p, gr: p - lr * gr, params, ref_g)

    np.testing.assert_allclose(float(metrics["loss"]), float(ref_l),
                               rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        tp_updated, ref_updated)


def test_dp_tp_train_step_matches_single_device_sgd(rng):
    """Combined DP x TP (mesh data=2 x heads=4 = all 8 virtual devices):
    one SGD step on a 2-replica batch must equal a single-device step on
    the mean of the two replicas' losses."""
    import optax

    from ampnet_tpu.ops.tokenize import sample_present_features
    from ampnet_tpu.parallel.data_parallel import stack_graphs
    from ampnet_tpu.parallel.head_parallel import (
        make_dp_tp_train_step,
        tp_shard_params,
        tp_unshard_params,
    )

    model, cfg, params, g0 = _tiny_model(rng)
    _, _, _, g1 = _tiny_model(np.random.default_rng(5))
    key = jax.random.PRNGKey(11)
    lr = 0.1

    mesh = make_mesh(data=2, heads=4)
    tx = optax.sgd(lr)
    tpp = tp_shard_params(params, cfg.num_heads, 4)
    step = make_dp_tp_train_step(cfg, mesh, tx, loss_mode="full")
    batch = stack_graphs([g0, g1])
    with mesh:
        tpp2, _, metrics = step(tpp, tx.init(tpp), batch, key)
    tp_updated = tp_unshard_params(tpp2, cfg.num_heads)

    def ref_loss(p):
        total = 0.0
        for i, g in enumerate((g0, g1)):
            k = jax.random.fold_in(key, i)
            sidx = sample_present_features(k, g.x, cfg.num_sampled_vectors)
            logits = model.apply({"params": p}, g, deterministic=True,
                                 sampled_idx=sidx, return_aux=False).logits
            m = (g.train_mask & g.node_mask).astype(logits.dtype)
            nll = -jnp.take_along_axis(
                logits, g.y[:, None].astype(jnp.int32), axis=1)[:, 0]
            total = total + jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
        return total / 2.0

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
    ref_updated = jax.tree_util.tree_map(lambda p, gr: p - lr * gr, params, ref_g)

    np.testing.assert_allclose(float(metrics["loss"]), float(ref_l),
                               rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        tp_updated, ref_updated)
