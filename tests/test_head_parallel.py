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
