"""Edge-attention parity tests.

The gold oracle is torch nn.MultiheadAttention itself (what the reference
actually runs, src/ampnet/conv/amp_conv.py:18-22,39) — weights are copied
into MHAParams and outputs compared elementwise. The fused edge op is then
checked against a per-edge dense loop.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.ops.edge_attention import (
    MHAParams,
    amp_edge_attention,
    multihead_attention,
)

B, S, D, H = 7, 5, 16, 4


def make_params(rng) -> MHAParams:
    return MHAParams(
        w_qkv=jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.2),
        b_qkv=jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.1),
        w_out=jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.2),
        b_out=jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1),
    )


def test_parity_vs_torch_multihead_attention(rng):
    torch = pytest.importorskip("torch")
    params = make_params(rng)
    q = rng.normal(size=(B, S, D)).astype(np.float32)
    kv = rng.normal(size=(B, S, D)).astype(np.float32)

    mha = torch.nn.MultiheadAttention(D, H, batch_first=True, bias=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(np.asarray(params.w_qkv).T.copy()))
        mha.in_proj_bias.copy_(torch.from_numpy(np.asarray(params.b_qkv).copy()))
        mha.out_proj.weight.copy_(torch.from_numpy(np.asarray(params.w_out).T.copy()))
        mha.out_proj.bias.copy_(torch.from_numpy(np.asarray(params.b_out).copy()))
        t_out, t_w = mha(
            torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv)
        )

    j_out, j_w = multihead_attention(
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), params, H
    )
    np.testing.assert_allclose(j_out, t_out.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(j_w, t_w.numpy(), rtol=2e-4, atol=2e-5)


def test_no_softmax_mode(rng):
    """No-softmax weights are raw scaled dot products
    (custom_multihead_attn_forward.py:4173-4180)."""
    params = make_params(rng)
    q = jnp.asarray(rng.normal(size=(2, S, D)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, S, D)).astype(np.float32))
    _, w = multihead_attention(q, kv, kv, params, H, softmax=False)
    # rows need not sum to 1 and can be negative
    assert np.any(np.asarray(w) < 0)

    # manual check of one score entry (head-averaged)
    d = D
    wq, wk = params.w_qkv[:, :d], params.w_qkv[:, d : 2 * d]
    bq, bk = params.b_qkv[:d], params.b_qkv[d : 2 * d]
    qp = (q @ wq + bq).reshape(2, S, H, d // H).transpose(0, 2, 1, 3)
    kp = (kv @ wk + bk).reshape(2, S, H, d // H).transpose(0, 2, 1, 3)
    scores = np.einsum("bhqd,bhkd->bhqk", qp / np.sqrt(d // H), kp)
    np.testing.assert_allclose(w, scores.mean(axis=1), rtol=1e-4, atol=1e-5)


def test_amp_edge_attention_vs_dense_loop(rng):
    """Fused op == gather -> MHA per edge -> mean per receiver."""
    n, e = 6, 12
    params = make_params(rng)
    x = jnp.asarray(rng.normal(size=(n, S, D)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    receivers = jnp.asarray(rng.integers(0, n, e).astype(np.int32))

    out, weights = amp_edge_attention(x, senders, receivers, None, params, H)

    # dense oracle: per-edge torch-style MHA then scatter-mean
    msgs, ws = multihead_attention(x[receivers], x[senders], x[senders], params, H)
    expect = np.zeros((n, S, D), np.float32)
    counts = np.zeros(n)
    for i in range(e):
        expect[int(receivers[i])] += np.asarray(msgs[i])
        counts[int(receivers[i])] += 1
    for v in range(n):
        if counts[v]:
            expect[v] /= counts[v]
    np.testing.assert_allclose(out, expect, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(weights, ws, rtol=2e-4, atol=2e-5)


def test_amp_edge_attention_isolated_receiver_is_zero(rng):
    n = 4
    params = make_params(rng)
    x = jnp.asarray(rng.normal(size=(n, S, D)).astype(np.float32))
    senders = jnp.asarray([0, 1], dtype=jnp.int32)
    receivers = jnp.asarray([1, 0], dtype=jnp.int32)
    out, _ = amp_edge_attention(x, senders, receivers, None, params, H)
    np.testing.assert_allclose(out[2], 0.0)
    np.testing.assert_allclose(out[3], 0.0)
    assert np.abs(np.asarray(out[0])).sum() > 0


def test_edge_mask_removes_edges(rng):
    n, e = 5, 8
    params = make_params(rng)
    x = jnp.asarray(rng.normal(size=(n, S, D)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    receivers = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    mask = jnp.asarray([True] * 5 + [False] * 3)
    out_masked, _ = amp_edge_attention(x, senders, receivers, mask, params, H)
    out_trunc, _ = amp_edge_attention(x, senders[:5], receivers[:5], None, params, H)
    np.testing.assert_allclose(out_masked, out_trunc, rtol=1e-5, atol=1e-6)


def test_gradients_flow(rng):
    n, e = 5, 10
    params = make_params(rng)
    x = jnp.asarray(rng.normal(size=(n, S, D)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    receivers = jnp.asarray(rng.integers(0, n, e).astype(np.int32))

    def loss(p, x):
        out, _ = amp_edge_attention(x, senders, receivers, None, p, H)
        return jnp.sum(out**2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    assert float(jnp.abs(gp.w_qkv).sum()) > 0
    assert float(jnp.abs(gx).sum()) > 0
    for leaf in jax.tree_util.tree_leaves((gp, gx)):
        assert np.all(np.isfinite(leaf))
