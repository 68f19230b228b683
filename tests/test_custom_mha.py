"""Elementwise parity of the full-surface custom MHA vs torch
nn.MultiheadAttention across the reference's option space
(src/ampnet/conv/custom_multihead_attn.py:46-102): unequal kdim/vdim,
add_bias_kv, add_zero_attn, key_padding_mask, attn_mask."""
import numpy as np
import pytest
import torch

from ampnet_tpu.ops.custom_mha import (
    CustomMHAParams,
    custom_multihead_attention,
    init_custom_mha,
)


def params_from_torch(mha: torch.nn.MultiheadAttention) -> CustomMHAParams:
    def t(x):
        return None if x is None else np.asarray(x.detach().numpy())

    if mha._qkv_same_embed_dim:
        w = t(mha.in_proj_weight)
        d = w.shape[1]
        w_q, w_k, w_v = w[:d].T, w[d:2 * d].T, w[2 * d:].T
    else:
        w_q = t(mha.q_proj_weight).T
        w_k = t(mha.k_proj_weight).T
        w_v = t(mha.v_proj_weight).T
    b = t(mha.in_proj_bias)
    d = w_q.shape[1]
    return CustomMHAParams(
        w_q=w_q, w_k=w_k, w_v=w_v,
        b_q=b[:d], b_k=b[d:2 * d], b_v=b[2 * d:],
        w_out=t(mha.out_proj.weight).T, b_out=t(mha.out_proj.bias),
        bias_k=None if mha.bias_k is None else t(mha.bias_k)[0],
        bias_v=None if mha.bias_v is None else t(mha.bias_v)[0],
    )


def run_pair(rng, kdim=None, vdim=None, add_bias_kv=False, add_zero_attn=False,
             key_padding=False, attn_mask_kind=None, b=3, s_q=5, s_k=6, d=16, h=4):
    kdim = kdim or d
    vdim = vdim or d
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(
        d, h, bias=True, add_bias_kv=add_bias_kv, add_zero_attn=add_zero_attn,
        kdim=kdim, vdim=vdim, batch_first=True,
    )
    q = rng.normal(size=(b, s_q, d)).astype(np.float32)
    k = rng.normal(size=(b, s_k, kdim)).astype(np.float32)
    v = rng.normal(size=(b, s_k, vdim)).astype(np.float32)

    kpm = None
    if key_padding:
        kpm = np.zeros((b, s_k), bool)
        kpm[:, -2:] = True
    am = None
    if attn_mask_kind == "bool":
        am = rng.random((s_q, s_k)) < 0.2
        am[:, 0] = False  # keep at least one unmasked key
    elif attn_mask_kind == "float":
        am = (rng.random((s_q, s_k)) < 0.2) * -1e9

    with torch.no_grad():
        out_t, w_t = mha(
            torch.tensor(q), torch.tensor(k), torch.tensor(v),
            key_padding_mask=None if kpm is None else torch.tensor(kpm),
            attn_mask=None if am is None else torch.tensor(
                am if attn_mask_kind == "bool" else am.astype(np.float32)),
            need_weights=True, average_attn_weights=True,
        )

    params = params_from_torch(mha)
    out_j, w_j = custom_multihead_attention(
        q, k, v, params, h, softmax=True, add_zero_attn=add_zero_attn,
        key_padding_mask=kpm,
        attn_mask=None if am is None else (
            am if attn_mask_kind == "bool" else am.astype(np.float32)),
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=2e-4, atol=2e-5)
    # torch trims returned weights to S_k even with bias/zero-attn columns
    np.testing.assert_allclose(
        np.asarray(w_j)[:, :, :w_t.shape[-1]], w_t.numpy(), rtol=2e-4, atol=2e-5
    )


def test_same_dim_parity(rng):
    run_pair(rng)


def test_unequal_kdim_vdim(rng):
    run_pair(rng, kdim=12, vdim=20)


def test_add_bias_kv(rng):
    run_pair(rng, add_bias_kv=True)


def test_add_zero_attn(rng):
    run_pair(rng, add_zero_attn=True)


def test_key_padding_mask(rng):
    run_pair(rng, key_padding=True)


def test_bool_attn_mask(rng):
    run_pair(rng, attn_mask_kind="bool")


def test_float_attn_mask(rng):
    run_pair(rng, attn_mask_kind="float")


def test_everything_at_once(rng):
    run_pair(rng, kdim=12, vdim=20, add_bias_kv=True, add_zero_attn=True,
             key_padding=True, attn_mask_kind="float")


def test_no_softmax_mode(rng):
    """The reference's single functional edit: raw scaled dot products
    (custom_multihead_attn_forward.py:4179-4180)."""
    d, h = 16, 4
    import jax

    params = init_custom_mha(jax.random.PRNGKey(0), d)
    q = rng.normal(size=(2, 3, d)).astype(np.float32)
    kv = rng.normal(size=(2, 4, d)).astype(np.float32)
    _, w = custom_multihead_attention(q, kv, kv, params, h, softmax=False)
    assert np.asarray(w).min() < 0  # raw scores, not a distribution
    row_sums = np.asarray(w).sum(-1)
    assert not np.allclose(row_sums, 1.0)
