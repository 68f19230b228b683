"""bf16 per-edge streams (AMPNET_STREAM_BF16 / stream_bf16=True): the
projected q/kv (+ dsum/qdm) row arrays round to bfloat16 before the
kernels while scores, softmax, and every accumulator stay f32 — halving
the per-edge gather traffic the dma path is bound by at production scale
(RESULTS.md r4). These tests pin (interpret mode, CPU):

  * forward/backward stay CLOSE to the f32 fused path (bf16 input
    rounding only — no accumulation drift), on both gather modes and on
    both backward flavors (dK|dV stream and scatter-free two-pass);
  * the row stride re-pads to the bf16 (16, 128) tiling (SP 4 -> 16
    here), which must not change which edges/tokens are live.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.ops.edge_attention import MHAParams
from ampnet_tpu.ops.pallas.edge_attention_fused import amp_edge_attention_pallas
from ampnet_tpu.ops.pallas.format import build_tiled_csr

S, D, H = 4, 16, 2


def make_case(rng, n=16, e=40):
    x = jnp.asarray(rng.normal(size=(n, S, D)).astype(np.float32))
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = np.sort(rng.integers(0, n, e)).astype(np.int32)
    mask = np.ones(e, bool)
    mask[-7:] = False
    params = MHAParams(
        w_qkv=jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.2),
        b_qkv=jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.1),
        w_out=jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.2),
        b_out=jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1),
    )
    return x, senders, receivers, mask, params


def _loss_fn(x, params, senders, receivers, mask, tcsr, gather,
             stream_bf16, snd=None):
    kw = {}
    if snd is not None:
        kw = dict(
            snd_receivers=jnp.asarray(snd.senders),
            snd_local=jnp.asarray(snd.recv_local),
            snd_valid=jnp.asarray(snd.valid),
            snd_counts=jnp.asarray(snd.counts),
            scatterfree=True,
        )
    out = amp_edge_attention_pallas(
        x, params, jnp.asarray(senders), jnp.asarray(receivers),
        jnp.asarray(mask),
        jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
        jnp.asarray(tcsr.valid),
        num_heads=H, softmax=True, tile_nodes=8,
        gather=gather, fused_bwd=True, interpret=True,
        stream_bf16=stream_bf16, **kw,
    )
    return jnp.sum(out * jnp.cos(out)), out


@pytest.mark.parametrize("gather", ["vmem", "dma"])
def test_stream_bf16_close_to_f32_stream_bwd(rng, gather):
    x, senders, receivers, mask, params = make_case(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)

    def run(stream_bf16):
        def loss(x, params):
            return _loss_fn(x, params, senders, receivers, mask, tcsr,
                            gather, stream_bf16)[0]
        l, (gx, gp) = jax.value_and_grad(loss, argnums=(0, 1))(x, params)
        return l, gx, gp

    l32, gx32, gp32 = run(False)
    l16, gx16, gp16 = run(True)
    np.testing.assert_allclose(l16, l32, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gx16), np.asarray(gx32),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(gp16.w_qkv), np.asarray(gp32.w_qkv),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(gp16.w_out), np.asarray(gp32.w_out),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("gather", ["vmem", "dma"])
def test_stream_bf16_close_to_f32_scatterfree_bwd(rng, gather):
    x, senders, receivers, mask, params = make_case(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)
    snd = build_tiled_csr(receivers, senders, mask, 16, tile_nodes=8, group=4)

    def run(stream_bf16):
        def loss(x, params):
            return _loss_fn(x, params, senders, receivers, mask, tcsr,
                            gather, stream_bf16, snd=snd)[0]
        l, (gx, gp) = jax.value_and_grad(loss, argnums=(0, 1))(x, params)
        return l, gx, gp

    l32, gx32, gp32 = run(False)
    l16, gx16, gp16 = run(True)
    np.testing.assert_allclose(l16, l32, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gx16), np.asarray(gx32),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(gp16.w_qkv), np.asarray(gp32.w_qkv),
                               rtol=5e-2, atol=5e-2)


def test_stream_bf16_forward_matches_f32_closely(rng):
    """Forward-only: bf16 rounding of the streamed rows moves the output
    by O(1e-2) relative — not by O(1) (a wrong-row/wrong-stride bug would
    blow past this immediately after the SP 4 -> 16 re-pad)."""
    x, senders, receivers, mask, params = make_case(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)
    _, out32 = _loss_fn(x, params, senders, receivers, mask, tcsr,
                        "vmem", False)
    _, out16 = _loss_fn(x, params, senders, receivers, mask, tcsr,
                        "vmem", True)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=3e-2, atol=3e-2)
