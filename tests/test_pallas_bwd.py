"""Fused backward parity vs jax.vjp through the XLA reference path
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.ops.edge_attention import MHAParams, amp_edge_attention
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


@pytest.mark.parametrize("softmax", [True, False])
def test_fused_bwd_matches_xla_vjp(rng, softmax):
    x, senders, receivers, mask, params = make_case(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)

    def fused_loss(x, params):
        out = amp_edge_attention_pallas(
            x, params, jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(mask),
            jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
            jnp.asarray(tcsr.valid),
            num_heads=H, softmax=softmax, tile_nodes=8,
            fused_bwd=True, interpret=True,
        )
        return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

    def ref_loss(x, params):
        out, _ = amp_edge_attention(
            x, jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask),
            params, H, softmax=softmax, return_weights=False,
        )
        return jnp.sum(out * jnp.cos(out))

    lf, (gx_f, gp_f) = jax.value_and_grad(fused_loss, argnums=(0, 1))(x, params)
    lr, (gx_r, gp_r) = jax.value_and_grad(ref_loss, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(lf, lr, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=3e-3, atol=3e-4)
    for a, b, name in [
        (gp_f.w_qkv, gp_r.w_qkv, "w_qkv"),
        (gp_f.b_qkv, gp_r.b_qkv, "b_qkv"),
        (gp_f.w_out, gp_r.w_out, "w_out"),
        (gp_f.b_out, gp_r.b_out, "b_out"),
    ]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-4, err_msg=name
        )


@pytest.mark.parametrize("softmax", [True, False])
def test_fused_bwd_dma_gather_matches_xla_vjp(rng, softmax):
    """DMA-gather backward variant (production scale path), interpret."""
    x, senders, receivers, mask, params = make_case(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)

    def fused_loss(x, params):
        out = amp_edge_attention_pallas(
            x, params, jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(mask),
            jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
            jnp.asarray(tcsr.valid),
            num_heads=H, softmax=softmax, tile_nodes=8,
            gather="dma", fused_bwd=True, interpret=True,
        )
        return jnp.sum(out * jnp.cos(out))

    def ref_loss(x, params):
        out, _ = amp_edge_attention(
            x, jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask),
            params, H, softmax=softmax, return_weights=False,
        )
        return jnp.sum(out * jnp.cos(out))

    lf, (gx_f, gp_f) = jax.value_and_grad(fused_loss, argnums=(0, 1))(x, params)
    lr, (gx_r, gp_r) = jax.value_and_grad(ref_loss, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(lf, lr, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gp_f.w_qkv), np.asarray(gp_r.w_qkv), rtol=3e-3, atol=3e-4)


@pytest.mark.parametrize("softmax", [True, False])
def test_fused_bwd_dma_v1_legacy_matches_xla_vjp(rng, softmax, monkeypatch):
    """Legacy block-diagonal DMA backward body (AMPNET_DMA_V1=1), kept for
    on-chip A/Bs: now that fused_edge_bwd threads dma_v1 as a static jit
    arg (resolved outside trace), the flipped default reaches the kernel
    and the v1 bwd stays regression-tested."""
    import ampnet_tpu.ops.pallas.edge_attention_fused as eaf

    monkeypatch.setattr(eaf, "DMA_V1_DEFAULT", True)
    x, senders, receivers, mask, params = make_case(rng)
    # v1 contract: group | EMAX
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)

    def fused_loss(x, params):
        out = amp_edge_attention_pallas(
            x, params, jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(mask),
            jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
            jnp.asarray(tcsr.valid),
            num_heads=H, softmax=softmax, tile_nodes=8,
            gather="dma", fused_bwd=True, interpret=True,
        )
        return jnp.sum(out * jnp.cos(out))

    def ref_loss(x, params):
        out, _ = amp_edge_attention(
            x, jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask),
            params, H, softmax=softmax, return_weights=False,
        )
        return jnp.sum(out * jnp.cos(out))

    lf, (gx_f, gp_f) = jax.value_and_grad(fused_loss, argnums=(0, 1))(x, params)
    lr, (gx_r, gp_r) = jax.value_and_grad(ref_loss, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(lf, lr, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gp_f.w_qkv), np.asarray(gp_r.w_qkv), rtol=3e-3, atol=3e-4)


def test_dma_bwd_stream_chunking_matches_unchunked(rng, monkeypatch):
    """Tile-chunked pass A+B (the 1M-edge-scale memory cap) must be exactly
    the same math as the single-stream path: chunk boundaries only change
    the order of the dkv accumulator additions."""
    import ampnet_tpu.ops.pallas.edge_attention_fused as eaf

    x, senders, receivers, mask, params = make_case(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)

    def fused_loss(x, params):
        out = amp_edge_attention_pallas(
            x, params, jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(mask),
            jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
            jnp.asarray(tcsr.valid),
            num_heads=H, softmax=True, tile_nodes=8,
            gather="dma", fused_bwd=True, interpret=True,
        )
        return jnp.sum(out * jnp.cos(out))

    monkeypatch.setattr(eaf, "_STREAM_CHUNK_BYTES", 1 << 62)  # single chunk
    l1, (gx1, gp1) = jax.value_and_grad(fused_loss, argnums=(0, 1))(x, params)
    monkeypatch.setattr(eaf, "_STREAM_CHUNK_BYTES", 4096)     # many chunks
    l2, (gx2, gp2) = jax.value_and_grad(fused_loss, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gp1.w_qkv), np.asarray(gp2.w_qkv),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("softmax", [True, False])
def test_fused_bwd_stacked_matches_xla_vjp(rng, softmax, monkeypatch):
    """Head-STACKED backward body (AMPNET_STACKED_SOFTMAX) parity."""
    from ampnet_tpu.ops.pallas import edge_attention_fused as eaf

    monkeypatch.setattr(eaf, "STACKED_SOFTMAX_DEFAULT", True)
    test_fused_bwd_matches_xla_vjp(rng, softmax)


@pytest.mark.parametrize("gather", ["dma", "vmem"])
def test_fused_bwd_runtime_scattered_mask(rng, gather):
    """Backward with a RUNTIME (adjacency-dropout) mask scattered into the
    structural layout's slots: live edges behind a dropped slot-0 edge
    must still get exact gradients. The pre-fix DMA backward skipped any
    group whose first slot was invalid — live edges in such groups lost
    their dQ and their dK|dV stream rows were folded from uninitialized
    memory."""
    x, senders, receivers, _, params = make_case(rng)
    struct_mask = np.ones(senders.shape[0], bool)
    tcsr = build_tiled_csr(senders, receivers, struct_mask, 16,
                           tile_nodes=8, group=4)
    # runtime dropout: kill ~40% of edges INCLUDING slot 0 of each tile's
    # first group (edges are receiver-sorted, so low slots = early edges)
    runtime = rng.random(senders.shape[0]) > 0.4
    runtime[np.argsort(receivers)[0]] = False  # guarantee a dropped slot-0
    t, emax = tcsr.valid.shape
    slot = np.where(tcsr.edge_slot < 0, t * emax, tcsr.edge_slot)
    flat = np.zeros(t * emax + 1, np.int32)
    flat[slot] = runtime.astype(np.int32)
    tile_valid_rt = flat[:-1].reshape(t, emax)
    counts = jnp.asarray(tcsr.counts)  # STRUCTURAL trip counts

    def fused_loss(x, params):
        out = amp_edge_attention_pallas(
            x, params, jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(runtime),
            jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
            jnp.asarray(tile_valid_rt),
            num_heads=H, softmax=True, tile_nodes=8, gather=gather,
            fused_bwd=True, interpret=True, tile_counts=counts,
        )
        return jnp.sum(out * jnp.cos(out))

    def ref_loss(x, params):
        out, _ = amp_edge_attention(
            x, jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(runtime), params, H, softmax=True,
            return_weights=False,
        )
        return jnp.sum(out * jnp.cos(out))

    lf, (gx_f, gp_f) = jax.value_and_grad(fused_loss, argnums=(0, 1))(x, params)
    lr, (gx_r, gp_r) = jax.value_and_grad(ref_loss, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(lf, lr, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gp_f.w_qkv), np.asarray(gp_r.w_qkv),
                               rtol=3e-3, atol=3e-4)


def _snd_layout(senders, receivers, mask, n, tile_nodes, group=4):
    """Transposed (sender-tiled) layout: build_tiled_csr with roles
    swapped, as format.compute_layout(sender_layout=True) does."""
    return build_tiled_csr(receivers, senders, mask, n,
                           tile_nodes=tile_nodes, group=group)


@pytest.mark.parametrize("gather", ["vmem", "dma"])
@pytest.mark.parametrize("softmax", [True, False])
def test_scatterfree_bwd_matches_stream_bwd(rng, softmax, gather):
    """The scatter-free two-pass backward (receiver-tiled dQ + sender-
    tiled dK|dV, no per-edge stream) computes the same per-edge math as
    the stream backward — results should agree to accumulation-order
    tolerance."""
    x, senders, receivers, mask, params = make_case(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)
    stcsr = _snd_layout(senders, receivers, mask, 16, tile_nodes=8)

    def make_loss(scatterfree):
        def loss(x, params):
            out = amp_edge_attention_pallas(
                x, params, jnp.asarray(senders), jnp.asarray(receivers),
                jnp.asarray(mask),
                jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
                jnp.asarray(tcsr.valid),
                num_heads=H, softmax=softmax, tile_nodes=8, gather=gather,
                fused_bwd=True, interpret=True,
                tile_counts=jnp.asarray(tcsr.counts),
                snd_receivers=jnp.asarray(stcsr.senders),
                snd_local=jnp.asarray(stcsr.recv_local),
                snd_valid=jnp.asarray(stcsr.valid),
                snd_counts=jnp.asarray(stcsr.counts),
                snd_edge_slot=jnp.asarray(stcsr.edge_slot),
                scatterfree=scatterfree,
            )
            return jnp.sum(out * jnp.cos(out))
        return loss

    (gx_a, gp_a) = jax.grad(make_loss(True), argnums=(0, 1))(x, params)
    (gx_b, gp_b) = jax.grad(make_loss(False), argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-5, atol=1e-6)
    for a, b, name in [
        (gp_a.w_qkv, gp_b.w_qkv, "w_qkv"),
        (gp_a.b_qkv, gp_b.b_qkv, "b_qkv"),
        (gp_a.w_out, gp_b.w_out, "w_out"),
        (gp_a.b_out, gp_b.b_out, "b_out"),
    ]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("gather", ["vmem", "dma"])
def test_scatterfree_bwd_runtime_scattered_mask(rng, gather):
    """Scatter-free backward under a RUNTIME (adjacency-dropout) mask:
    the op scatters the runtime edge_mask into the sender layout's
    validity via snd_edge_slot itself; grads must match the XLA vjp."""
    x, senders, receivers, _, params = make_case(rng)
    struct_mask = np.ones(senders.shape[0], bool)
    tcsr = build_tiled_csr(senders, receivers, struct_mask, 16,
                           tile_nodes=8, group=4)
    stcsr = _snd_layout(senders, receivers, struct_mask, 16, tile_nodes=8)
    runtime = rng.random(senders.shape[0]) > 0.4
    runtime[np.argsort(receivers)[0]] = False
    t, emax = tcsr.valid.shape
    slot = np.where(tcsr.edge_slot < 0, t * emax, tcsr.edge_slot)
    flat = np.zeros(t * emax + 1, np.int32)
    flat[slot] = runtime.astype(np.int32)
    tile_valid_rt = flat[:-1].reshape(t, emax)

    def fused_loss(x, params):
        out = amp_edge_attention_pallas(
            x, params, jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(runtime),
            jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
            jnp.asarray(tile_valid_rt),
            num_heads=H, softmax=True, tile_nodes=8, gather=gather,
            fused_bwd=True, interpret=True,
            tile_counts=jnp.asarray(tcsr.counts),
            snd_receivers=jnp.asarray(stcsr.senders),
            snd_local=jnp.asarray(stcsr.recv_local),
            snd_valid=jnp.asarray(stcsr.valid),
            snd_counts=jnp.asarray(stcsr.counts),
            snd_edge_slot=jnp.asarray(stcsr.edge_slot),
            scatterfree=True,
        )
        return jnp.sum(out * jnp.cos(out))

    def ref_loss(x, params):
        out, _ = amp_edge_attention(
            x, jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(runtime), params, H, softmax=True,
            return_weights=False,
        )
        return jnp.sum(out * jnp.cos(out))

    lf, (gx_f, gp_f) = jax.value_and_grad(fused_loss, argnums=(0, 1))(x, params)
    lr, (gx_r, gp_r) = jax.value_and_grad(ref_loss, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(lf, lr, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gp_f.w_qkv), np.asarray(gp_r.w_qkv),
                               rtol=3e-3, atol=3e-4)


def test_scatterfree_bwd_uneven_tiles(rng):
    """n not divisible by tile_nodes: the sender tile grid covers a
    ragged final tile; grads must still match the XLA vjp."""
    n = 13
    x, senders, receivers, mask, params = make_case(rng, n=n, e=30)
    tcsr = build_tiled_csr(senders, receivers, mask, n, tile_nodes=4, group=4)
    stcsr = _snd_layout(senders, receivers, mask, n, tile_nodes=4)

    def fused_loss(x, params):
        out = amp_edge_attention_pallas(
            x, params, jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(mask),
            jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
            jnp.asarray(tcsr.valid),
            num_heads=H, softmax=True, tile_nodes=4,
            fused_bwd=True, interpret=True,
            tile_counts=jnp.asarray(tcsr.counts),
            snd_receivers=jnp.asarray(stcsr.senders),
            snd_local=jnp.asarray(stcsr.recv_local),
            snd_valid=jnp.asarray(stcsr.valid),
            snd_counts=jnp.asarray(stcsr.counts),
            snd_edge_slot=jnp.asarray(stcsr.edge_slot),
            scatterfree=True,
        )
        return jnp.sum(out * jnp.cos(out))

    def ref_loss(x, params):
        out, _ = amp_edge_attention(
            x, jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask),
            params, H, softmax=True, return_weights=False,
        )
        return jnp.sum(out * jnp.cos(out))

    (gx_f, gp_f) = jax.grad(fused_loss, argnums=(0, 1))(x, params)
    (gx_r, gp_r) = jax.grad(ref_loss, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gp_f.w_qkv), np.asarray(gp_r.w_qkv),
                               rtol=3e-3, atol=3e-4)


def test_compute_layout_builds_sender_layout(rng):
    """compute_layout defaults to building the transposed layout; the
    snd arrays must be a valid re-bucketing of the same edges."""
    from ampnet_tpu.core.graph import from_arrays
    from ampnet_tpu.ops.pallas.format import compute_layout

    n, e = 16, 40
    xfeat = (rng.random((n, 8)) < 0.5).astype(np.float32)
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = from_arrays(xfeat, ei, pad_nodes_to=n, pad_edges_to=64)
    layout = compute_layout(g, tile_nodes=8)
    assert layout.snd_receivers is not None
    assert layout.snd_local is not None
    # every live edge appears exactly once in each bucketing
    assert int(np.asarray(layout.tile_valid).sum()) == int(
        np.asarray(layout.snd_valid).sum())
    # sender-tiled rows reconstruct the global sender ids: tile t row r
    # -> sender t*tn + r; the multiset of (sender, receiver) pairs matches
    tn = layout.tile_nodes
    sv = np.asarray(layout.snd_valid).astype(bool)
    t_idx = np.arange(sv.shape[0])[:, None]
    snd_global = t_idx * tn + np.asarray(layout.snd_local)
    pairs_snd = set(zip(snd_global[sv].tolist(),
                        np.asarray(layout.snd_receivers)[sv].tolist()))
    rv = np.asarray(layout.tile_valid).astype(bool)
    recv_global = t_idx * tn + np.asarray(layout.tile_recv)
    pairs_recv = set(zip(np.asarray(layout.tile_senders)[rv].tolist(),
                         recv_global[rv].tolist()))
    assert pairs_snd == pairs_recv
    # opting out leaves the fields None (stream backward path)
    layout2 = compute_layout(g, tile_nodes=8, sender_layout=False)
    assert layout2.snd_receivers is None
