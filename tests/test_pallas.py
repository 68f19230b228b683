"""Fused Pallas kernel parity (interpret mode on CPU) vs the XLA
reference path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.ops.edge_attention import MHAParams, amp_edge_attention
from ampnet_tpu.ops.pallas.edge_attention_fused import (
    amp_edge_attention_pallas_core,
)
from ampnet_tpu.ops.pallas.format import build_tiled_csr

S, D, H = 4, 16, 2


def make_params(rng):
    return MHAParams(
        w_qkv=jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.2),
        b_qkv=jnp.asarray(rng.normal(size=(3 * D,)).astype(np.float32) * 0.1),
        w_out=jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.2),
        b_out=jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1),
    )


def build_case(rng, n=16, e=40):
    x = jnp.asarray(rng.normal(size=(n, S, D)).astype(np.float32))
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = np.sort(rng.integers(0, n, e)).astype(np.int32)
    mask = np.ones(e, bool)
    mask[-5:] = False
    return x, senders, receivers, mask


def test_tiled_csr_layout(rng):
    x, senders, receivers, mask = build_case(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)
    assert tcsr.num_tiles == 2
    assert tcsr.edges_per_tile % 4 == 0
    # every valid edge appears exactly once with correct receiver tile
    count = 0
    for t in range(tcsr.num_tiles):
        for k in range(tcsr.edges_per_tile):
            if tcsr.valid[t, k]:
                g_recv = t * tcsr.tile_nodes + tcsr.recv_local[t, k]
                pair = (tcsr.senders[t, k], g_recv)
                assert pair in set(zip(senders[mask], receivers[mask]))
                count += 1
    assert count == mask.sum()


@pytest.mark.parametrize("softmax", [True, False])
@pytest.mark.parametrize("gather", ["vmem", "dma"])
def test_fused_kernel_parity_interpret(rng, softmax, gather):
    x, senders, receivers, mask = build_case(rng)
    params = make_params(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)

    fused = amp_edge_attention_pallas_core(
        x, params, tcsr, jnp.asarray(receivers), jnp.asarray(mask),
        H, softmax=softmax, gather=gather, interpret=True,
    )
    ref, _ = amp_edge_attention(
        x, jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask),
        params, H, softmax=softmax, return_weights=False,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_dma_v1_legacy_parity_interpret(rng, monkeypatch):
    """The legacy block-diagonal DMA body (AMPNET_DMA_V1=1) stays
    correct now that the default 'dma' route is the compact v4 body
    reading K|V from ANY/HBM."""
    from ampnet_tpu.ops.pallas import edge_attention_fused as eaf

    monkeypatch.setattr(eaf, "DMA_V1_DEFAULT", True)
    x, senders, receivers, mask = build_case(rng)
    params = make_params(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)

    fused = amp_edge_attention_pallas_core(
        x, params, tcsr, jnp.asarray(receivers), jnp.asarray(mask),
        H, softmax=True, gather="dma", interpret=True,
    )
    ref, _ = amp_edge_attention(
        x, jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask),
        params, H, softmax=True, return_weights=False,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("softmax", [True, False])
def test_stacked_body_parity_interpret(rng, softmax, monkeypatch):
    """Head-STACKED compact softmax body (heads batched on axis 0 of one
    3-D dot; AMPNET_STACKED_SOFTMAX) matches the XLA reference."""
    from ampnet_tpu.ops.pallas import edge_attention_fused as eaf

    monkeypatch.setattr(eaf, "STACKED_SOFTMAX_DEFAULT", True)
    x, senders, receivers, mask = build_case(rng)
    params = make_params(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)

    fused = amp_edge_attention_pallas_core(
        x, params, tcsr, jnp.asarray(receivers), jnp.asarray(mask),
        H, softmax=softmax, gather="vmem", interpret=True,
    )
    ref, _ = amp_edge_attention(
        x, jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask),
        params, H, softmax=softmax, return_weights=False,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_lanes_body_parity_interpret(rng, monkeypatch):
    """Edge-groups-on-LANES softmax body (scores transposed to [SP, SP, G]
    so the elementwise chain runs at full lane width;
    AMPNET_LANES_SOFTMAX) matches the XLA reference. Also exercised
    through the v6 whole-layer route (FUSE_PROJ on CPU interpret)."""
    from ampnet_tpu.ops.pallas import edge_attention_fused as eaf

    monkeypatch.setattr(eaf, "LANES_SOFTMAX_DEFAULT", True)
    x, senders, receivers, mask = build_case(rng)
    params = make_params(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)

    fused = amp_edge_attention_pallas_core(
        x, params, tcsr, jnp.asarray(receivers), jnp.asarray(mask),
        H, softmax=True, gather="vmem", interpret=True,
    )
    ref, _ = amp_edge_attention(
        x, jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask),
        params, H, softmax=True, return_weights=False,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_chunked_kernel_parity_interpret(rng):
    """v5 receiver-chunked kernel == v2 edge-group kernel (interpret).

    Covers: partial chunks (low-degree receivers), multi-chunk receivers,
    masked edges, shared-row-max softmax, and the no-softmax branch."""
    from ampnet_tpu.ops.pallas.edge_attention_fused import (
        _fused_edge_sums_chunked,
        _fused_edge_sums_v2,
    )
    from ampnet_tpu.ops.pallas.format import build_chunked_csr

    n, e, s, d, h, tn, sp = 96, 300, 5, 16, 4, 32, 8
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    mask = np.ones(e, bool)
    mask[::7] = False
    tcsr = build_tiled_csr(senders, receivers, mask, n, tile_nodes=tn, group=8)
    ck = build_chunked_csr(senders, receivers, mask, n, tile_nodes=tn,
                           chunk_edges=8)
    q = jnp.asarray(rng.normal(size=(tcsr.num_tiles * tn * sp, d)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(n * sp, 2 * d)), jnp.float32)
    for softmax in (True, False):
        ref = _fused_edge_sums_v2(
            q, kv, jnp.asarray(tcsr.senders)[:, None, :],
            jnp.asarray(tcsr.recv_local)[:, None, :],
            jnp.asarray(tcsr.valid)[:, None, :], jnp.asarray(tcsr.counts),
            num_heads=h, softmax=softmax, tile_nodes=tn, group=8,
            num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile, s=s,
            interpret=True)
        got = _fused_edge_sums_chunked(
            q, kv, jnp.asarray(ck.senders)[:, None, :],
            jnp.asarray(ck.chunk_recv)[:, None, :],
            jnp.asarray(ck.valid)[:, None, :], jnp.asarray(ck.counts),
            num_heads=h, softmax=softmax, tile_nodes=tn, chunk=ck.chunk_edges,
            num_tiles=ck.num_tiles, ncmax=ck.chunks_per_tile, s=s,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_chunked_layout_roundtrip(rng):
    """Every live edge appears exactly once at its edge_slot with the
    right sender/receiver; chunk receivers are tile-local."""
    from ampnet_tpu.ops.pallas.format import build_chunked_csr

    n, e, tn, c = 64, 200, 16, 4
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    mask = rng.random(e) > 0.2
    ck = build_chunked_csr(senders, receivers, mask, n, tile_nodes=tn,
                           chunk_edges=c)
    assert ck.valid.sum() == mask.sum()
    ncc = ck.chunks_per_tile * c
    for eid in np.nonzero(mask)[0]:
        slot = ck.edge_slot[eid]
        assert slot >= 0
        ti, pos = slot // ncc, slot % ncc
        assert ck.senders[ti, pos] == senders[eid]
        assert ck.chunk_recv[ti, pos // c] == receivers[eid] % tn
        assert ti == receivers[eid] // tn
        assert ck.valid[ti, pos] == 1
    assert ck.edge_slot[~mask].max(initial=-1) == -1


@pytest.mark.parametrize("softmax", [True, False])
def test_v6_whole_layer_parity_interpret(rng, softmax, monkeypatch):
    """v6 whole-layer kernel (in-kernel QKV + out projections, fused mean
    via per-edge invdeg fold) == XLA reference, including runtime edge
    masks and exact zeros for degree-0 receivers (no stray b_out)."""
    from ampnet_tpu.ops.pallas import edge_attention_fused as eaf

    monkeypatch.setattr(eaf, "FUSE_PROJ_DEFAULT", True)
    x, senders, receivers, mask = build_case(rng)
    # force a degree-0 receiver: node 3 receives nothing
    receivers = receivers.copy()
    receivers[receivers == 3] = 4
    params = make_params(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)

    calls = {"v6": 0}
    orig = eaf._fused_attention_out_v6

    def spy(*a, **k):
        calls["v6"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(eaf, "_fused_attention_out_v6", spy)
    fused = eaf.amp_edge_attention_pallas(
        x, params, jnp.asarray(senders), jnp.asarray(receivers),
        jnp.asarray(mask), jnp.asarray(tcsr.senders),
        jnp.asarray(tcsr.recv_local), jnp.asarray(tcsr.valid), H,
        softmax=softmax, tile_nodes=8, gather="vmem", interpret=True,
        tile_counts=jnp.asarray(tcsr.counts),
    )
    assert calls["v6"] == 1, "v6 branch not taken"
    ref, _ = amp_edge_attention(
        x, jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask),
        params, H, softmax=softmax, return_weights=False,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    assert np.all(np.asarray(fused)[3] == 0.0)


def test_v6_budget_guard_falls_back(rng, monkeypatch):
    """Graphs whose x + projected-K|V residents exceed the v6 VMEM budget
    silently use the v2 split path (no behavior cliff)."""
    from ampnet_tpu.ops.pallas import edge_attention_fused as eaf

    monkeypatch.setattr(eaf, "FUSE_PROJ_DEFAULT", True)
    monkeypatch.setattr(eaf, "_V6_VMEM_LIMIT", 1 * 1024 * 1024)
    x, senders, receivers, mask = build_case(rng)
    params = make_params(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)
    calls = {"v6": 0}
    orig = eaf._fused_attention_out_v6

    def spy(*a, **k):
        calls["v6"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(eaf, "_fused_attention_out_v6", spy)
    fused = eaf.amp_edge_attention_pallas(
        x, params, jnp.asarray(senders), jnp.asarray(receivers),
        jnp.asarray(mask), jnp.asarray(tcsr.senders),
        jnp.asarray(tcsr.recv_local), jnp.asarray(tcsr.valid), H,
        tile_nodes=8, gather="vmem", interpret=True,
        tile_counts=jnp.asarray(tcsr.counts),
    )
    assert calls["v6"] == 0
    ref, _ = amp_edge_attention(
        x, jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask),
        params, H, return_weights=False,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_v6_bfloat16_parity_interpret(rng, monkeypatch):
    """v6 runs the bf16 compute path (sp aligns to 16; scratches follow
    x.dtype) within bf16 tolerance of the XLA bf16 reference."""
    from ampnet_tpu.ops.pallas import edge_attention_fused as eaf

    monkeypatch.setattr(eaf, "FUSE_PROJ_DEFAULT", True)
    x, senders, receivers, mask = build_case(rng)
    x = x.astype(jnp.bfloat16)
    params = make_params(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)
    fused = eaf.amp_edge_attention_pallas(
        x, params, jnp.asarray(senders), jnp.asarray(receivers),
        jnp.asarray(mask), jnp.asarray(tcsr.senders),
        jnp.asarray(tcsr.recv_local), jnp.asarray(tcsr.valid), H,
        tile_nodes=8, gather="vmem", interpret=True,
        tile_counts=jnp.asarray(tcsr.counts),
    )
    ref, _ = amp_edge_attention(
        x, jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(mask),
        params, H, return_weights=False,
    )
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_dynamic_entrypoint_rejects_tile_nodes_mismatch(rng):
    """amp_edge_attention_pallas must refuse a tile_nodes that disagrees
    with the layout arrays (recv_local is receiver % tile_nodes at build
    time — a mismatch silently reads wrong rows). Regression: the r3
    DEFAULT_TILE_NODES flip made this mismatch reachable for callers that
    built layouts at tn=64 and relied on the old default."""
    from ampnet_tpu.ops.pallas import edge_attention_fused as eaf

    x, senders, receivers, mask = build_case(rng)
    params = make_params(rng)
    tcsr = build_tiled_csr(senders, receivers, mask, 16, tile_nodes=8, group=4)
    with pytest.raises(ValueError, match="tile_nodes"):
        eaf.amp_edge_attention_pallas(
            x, params, jnp.asarray(senders), jnp.asarray(receivers),
            jnp.asarray(mask), jnp.asarray(tcsr.senders),
            jnp.asarray(tcsr.recv_local), jnp.asarray(tcsr.valid), 2,
            tile_nodes=4, gather="vmem", interpret=True,
        )


def test_resolve_gather_charges_tile_working_set():
    """Residency decision must count the per-tile q/out/acc windows, not
    just resident K|V: at Cora scale tn=512's working set pushed an
    approved config past the 100 MB scoped VMEM limit (r3 probe) — big
    tiles must degrade to the DMA path instead of failing compile."""
    from ampnet_tpu.ops.pallas import edge_attention_fused as eaf

    n, sp, d = 2712, 24, 128
    for tn, expected in ((64, "vmem"), (256, "vmem"), (512, "dma")):
        rows = max(n, -(-n // tn) * tn) * sp
        got = eaf._resolve_gather("auto", rows, d, 4, tile_rows=tn * sp)
        assert got == expected, (tn, got)
    # explicit choices are always honored
    assert eaf._resolve_gather("dma", 1, d, 4) == "dma"
    assert eaf._resolve_gather("vmem", 10**9, d, 4) == "vmem"
