"""Direct op-level tests for fused_attention_aggregate (the multi-chip
building block) against the jnp math, interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ampnet_tpu.ops.edge_attention import MHAParams, attention_core
from ampnet_tpu.ops.pallas.edge_attention_fused import fused_attention_aggregate
from ampnet_tpu.ops.pallas.format import build_tiled_csr
from ampnet_tpu.ops.segment import segment_sum

S, D, H = 4, 16, 2


def build(rng, n_loc=8, n_all=24, e=30):
    q = jnp.asarray(rng.normal(size=(n_loc, S, D)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(n_all, S, 2 * D)).astype(np.float32))
    senders = rng.integers(0, n_all, e).astype(np.int32)       # global
    receivers = np.sort(rng.integers(0, n_loc, e)).astype(np.int32)  # local
    mask = np.ones(e, bool)
    mask[-4:] = False
    tcsr = build_tiled_csr(senders, receivers, mask, n_loc, tile_nodes=4, group=4)
    return q, kv, senders, receivers, mask, tcsr


def reference_sums(q, kv, senders, receivers, mask):
    d = q.shape[-1]
    qe = q[receivers]
    kve = kv[senders]
    msg, _ = attention_core(qe, kve[..., :d], kve[..., d:], H, softmax=True)
    return segment_sum(msg, jnp.asarray(receivers), q.shape[0], jnp.asarray(mask))


def test_fused_aggregate_forward(rng):
    q, kv, senders, receivers, mask, tcsr = build(rng)
    out = fused_attention_aggregate(
        q, kv, jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
        jnp.asarray(tcsr.valid), num_heads=H, tile_nodes=4, interpret=True,
    )
    ref = reference_sums(q, kv, senders, receivers, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_aggregate_grads(rng):
    q, kv, senders, receivers, mask, tcsr = build(rng)
    args = (jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local), jnp.asarray(tcsr.valid))

    def loss_fused(q, kv):
        out = fused_attention_aggregate(q, kv, *args, num_heads=H, tile_nodes=4, interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, kv):
        return jnp.sum(jnp.sin(reference_sums(q, kv, senders, receivers, mask)))

    gq_f, gkv_f = jax.grad(loss_fused, argnums=(0, 1))(q, kv)
    gq_r, gkv_r = jax.grad(loss_ref, argnums=(0, 1))(q, kv)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_r), rtol=3e-3, atol=3e-4)
    # dK|dV flows back to GLOBAL sender nodes (incl. ones outside the shard)
    np.testing.assert_allclose(np.asarray(gkv_f), np.asarray(gkv_r), rtol=3e-3, atol=3e-4)
    touched = np.unique(senders[mask])
    untouched = np.setdiff1d(np.arange(kv.shape[0]), touched)
    np.testing.assert_allclose(np.asarray(gkv_f)[untouched], 0.0, atol=1e-6)


def test_fused_aggregate_rejects_mismatched_tile_nodes(rng):
    """ADVICE r3: a tile_nodes inconsistent with the layout grid used to
    map recv_local to wrong rows silently — must raise instead."""
    q, kv, senders, receivers, mask, tcsr = build(rng)  # built at tile_nodes=4
    with pytest.raises(ValueError, match="tile_nodes"):
        fused_attention_aggregate(
            q, kv, jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
            jnp.asarray(tcsr.valid), num_heads=H, tile_nodes=256,
            interpret=True,
        )


def test_fused_aggregate_scatterfree_grads(rng):
    """Scatter-free backward for the partitioned building block: the
    sender-tiled dK|dV pass runs over the GLOBAL (all-gathered) node
    axis; grads must match the jnp reference (and thus the stream
    backward)."""
    n_loc, n_all = 8, 24
    q, kv, senders, receivers, mask, tcsr = build(rng, n_loc=n_loc,
                                                  n_all=n_all)
    stcsr = build_tiled_csr(receivers, senders, mask, n_all,
                            tile_nodes=4, group=4)
    args = (jnp.asarray(tcsr.senders), jnp.asarray(tcsr.recv_local),
            jnp.asarray(tcsr.valid))
    snd = dict(
        snd_receivers=jnp.asarray(stcsr.senders),
        snd_local=jnp.asarray(stcsr.recv_local),
        snd_valid=jnp.asarray(stcsr.valid),
        snd_counts=jnp.asarray(stcsr.counts),
    )

    def loss_fused(q, kv):
        out = fused_attention_aggregate(
            q, kv, *args, num_heads=H, tile_nodes=4, interpret=True,
            scatterfree=True, **snd)
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, kv):
        return jnp.sum(jnp.sin(reference_sums(q, kv, senders, receivers, mask)))

    gq_f, gkv_f = jax.grad(loss_fused, argnums=(0, 1))(q, kv)
    gq_r, gkv_r = jax.grad(loss_ref, argnums=(0, 1))(q, kv)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_r),
                               rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gkv_f), np.asarray(gkv_r),
                               rtol=3e-3, atol=3e-4)
