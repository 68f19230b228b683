"""Probe 17: direct VMEM Q loads vs async Q DMAs in the v4 dma body,
interleaved pairwise on chip.

Probe16 showed the dma path is ISSUE-bound (bf16 streams with 2/3 the
bytes measured 1.10x SLOWER), so the lever is fewer DMA issues, not
smaller ones. The per-edge Q rows live in the tile's own BlockSpec
VMEM block — fetching them by async DMA (as v4 did) burns half the
issue slots on copies a plain vector load can do in-body. direct_q=True
deletes those issues; this probe measures the forward and the full
train step at --mid (N=20k, E=200k) and 1M-edge scales.
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np

from common import _enable_compile_cache  # noqa: F401  (cache on import)


def run(n, e, reps=4, iters=4, fwd_only=False):
    import jax
    import jax.numpy as jnp
    import optax

    from ampnet_tpu.ops.edge_attention import MHAParams
    from ampnet_tpu.ops.pallas.edge_attention_fused import (
        amp_edge_attention_pallas,
    )
    from ampnet_tpu.ops.pallas.format import build_tiled_csr

    s, d, h = 20, 128, 4
    tn = 256
    rng = np.random.default_rng(0)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, s, d)) * 0.1, jnp.float32)
    p = MHAParams(
        w_qkv=jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.05, jnp.float32),
        b_qkv=jnp.zeros((3 * d,), jnp.float32),
        w_out=jnp.asarray(rng.normal(size=(d, d)) * 0.05, jnp.float32),
        b_out=jnp.zeros((d,), jnp.float32),
    )
    senders_j = jnp.asarray(senders)
    receivers_j = jnp.asarray(receivers)
    tx = optax.adam(1e-3)

    n_pad = -(-n // tn) * tn
    tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool), n_pad,
                           tile_nodes=tn, group=8)
    stcsr = build_tiled_csr(receivers, senders, np.ones(e, bool), n_pad,
                            tile_nodes=tn, group=8)
    ts_ = jnp.asarray(tcsr.senders)
    tr_ = jnp.asarray(tcsr.recv_local)
    tv_ = jnp.asarray(tcsr.valid)
    snd_kw = dict(
        snd_receivers=jnp.asarray(stcsr.senders),
        snd_local=jnp.asarray(stcsr.recv_local),
        snd_valid=jnp.asarray(stcsr.valid),
        snd_counts=jnp.asarray(stcsr.counts),
    )

    steps = {}
    for mode, dq in (("direct", True), ("async", False)):

        def loss_fn(x, p, dq=dq):
            out = amp_edge_attention_pallas(
                x, p, senders_j, receivers_j, None, ts_, tr_, tv_, h,
                tile_nodes=tn, gather="dma", fused_bwd=True,
                scatterfree=True, direct_q=dq, **snd_kw,
            )
            return jnp.sum(out * out)

        if fwd_only:
            @jax.jit
            def step(x, p, opt_state, loss_fn=loss_fn):
                return loss_fn(x, p), x, p, opt_state
        else:
            @jax.jit
            def step(x, p, opt_state, loss_fn=loss_fn):
                loss, (gx, gp) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1))(x, p)
                updates, opt_state = tx.update(gp, opt_state)
                p = optax.apply_updates(p, updates)
                return loss, x - 1e-3 * gx, p, opt_state

        steps[mode] = step

    losses = {}
    for mode, step in steps.items():
        opt_state = tx.init(p)
        t0 = time.time()
        loss, *_ = step(x, p, opt_state)
        jax.block_until_ready(loss)
        losses[mode] = float(loss)
        print(f"{mode}: compile+first {time.time()-t0:.1f}s "
              f"loss={losses[mode]:.6e}", flush=True)
    print(f"loss |d| = {abs(losses['direct']-losses['async']):.3e}",
          flush=True)

    ratios = []
    for r in range(reps):
        ts2 = {}
        order = (("direct", "async") if r % 2 == 0 else ("async", "direct"))
        for mode in order:
            step = steps[mode]
            xx, pp, os_ = x, p, tx.init(p)
            loss, xx, pp, os_ = step(xx, pp, os_)  # re-warm
            jax.block_until_ready(loss)
            t0 = time.time()
            for _ in range(iters):
                loss, xx, pp, os_ = step(xx, pp, os_)
            jax.block_until_ready(loss)
            ts2[mode] = (time.time() - t0) / iters
        ratios.append(ts2["direct"] / ts2["async"])
        print(f"rep {r}: direct {ts2['direct']*1e3:8.1f} ms  async "
              f"{ts2['async']*1e3:8.1f} ms  ratio {ratios[-1]:.3f}",
              flush=True)
    med = sorted(ratios)[len(ratios) // 2]
    kind = "fwd" if fwd_only else "train step"
    print(f"{e}-edge {kind}: median ratio direct/async = {med:.3f} "
          f"({'direct_q faster' if med < 1 else 'direct_q not faster'})",
          flush=True)


if __name__ == "__main__":
    fwd_only = "--fwd" in sys.argv
    if "--mid" in sys.argv:
        run(20_000, 200_000, fwd_only=fwd_only)
    else:
        run(100_000, 1_000_000, fwd_only=fwd_only)
