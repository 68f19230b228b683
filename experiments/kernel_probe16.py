"""Probe 16: bf16 per-edge streams (stream_bf16=True) vs f32 streams at
production DMA scale, interleaved pairwise on chip.

The 1M-edge train step is bound by the forward-like per-edge DMA passes
(RESULTS.md r4 scatter-free table: ~190 ms each). Casting the projected
q/kv (+ dsum/qdm) row arrays to bf16 halves the bytes each per-edge
async copy moves (2/3 net after the SP 24 -> 32 re-pad bf16 tiling
needs). If the passes are bandwidth-bound the step should drop toward
2/3; if they are DMA-ISSUE-bound (one copy per edge either way) the
ratio stays ~1 and the next attack is fewer/bigger copies, not smaller
ones. Both arms run the scatter-free backward (production default).

Scales: --mid (N=20k, E=200k) for iteration, default 1M (N=100k, E=1M).
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
    t0 = time.time()
    tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool), n_pad,
                           tile_nodes=tn, group=8)
    stcsr = build_tiled_csr(receivers, senders, np.ones(e, bool), n_pad,
                            tile_nodes=tn, group=8)
    print(f"layouts {time.time()-t0:.1f}s  recv EMAX={tcsr.edges_per_tile} "
          f"snd EMAX={stcsr.edges_per_tile}", flush=True)
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
    for mode, sbf16 in (("bf16", True), ("f32", False)):

        def loss_fn(x, p, sbf16=sbf16):
            out = amp_edge_attention_pallas(
                x, p, senders_j, receivers_j, None, ts_, tr_, tv_, h,
                tile_nodes=tn, gather="dma", fused_bwd=True,
                scatterfree=True, stream_bf16=sbf16, **snd_kw,
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
    rel = abs(losses["bf16"] - losses["f32"]) / max(abs(losses["f32"]), 1e-30)
    print(f"loss rel |d| = {rel:.3e} (bf16 input rounding)", flush=True)

    ratios = []
    for r in range(reps):
        ts2 = {}
        order = (("bf16", "f32") if r % 2 == 0 else ("f32", "bf16"))
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
        ratios.append(ts2["bf16"] / ts2["f32"])
        print(f"rep {r}: bf16 {ts2['bf16']*1e3:8.1f} ms  f32 "
              f"{ts2['f32']*1e3:8.1f} ms  ratio {ratios[-1]:.3f}",
              flush=True)
    med = sorted(ratios)[len(ratios) // 2]
    kind = "fwd" if fwd_only else "train step"
    print(f"{e}-edge {kind}: median ratio bf16/f32 = {med:.3f} "
          f"({'bf16 streams faster' if med < 1 else 'bf16 streams not faster'})",
          flush=True)


if __name__ == "__main__":
    fwd_only = "--fwd" in sys.argv
    if "--mid" in sys.argv:
        run(20_000, 200_000, fwd_only=fwd_only)
    else:
        run(100_000, 1_000_000, fwd_only=fwd_only)
