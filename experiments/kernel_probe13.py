"""Probe 13: does the tn=256 tile-granularity win survive at 1M-edge
scale (the chunked-backward regime)?

Same setup as scripts/tpu_round2_batch.py::big_train_step (100k nodes,
1M random edges, S=20 D=128 H=4, fused fwd + chunked fused bwd + adam),
interleaved pairwise tn=64 vs tn=256. At this scale the per-tile edge
budget EMAX grows ~4x with tn=256; the dkv stream and VMEM guards must
absorb it — a FAIL or fallback here would mean the default flip needs a
scale gate.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def build(tn, senders, receivers, n, e, h):
    import jax.numpy as jnp

    from ampnet_tpu.ops.pallas.format import build_tiled_csr

    n_pad = -(-n // tn) * tn
    t0 = time.time()
    tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool), n_pad,
                           tile_nodes=tn, group=8)
    print(f"tn={tn}: layout {time.time()-t0:.1f}s T={tcsr.num_tiles} "
          f"EMAX={tcsr.edges_per_tile}", flush=True)
    ts = jnp.asarray(tcsr.senders).reshape(tcsr.num_tiles, -1)
    tr = jnp.asarray(tcsr.recv_local).reshape(tcsr.num_tiles, -1)
    tv = jnp.asarray(tcsr.valid).reshape(tcsr.num_tiles, -1)
    return ts, tr, tv


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from ampnet_tpu.ops.edge_attention import MHAParams
    from ampnet_tpu.ops.pallas.edge_attention_fused import (
        amp_edge_attention_pallas,
    )

    n, e, s, d, h = 100_000, 1_000_000, 20, 128, 4
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

    steps = {}
    for tn in (64, 256):
        ts, tr, tv = build(tn, senders, receivers, n, e, h)

        def loss_fn(x, p, ts=ts, tr=tr, tv=tv, tn=tn):
            out = amp_edge_attention_pallas(
                x, p, senders_j, receivers_j, None, ts, tr, tv, h,
                tile_nodes=tn, gather="dma", fused_bwd=True,
            )
            return jnp.sum(out * out)

        @jax.jit
        def step(x, p, opt_state, loss_fn=loss_fn):
            loss, (gx, gp) = jax.value_and_grad(loss_fn, argnums=(0, 1))(x, p)
            updates, opt_state = tx.update(gp, opt_state)
            p = optax.apply_updates(p, updates)
            return loss, x - 1e-3 * gx, p, opt_state

        steps[tn] = step

    # compile + loss parity from identical inputs
    losses = {}
    for tn, step in steps.items():
        opt_state = tx.init(p)
        t0 = time.time()
        loss, *_ = step(x, p, opt_state)
        jax.block_until_ready(loss)
        losses[tn] = float(loss)
        print(f"tn={tn}: compile+first {time.time()-t0:.1f}s "
              f"loss={losses[tn]:.6e}", flush=True)
    print(f"loss |d| = {abs(losses[64]-losses[256]):.3e}", flush=True)

    reps = 4
    iters = 4
    ratios = []
    for r in range(reps):
        ts_ = {}
        for tn in (64, 256) if r % 2 == 0 else (256, 64):
            step = steps[tn]
            xx, pp, os_ = x, p, tx.init(p)
            loss, xx, pp, os_ = step(xx, pp, os_)  # re-warm
            jax.block_until_ready(loss)
            t0 = time.time()
            for _ in range(iters):
                loss, xx, pp, os_ = step(xx, pp, os_)
            jax.block_until_ready(loss)
            ts_[tn] = (time.time() - t0) / iters
        ratios.append(ts_[256] / ts_[64])
        print(f"rep {r}: tn64 {ts_[64]*1e3:8.1f} ms  tn256 {ts_[256]*1e3:8.1f} ms "
              f"ratio {ratios[-1]:.3f}", flush=True)
    med = sorted(ratios)[len(ratios) // 2]
    print(f"1M-edge train step: median ratio tn256/tn64 = {med:.3f} "
          f"({'tn256 faster' if med < 1 else 'tn256 not faster'})", flush=True)


if __name__ == "__main__":
    main()
