"""Probe 18: what actually binds the dma-path forward?

Probe16 (bf16, 2/3 bytes): 1.10x SLOWER -> not byte-bound.
Probe17 (direct_q, half the DMA issues): 0.98x -> not issue-bound.
Remaining suspects: (a) per-group DMA CONCURRENCY (only 2 x G copies in
flight; bigger groups or deeper pipelining raise it), (b) HBM
random-access row spread (random senders touch every HBM page; a
locality control with senders == receiver-neighbors should fly if so).

Arms (fwd-only, N=20k / E=200k, interleaved vs the g=auto(32) random
baseline):
  group sweep: g=64, g=128 (direct_q on)
  locality:    senders = receiver+1 (near rows), senders = const 0
               (one row, maximally reusable) — both at g=auto
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np

from common import _enable_compile_cache  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp

    from ampnet_tpu.ops.edge_attention import MHAParams
    from ampnet_tpu.ops.pallas.edge_attention_fused import (
        amp_edge_attention_pallas,
    )
    from ampnet_tpu.ops.pallas.format import build_tiled_csr

    n, e, s, d, h = 20_000, 200_000, 20, 128, 4
    tn = 256
    rng = np.random.default_rng(0)
    receivers = rng.integers(0, n, e).astype(np.int32)
    senders_rand = rng.integers(0, n, e).astype(np.int32)
    senders_near = ((receivers + 1) % n).astype(np.int32)
    senders_one = np.zeros(e, np.int32)
    x = jnp.asarray(rng.normal(size=(n, s, d)) * 0.1, jnp.float32)
    p = MHAParams(
        w_qkv=jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.05, jnp.float32),
        b_qkv=jnp.zeros((3 * d,), jnp.float32),
        w_out=jnp.asarray(rng.normal(size=(d, d)) * 0.05, jnp.float32),
        b_out=jnp.zeros((d,), jnp.float32),
    )
    receivers_j = jnp.asarray(receivers)
    n_pad = -(-n // tn) * tn

    def make_fwd(senders, group):
        tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool), n_pad,
                               tile_nodes=tn, group=8)
        ts_ = jnp.asarray(tcsr.senders)
        tr_ = jnp.asarray(tcsr.recv_local)
        tv_ = jnp.asarray(tcsr.valid)
        sj = jnp.asarray(senders)

        @jax.jit
        def fwd(x, p):
            out = amp_edge_attention_pallas(
                x, p, sj, receivers_j, None, ts_, tr_, tv_, h,
                tile_nodes=tn, gather="dma", fused_bwd=False,
                scatterfree=False, group=group,
            )
            # carry a mutated x so repeated dispatches are never
            # byte-identical (the relay dedupes identical calls)
            return jnp.sum(out * out), x * 1.000001
        return fwd

    arms = {
        "base_g32": make_fwd(senders_rand, 0),
        "g64": make_fwd(senders_rand, 64),
        "g128": make_fwd(senders_rand, 128),
        "near_g32": make_fwd(senders_near, 0),
        "one_g32": make_fwd(senders_one, 0),
    }
    dead = []
    for name, fwd in arms.items():
        t0 = time.time()
        try:
            jax.block_until_ready(fwd(x, p)[0])
        except Exception as ex:
            print(f"{name}: FAILED compile/first ({type(ex).__name__}: "
                  f"{str(ex)[:200]})", flush=True)
            dead.append(name)
            continue
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
    for name in dead:
        arms.pop(name)

    iters = 8
    for rep in range(3):
        for name, fwd in arms.items():
            xx = x
            l, xx = fwd(xx, p)
            jax.block_until_ready(l)
            t0 = time.time()
            for _ in range(iters):
                l, xx = fwd(xx, p)
            jax.block_until_ready(l)
            dt = (time.time() - t0) / iters
            print(f"rep {rep} {name:9s} {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
