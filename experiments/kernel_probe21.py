"""Probe 21: scatter-as-matmul (v8/mm) vs the per-edge RMW accumulate,
interleaved pairwise on chip.

probe19 (dma) and probe20 (vmem/v6) measured the per-edge dynamic-row
accumulate loop at ~half the forward kernel. The mm body buffers each
tile's messages token-major ([SP, EG, D] scratch) and segment-sums via
SP exact one-hot [TN, EG] x [EG, D] MXU dots. Matmul FLOPs scale with
TILE_NODES (TN x SP x D x 2 per edge), so the sweep includes smaller
tiles where the dots are nearly free.

Arms:
  cora:  v6 fwd at the headline bench config — mm on/off, tn 256/128/64
  dma:   200k-edge dma fwd — v8 vs v4, tn 256/64
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np

from common import _enable_compile_cache  # noqa: F401


def bench_arms(arms, x, p, iters, reps=3):
    import jax

    dead = []
    for name, fwd in arms.items():
        t0 = time.time()
        try:
            jax.block_until_ready(fwd(x, p)[0])
        except Exception as ex:
            print(f"{name}: FAILED ({type(ex).__name__}: {str(ex)[:160]})",
                  flush=True)
            dead.append(name)
            continue
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
    for name in dead:
        arms.pop(name)
    for rep in range(reps):
        for name, fwd in arms.items():
            xx = x
            l, xx = fwd(xx, p)
            jax.block_until_ready(l)
            t0 = time.time()
            for _ in range(iters):
                l, xx = fwd(xx, p)
            jax.block_until_ready(l)
            dt = (time.time() - t0) / iters
            print(f"rep {rep} {name:12s} {dt*1e3:7.3f} ms", flush=True)


def make_case(n, e, seed=0):
    import jax.numpy as jnp

    from ampnet_tpu.ops.edge_attention import MHAParams

    s, d = 20, 128
    rng = np.random.default_rng(seed)
    receivers = np.sort(rng.integers(0, n, e)).astype(np.int32)
    senders = rng.integers(0, n, e).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, s, d)) * 0.1, jnp.float32)
    p = MHAParams(
        w_qkv=jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.05, jnp.float32),
        b_qkv=jnp.zeros((3 * d,), jnp.float32),
        w_out=jnp.asarray(rng.normal(size=(d, d)) * 0.05, jnp.float32),
        b_out=jnp.zeros((d,), jnp.float32),
    )
    return x, p, senders, receivers


def make_fwd(x, p, senders, receivers, tn, gather, mm, h=4):
    import jax
    import jax.numpy as jnp

    from ampnet_tpu.ops.pallas.edge_attention_fused import (
        amp_edge_attention_pallas,
    )
    from ampnet_tpu.ops.pallas.format import build_tiled_csr

    n = x.shape[0]
    n_pad = -(-n // tn) * tn
    tcsr = build_tiled_csr(senders, receivers, np.ones(len(senders), bool),
                           n_pad, tile_nodes=tn, group=8)
    ts_ = jnp.asarray(tcsr.senders)
    tr_ = jnp.asarray(tcsr.recv_local)
    tv_ = jnp.asarray(tcsr.valid)
    sj = jnp.asarray(senders)
    rj = jnp.asarray(receivers)

    @jax.jit
    def fwd(x, p):
        out = amp_edge_attention_pallas(
            x, p, sj, rj, None, ts_, tr_, tv_, 4,
            tile_nodes=tn, gather=gather, fused_bwd=False,
            scatterfree=False, mm_scatter=mm,
        )
        return jnp.sum(jnp.abs(out)), x * 1.000001

    return fwd, tcsr.edges_per_tile


def cora():
    x, p, senders, receivers = make_case(2712, 10556)
    arms = {}
    for tn in (256, 128, 64):
        for mm in (True, False):
            fwd, emax = make_fwd(x, p, senders, receivers, tn, "vmem", mm)
            arms[f"tn{tn}_{'mm' if mm else 'loop'}"] = fwd
            if mm:
                print(f"tn{tn}: EMAX={emax}", flush=True)
    bench_arms(arms, x, p, iters=64)


def dma():
    x, p, senders, receivers = make_case(20_000, 200_000)
    arms = {}
    for tn in (256, 64):
        for mm in (True, False):
            fwd, emax = make_fwd(x, p, senders, receivers, tn, "dma", mm)
            arms[f"tn{tn}_{'mm' if mm else 'loop'}"] = fwd
            if mm:
                print(f"tn{tn}: EMAX={emax}", flush=True)
    bench_arms(arms, x, p, iters=8)


if __name__ == "__main__":
    if "--dma" in sys.argv:
        dma()
    else:
        cora()
