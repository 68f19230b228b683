"""Probe 23: bf16 MXU operands for the per-edge attention dots.

probe21/22 exonerated the accumulate loop (the probe19/20 'noacc'
ablation was DCE-confounded) — the kernel's non-softmax time sits in
the tiny batched dots ([SP, dh] x [dh, SP] per group per head, ~4% MXU
utilization), where f32 operands pay multi-pass bf16 emulation.
mxu_bf16 casts JUST the dot operands to bf16 (f32 accumulation,
layouts/softmax untouched). This probe A/Bs it at the headline config
(Cora, vmem/v6, tn256) and reports the output delta vs f32.
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

    n, e, s, d, h = 2712, 10556, 20, 128, 4
    tn = 256
    rng = np.random.default_rng(0)
    receivers = np.sort(rng.integers(0, n, e)).astype(np.int32)
    senders = rng.integers(0, n, e).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, s, d)) * 0.1, jnp.float32)
    p = MHAParams(
        w_qkv=jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.05, jnp.float32),
        b_qkv=jnp.zeros((3 * d,), jnp.float32),
        w_out=jnp.asarray(rng.normal(size=(d, d)) * 0.05, jnp.float32),
        b_out=jnp.zeros((d,), jnp.float32),
    )
    rj = jnp.asarray(receivers)
    sj = jnp.asarray(senders)
    n_pad = -(-n // tn) * tn
    tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool), n_pad,
                           tile_nodes=tn, group=8)
    ts_ = jnp.asarray(tcsr.senders)
    tr_ = jnp.asarray(tcsr.recv_local)
    tv_ = jnp.asarray(tcsr.valid)

    def make_fwd(bf16):
        @jax.jit
        def fwd(x, p):
            out = amp_edge_attention_pallas(
                x, p, sj, rj, None, ts_, tr_, tv_, h,
                tile_nodes=tn, gather="vmem", fused_bwd=False,
                scatterfree=False, mxu_bf16=bf16,
            )
            return jnp.sum(jnp.abs(out)), x * 1.000001, out

        t0 = time.time()
        jax.block_until_ready(fwd(x, p)[0])
        print(f"{'bf16' if bf16 else 'f32 '}: compile+first "
              f"{time.time()-t0:.1f}s", flush=True)
        return fwd

    arms = {"f32": make_fwd(False), "bf16": make_fwd(True)}
    o32 = np.asarray(arms["f32"](x, p)[2])
    o16 = np.asarray(arms["bf16"](x, p)[2])
    denom = np.maximum(np.abs(o32), 1e-6)
    print(f"output max rel |d| = {np.max(np.abs(o16-o32)/denom):.3e}  "
          f"mean rel = {np.mean(np.abs(o16-o32)/denom):.3e}", flush=True)

    iters = 64
    for rep in range(4):
        order = (("f32", "bf16") if rep % 2 == 0 else ("bf16", "f32"))
        ts2 = {}
        for name in order:
            fwd = arms[name]
            xx = x
            l, xx, _ = fwd(xx, p)
            jax.block_until_ready(l)
            t0 = time.time()
            for _ in range(iters):
                l, xx, _ = fwd(xx, p)
            jax.block_until_ready(l)
            ts2[name] = (time.time() - t0) / iters
        print(f"rep {rep}: bf16 {ts2['bf16']*1e3:7.3f} ms  f32 "
              f"{ts2['f32']*1e3:7.3f} ms  ratio {ts2['bf16']/ts2['f32']:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
