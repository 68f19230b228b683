"""Probe 20: probe19's ablation on the VMEM/v6 path at Cora scale (the
headline bench config). If the per-edge accumulate loop is a similar
share here, the scatter-as-matmul body (v8) should also lift the
headline number, not just the production-scale dma path.

Arms: full, nosm (softmax=False), noacc (fixed-row RMW), nogather (skip
per-edge q/kv VMEM copies) — timing only, never parity-safe.
"""
import os
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
    receivers_j = jnp.asarray(receivers)
    sj = jnp.asarray(senders)
    n_pad = -(-n // tn) * tn
    tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool), n_pad,
                           tile_nodes=tn, group=8)
    ts_ = jnp.asarray(tcsr.senders)
    tr_ = jnp.asarray(tcsr.recv_local)
    tv_ = jnp.asarray(tcsr.valid)

    def make_fwd(ablate, softmax=True):
        os.environ["AMPNET_ABLATE"] = ablate

        @jax.jit
        def fwd(x, p):
            out = amp_edge_attention_pallas(
                x, p, sj, receivers_j, None, ts_, tr_, tv_, h,
                tile_nodes=tn, gather="vmem", fused_bwd=False,
                scatterfree=False, softmax=softmax,
            )
            return jnp.sum(jnp.abs(out)), x * 1.000001

        jax.block_until_ready(fwd(x, p)[0])
        os.environ["AMPNET_ABLATE"] = ""
        return fwd

    arms = {}
    for name, (ab, sm) in {
        "full": ("", True),
        "nosm": ("", False),
        "noacc": ("noacc", True),
        "nogather": ("nogather", True),
        "bare": ("noacc+nogather", True),
    }.items():
        t0 = time.time()
        arms[name] = make_fwd(ab, sm)
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)

    iters = 64
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
            print(f"rep {rep} {name:8s} {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
