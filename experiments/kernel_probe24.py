"""Probe 24: block-diagonal scores at B*SP = one lane tile vs the
compact batched-dot body.

probe18-23 left the non-softmax time attributed to per-group MXU ISSUE
count: the compact body's [SP, dh] x [dh, SP] batched dots are ~4% of
an MXU tile each, likely lowered one issue per batch element. The
legacy block-diag body computes a group's scores as ONE 2-D
[B*SP, dh] x [dh, B*SP] dot. r1 measured it slower at G=8 — where
B*SP = 192 spills into a SECOND 128-lane tile, doubling every VPU
softmax pass. At B=5 (B*SP = 120 <= 128) the block-diag softmax chain
covers the SAME sublane rows and the SAME one lane-tile as the compact
body — identical VPU cost, ~5x fewer MXU issues. If the issue-count
theory is right, B=5 wins; B=8 should reproduce r1's loss.

Arms (Cora vmem, v6 path, tn256): compact g=32 (prod), block-diag
B=2/4/5/8. Parity-checked against compact on chip.
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

    def make_fwd(compact, group):
        @jax.jit
        def fwd(x, p):
            out = amp_edge_attention_pallas(
                x, p, sj, rj, None, ts_, tr_, tv_, h,
                tile_nodes=tn, gather="vmem", fused_bwd=False,
                scatterfree=False, compact=compact, group=group,
            )
            return jnp.sum(jnp.abs(out)), x * 1.000001, out

        return fwd

    arms = {"compact_g32": make_fwd(True, 0)}
    for b in (2, 4, 5, 8):
        arms[f"blockdiag_b{b}"] = make_fwd(False, b)

    ref = None
    dead = []
    for name, fwd in arms.items():
        t0 = time.time()
        try:
            out = fwd(x, p)[2]
            jax.block_until_ready(out)
        except Exception as ex:
            print(f"{name}: FAILED ({type(ex).__name__}: {str(ex)[:140]})",
                  flush=True)
            dead.append(name)
            continue
        if ref is None:
            ref = np.asarray(out)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(out) - ref)))
        print(f"{name}: compile+first {time.time()-t0:.1f}s  "
              f"max|d| vs compact {err:.2e}", flush=True)
    for name in dead:
        arms.pop(name)

    iters = 64
    for rep in range(3):
        for name, fwd in arms.items():
            xx = x
            l, xx, _ = fwd(xx, p)
            jax.block_until_ready(l)
            t0 = time.time()
            for _ in range(iters):
                l, xx, _ = fwd(xx, p)
            jax.block_until_ready(l)
            dt = (time.time() - t0) / iters
            print(f"rep {rep} {name:14s} {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
