"""Probe 22: attribute time inside the mm (scatter-as-matmul) body —
probe21 measured it flat vs the loop (~2.1 ms at Cora/tn128 on the v6
path), so the deleted RMW loop's 1.1 ms is being repaid somewhere.

Arms (Cora scale, vmem/v6-eligible fwd, tn128, timing-only):
  loop        current production body
  mm          full mm body
  mmnoepi     mm without the scatter dots (group loop + transpose store)
  mmfixed     mm with a FIXED-slot transpose store (epilogue on garbage)
  mmnotrans   mm with a transpose-free store (wrong values, same bytes)
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
    tn = 128
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

    def make_fwd(mm, ablate=""):
        os.environ["AMPNET_ABLATE"] = ablate

        @jax.jit
        def fwd(x, p):
            out = amp_edge_attention_pallas(
                x, p, sj, rj, None, ts_, tr_, tv_, h,
                tile_nodes=tn, gather="vmem", fused_bwd=False,
                scatterfree=False, mm_scatter=mm,
            )
            return jnp.sum(jnp.abs(out)), x * 1.000001

        jax.block_until_ready(fwd(x, p)[0])
        os.environ["AMPNET_ABLATE"] = ""
        return fwd

    arms = {}
    for name, (mm, ab) in {
        "loop": (False, ""),
        "mm": (True, ""),
        "mmnoepi": (True, "mmnoepi"),
        "mmfixed": (True, "mmfixed"),
        "mmnotrans": (True, "mmnotrans"),
    }.items():
        t0 = time.time()
        try:
            arms[name] = make_fwd(mm, ab)
        except Exception as ex:
            print(f"{name}: FAILED ({type(ex).__name__}: {str(ex)[:140]})",
                  flush=True)
            continue
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
            print(f"rep {rep} {name:10s} {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
