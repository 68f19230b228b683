"""Production-path sweep at Cora scale: tile_nodes x group x dtype.

The bench headline times make_pallas_edge_attention (v2 vmem kernel).
This sweeps its tunables on the device to pick defaults:
  tile_nodes in {32, 64, 128}, group in {16, 32, 64}, f32 vs bf16.
Run ONE instance at a time (the TPU tunnel serializes clients).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_inputs, time_fn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ampnet_tpu.ops.edge_attention import MHAParams  # noqa: E402
from ampnet_tpu.ops.pallas.edge_attention_fused import (  # noqa: E402
    make_pallas_edge_attention,
)

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def median3(fn, *args):
    ts = [time_fn(fn, *args, iters=10) for _ in range(3)]
    return sorted(ts)[1], ts


def main():
    e, h = 10556, 4
    x, senders, receivers, params = build_inputs(e=e)
    n = x.shape[0]
    p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])
    mask = np.ones(e, bool)

    results = []
    for dtype_name in ("f32", "bf16"):
        if dtype_name == "bf16":
            xx = x.astype(jnp.bfloat16)
            pp = MHAParams(*(a.astype(jnp.bfloat16) for a in
                             (p.w_qkv, p.b_qkv, p.w_out, p.b_out)))
        else:
            xx, pp = x, p
        for tn in (32, 64, 128):
            for g in (16, 32, 64):
                try:
                    fused = make_pallas_edge_attention(
                        np.asarray(senders), np.asarray(receivers), mask, n, h,
                        tile_nodes=tn, group=g)
                    med, ts = median3(lambda a: fused(a, pp), xx)
                    log(f"{dtype_name} tn={tn} g={g}: {med*1e3:.3f} ms "
                        f"{[f'{t*1e3:.2f}' for t in ts]} ({e/med/1e6:.2f} M edges/s)")
                    results.append((med, dtype_name, tn, g))
                except Exception as err:
                    log(f"{dtype_name} tn={tn} g={g}: FAILED {type(err).__name__}: {err}")
    results.sort()
    log(f"BEST: {results[0]}")


if __name__ == "__main__":
    main()
