"""Packed-heads vs per-head compact softmax A/B at Cora scale.

Kernel-only timings pass `packed` explicitly; the full-op row uses the
module default (set AMPNET_PACKED_SOFTMAX before launch to flip it).
Run ONE instance at a time (the TPU tunnel serializes clients).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_inputs, time_fn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ampnet_tpu.ops.edge_attention import MHAParams  # noqa: E402
from ampnet_tpu.ops.pallas.format import build_tiled_csr  # noqa: E402
from ampnet_tpu.ops.pallas.edge_attention_fused import (  # noqa: E402
    PACKED_SOFTMAX_DEFAULT,
    _fused_edge_sums_v2,
    make_pallas_edge_attention,
)

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main():
    e, n, s, d, h, tn, g = 10556, 2708, 20, 128, 4, 64, 32
    sp = 24
    rng = np.random.default_rng(0)
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool),
                           -(-n // tn) * tn, tile_nodes=tn, group=g)
    nt = tcsr.num_tiles * tcsr.tile_nodes
    q_rows = jnp.asarray(rng.normal(size=(nt * sp, d)), jnp.float32)
    kv_rows = jnp.asarray(rng.normal(size=(nt * sp, 2 * d)), jnp.float32)
    ts = jnp.asarray(tcsr.senders)[:, None, :]
    tr = jnp.asarray(tcsr.recv_local)[:, None, :]
    tv = jnp.asarray(tcsr.valid)[:, None, :]
    tc = jnp.asarray(tcsr.counts)
    kw = dict(num_heads=h, softmax=True, tile_nodes=tn, group=g,
              num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile, s=s)

    for packed in (False, True):
        log(f"timing kernel packed={packed} ...")
        t = time_fn(lambda q, p=packed: _fused_edge_sums_v2(
            q, kv_rows, ts, tr, tv, tc, packed=p, **kw), q_rows)
        log(f"kernel packed={packed}: {t*1e3:.3f} ms  ({e/t/1e6:.2f} M edges/s)")

    # full op with the module default
    x, snd, rcv, params = build_inputs(e=e)
    fused = make_pallas_edge_attention(
        np.asarray(snd), np.asarray(rcv), np.ones(e, bool), n, h)
    p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])
    log(f"timing full op (module default packed={PACKED_SOFTMAX_DEFAULT}) ...")
    t = time_fn(lambda xx: fused(xx, p), x)
    log(f"full op packed={PACKED_SOFTMAX_DEFAULT}: {t*1e3:.3f} ms  "
        f"({e/t/1e6:.2f} M edges/s)")


if __name__ == "__main__":
    main()
