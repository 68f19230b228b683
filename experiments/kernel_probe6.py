"""v5 receiver-chunked kernel vs v2 edge-group kernel at Cora scale.

Times (device-loop, 3 repeats each, median): v2 g=32 baseline, chunked
C=4/8/16. Run ONE instance at a time (the TPU tunnel serializes clients).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import time_fn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ampnet_tpu.ops.pallas.format import (  # noqa: E402
    build_chunked_csr,
    build_tiled_csr,
)
from ampnet_tpu.ops.pallas.edge_attention_fused import (  # noqa: E402
    _fused_edge_sums_chunked,
    _fused_edge_sums_v2,
)

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def median3(fn, *args):
    ts = [time_fn(fn, *args) for _ in range(3)]
    return sorted(ts)[1], ts


def main():
    e, n, s, d, h, tn = 10556, 2708, 20, 128, 4, 64
    sp = 24
    rng = np.random.default_rng(0)
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    n_pad = -(-n // tn) * tn
    mask = np.ones(e, bool)

    tcsr = build_tiled_csr(senders, receivers, mask, n_pad, tile_nodes=tn,
                           group=32)
    nt = tcsr.num_tiles * tn
    q_rows = jnp.asarray(rng.normal(size=(nt * sp, d)), jnp.float32)
    kv_rows = jnp.asarray(rng.normal(size=(nt * sp, 2 * d)), jnp.float32)

    kw2 = dict(num_heads=h, softmax=True, tile_nodes=tn, group=32,
               num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile, s=s)
    ts2 = jnp.asarray(tcsr.senders)[:, None, :]
    tr2 = jnp.asarray(tcsr.recv_local)[:, None, :]
    tv2 = jnp.asarray(tcsr.valid)[:, None, :]
    tc2 = jnp.asarray(tcsr.counts)
    log("timing v2 g=32 (3 repeats)...")
    med, ts = median3(lambda q: _fused_edge_sums_v2(
        q, kv_rows, ts2, tr2, tv2, tc2, **kw2), q_rows)
    log(f"v2 g=32: median {med*1e3:.3f} ms {[f'{t*1e3:.2f}' for t in ts]} "
        f"({e/med/1e6:.2f} M edges/s)")

    for c in (4, 8, 16):
        ck = build_chunked_csr(senders, receivers, mask, n_pad,
                               tile_nodes=tn, chunk_edges=c)
        pad_factor = ck.chunks_per_tile * c * ck.num_tiles / e
        live_pad = ck.counts.sum() * c / e
        log(f"chunked C={c}: ncmax={ck.chunks_per_tile} "
            f"live-chunk edge slots/edge={live_pad:.2f} "
            f"(full pad {pad_factor:.2f})")
        cks = jnp.asarray(ck.senders)[:, None, :]
        ckr = jnp.asarray(ck.chunk_recv)[:, None, :]
        ckv = jnp.asarray(ck.valid)[:, None, :]
        ckc = jnp.asarray(ck.counts)
        med, ts = median3(lambda q, c=c, cks=cks, ckr=ckr, ckv=ckv, ckc=ckc,
                          ck=ck: _fused_edge_sums_chunked(
            q, kv_rows, cks, ckr, ckv, ckc,
            num_heads=h, softmax=True, tile_nodes=tn, chunk=c,
            num_tiles=ck.num_tiles, ncmax=ck.chunks_per_tile, s=s), q_rows)
        log(f"chunked C={c}: median {med*1e3:.3f} ms "
            f"{[f'{t*1e3:.2f}' for t in ts]} ({e/med/1e6:.2f} M edges/s)")


if __name__ == "__main__":
    main()
