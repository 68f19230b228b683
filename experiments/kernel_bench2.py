"""v1 vs v2 fused-kernel benchmark + group-size sweep at Cora scale.

One process, sequential variants, prints each result immediately with
timestamps (compiles through the TPU relay can be slow — never kill this
mid-stream, the relay wedges).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_inputs, time_fn  # noqa: E402  (enables compile cache)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ampnet_tpu.ops.pallas.format import build_tiled_csr  # noqa: E402
from ampnet_tpu.ops.pallas.edge_attention_fused import (  # noqa: E402
    _fused_edge_sums,
    _fused_edge_sums_v2,
)

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def build(e=10556, n=2708, s=20, d=128, tile_nodes=64, seed=0):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    sp = 24
    tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool),
                           -(-n // tile_nodes) * tile_nodes,
                           tile_nodes=tile_nodes, group=8)
    nt = tcsr.num_tiles * tcsr.tile_nodes
    q_rows = jnp.asarray(rng.normal(size=(nt * sp, d)), jnp.float32)
    kv_rows = jnp.asarray(rng.normal(size=(nt * sp, 2 * d)), jnp.float32)
    return tcsr, q_rows, kv_rows, dict(s=s, d=d, e=e, sp=sp, tile_nodes=tile_nodes)


def main():
    results = {}
    tcsr, q_rows, kv_rows, meta = build()
    ts = jnp.asarray(tcsr.senders)[:, None, :]
    tr = jnp.asarray(tcsr.recv_local)[:, None, :]
    tv = jnp.asarray(tcsr.valid)[:, None, :]
    tc = jnp.asarray(tcsr.counts)
    e = meta["e"]
    log(f"built: tiles={tcsr.num_tiles} emax={tcsr.edges_per_tile} "
        f"padded={tcsr.num_tiles*tcsr.edges_per_tile}")

    def rec(name, fn):
        log(f"timing {name} ...")
        try:
            t = time_fn(fn, q_rows, k1=2, k2=12)
            results[name] = round(t * 1e3, 4)
            log(f"  {name}: {t*1e3:.3f} ms  ({e/t/1e6:.2f} M edges/s)")
        except Exception as err:
            results[name] = f"ERROR {type(err).__name__}: {err}"
            log(f"  {name}: FAILED {type(err).__name__}: {err}")

    rec("v1 g=8 (round-1 default)", lambda q: _fused_edge_sums(
        q, kv_rows, ts, tr, tv, num_heads=4, softmax=True,
        tile_nodes=64, group=8, num_tiles=tcsr.num_tiles,
        emax=tcsr.edges_per_tile, s=meta["s"], gather="vmem"))

    for g in (5, 8, 4, 2, 10):
        rec(f"v2 g={g}", lambda q, g=g: _fused_edge_sums_v2(
            q, kv_rows, ts, tr, tv, tc, num_heads=4, softmax=True,
            tile_nodes=64, group=g, num_tiles=tcsr.num_tiles,
            emax=tcsr.edges_per_tile, s=meta["s"]))

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
