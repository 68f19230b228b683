"""Probe 10: production-scale DMA-gather forward — v1 block-diag vs
dma-compact (the v4 overlap body reading K|V from ANY/HBM).

The 'dma' gather mode (the only single-chip option beyond ~100k token
rows) ran the round-1 block-diagonal kernel until now: g=8 fixed,
[G*SP, G*SP] scores with 1/G useful work, and sequential per-group DMA
issue with only 2-deep double buffering. The compact route reuses the
v4 body (batched [G,SP,dh]x[G,dh,SP] dots, dynamic trip counts,
double-buffered async K|V+Q copies) with the K|V source in ANY — at
Cora scale the same body rework bought 1.6x (RESULTS.md v3 table).

Interleaved pairwise reps (A,B,A,B,...) cancel relay/tenancy drift.
Kernel-level timing (projections excluded) at two scales:
  - 200k edges / N=50k  (the RESULTS production-scale row)
  - 1M edges  / N=100k  (the train-step scale)
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import time_fn  # noqa: E402  (enables compile cache)

import jax.numpy as jnp  # noqa: E402

from ampnet_tpu.ops.pallas.format import build_tiled_csr  # noqa: E402
from ampnet_tpu.ops.pallas import edge_attention_fused as eaf  # noqa: E402

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def build(e, n, sp=24, d=128, tile_nodes=64, seed=0):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, n, e)
    receivers = rng.integers(0, n, e)
    tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool),
                           -(-n // tile_nodes) * tile_nodes,
                           tile_nodes=tile_nodes, group=8)
    nt = tcsr.num_tiles * tcsr.tile_nodes
    q_rows = jnp.asarray(rng.normal(size=(nt * sp, d)), jnp.float32)
    kv_rows = jnp.asarray(rng.normal(size=(nt * sp, 2 * d)), jnp.float32)
    return tcsr, q_rows, kv_rows


def main():
    scales = [("200k", 200_000, 50_000), ("1M", 1_000_000, 100_000)]
    out = {}
    for tag, e, n in scales:
        tcsr, q_rows, kv_rows = build(e, n)
        ts = jnp.asarray(tcsr.senders)[:, None, :]
        tr = jnp.asarray(tcsr.recv_local)[:, None, :]
        tv = jnp.asarray(tcsr.valid)[:, None, :]
        tc = jnp.asarray(tcsr.counts)
        emax = tcsr.edges_per_tile
        log(f"[{tag}] built: tiles={tcsr.num_tiles} emax={emax} "
            f"padded={tcsr.num_tiles*emax} ({tcsr.num_tiles*emax/e:.2f}x)")

        g_compact = eaf._auto_group(24, emax, "dma")
        configs = {
            "v1 g=8": lambda q: eaf._fused_edge_sums(
                q, kv_rows, ts, tr, tv, num_heads=4, softmax=True,
                tile_nodes=64, group=8 if emax % 8 == 0 else 1,
                num_tiles=tcsr.num_tiles, emax=emax, s=20, gather="dma"),
            f"compact g={g_compact}": lambda q: eaf._fused_edge_sums_v2(
                q, kv_rows, ts, tr, tv, tc, num_heads=4, softmax=True,
                tile_nodes=64, group=g_compact,
                num_tiles=tcsr.num_tiles, emax=emax, s=20, gather="dma"),
        }
        # parity first (also compiles both)
        ref = None
        for name, fn in configs.items():
            r = np.asarray(fn(q_rows))
            if ref is None:
                ref = r
            else:
                err = float(np.max(np.abs(r - ref)))
                log(f"[{tag}] parity {name} vs v1: max abs err {err:.3e}")
            log(f"[{tag}] compiled {name}")

        reps = {name: [] for name in configs}
        for rep in range(4):
            for name, fn in configs.items():
                t = time_fn(fn, q_rows, k1=1, k2=6)
                reps[name].append(t * 1e3)
            log(f"[{tag}] rep {rep}: " + " | ".join(
                f"{name} {reps[name][-1]:.1f}ms ({e/reps[name][-1]/1e3:.2f}M e/s)"
                for name in configs))

        names = list(configs)
        base = np.array(reps[names[0]])
        res = {}
        for name in names:
            arr = np.array(reps[name])
            res[name] = {
                "median_ms": round(float(np.median(arr)), 2),
                "median_Medges_s": round(float(e / np.median(arr) / 1e3), 3),
                "ratio_vs_v1_per_rep": [round(float(r), 3) for r in arr / base],
            }
            log(f"[{tag}] {name}: median {np.median(arr):.1f} ms "
                f"= {e/np.median(arr)/1e3:.2f} M edges/s")
        out[tag] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
