"""Probe 10b: production-scale DMA forward A/B with BURST timing.

probe10 used bench.time_fn (fori_loop device chaining) — but wrapping
the 782-tile pallas_call in a fori_loop blew the XLA/Mosaic compile past
20 minutes PER CONFIG at 200k-edge scale (the bare kernel compiles in
~60 s), making the protocol unusable here. At these magnitudes the
device-loop defense is unnecessary: per-call kernel time (>= 40 ms) is
>> relay jitter (~ms), so a BURST of B async dispatches with DISTINCT
inputs (dedupe-proof), blocked once at the end, measures per-call time
to a few percent. Interleaved config order cancels tenancy drift.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (enables compile cache)

import jax  # noqa: E402
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


def burst_time(fn, xs, burst=6):
    """Dispatch fn on `burst` DISTINCT inputs, block once; per-call s."""
    outs = [fn(x) for x in xs[:burst]]
    t0 = time.perf_counter()
    outs = [fn(x) for x in xs[:burst]]  # timed burst (first was warm/queue)
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / burst


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

        # distinct inputs: scaled copies (cheap host-side, same layout)
        xs = [q_rows * (1.0 + 1e-4 * i) for i in range(8)]

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
        ref = None
        for name, fn in configs.items():
            r = np.asarray(fn(xs[0]))
            if ref is None:
                ref = r
            else:
                log(f"[{tag}] parity {name} vs v1: max abs err "
                    f"{float(np.max(np.abs(r - ref))):.3e}")
            log(f"[{tag}] compiled {name}")

        reps = {name: [] for name in configs}
        for rep in range(4):
            for name, fn in configs.items():
                t = burst_time(fn, xs)
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
