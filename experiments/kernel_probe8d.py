"""Probe 8d: INTERLEAVED pairwise A/B of perhead-g32 vs stacked-g96/g192.

probe8b measured stacked g=96 28% FASTER than perhead g=32; probe8c
(later tenancy window) measured it 9% SLOWER. Sequential A/B through the
relay confounds config with tenancy drift. Here each rep times all
configs back-to-back (A,B,C,A,B,C,...) so pairwise per-rep deltas cancel
the drift; report per-rep ratios and medians.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_inputs, time_fn  # noqa: E402

from ampnet_tpu.ops.edge_attention import MHAParams  # noqa: E402
from ampnet_tpu.ops.pallas import edge_attention_fused as eaf  # noqa: E402

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def build(g, senders, receivers, e, n, h):
    # group is BAKED into the closure via the explicit kwarg; the stacked
    # flag is NOT — it resolves at call/trace time from the module
    # default, so every dispatch below must set it first. (The original
    # version of this probe monkeypatched _auto_group and the flag inside
    # a finally that ran BEFORE any call — all three "configs" compiled
    # the identical per-head auto-group kernel and the recorded "neutral"
    # A/B compared a kernel against itself. RESULTS.md corrected.)
    return eaf.make_pallas_edge_attention(
        np.asarray(senders), np.asarray(receivers), np.ones(e, bool), n, h,
        group=g)


def main():
    e, h = 10556, 4
    x, senders, receivers, params = build_inputs(e=e)
    n = x.shape[0]
    p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])

    configs = [("perhead g=32", False, 32), ("stacked g=96", True, 96),
               ("stacked g=192", True, 192)]
    fns = {}
    for name, stacked, g in configs:
        fns[name] = build(g, senders, receivers, e, n, h)
        eaf.STACKED_SOFTMAX_DEFAULT = stacked
        fns[name](x, p)  # compile under the right flag
        log(f"compiled {name}")

    reps = {name: [] for name, *_ in configs}
    for rep in range(6):
        for name, stacked, g in configs:
            eaf.STACKED_SOFTMAX_DEFAULT = stacked  # read at trace time
            t = time_fn(lambda xx, f=fns[name]: f(xx, p), x)
            reps[name].append(t * 1e3)
        log(f"rep {rep}: " + " | ".join(
            f"{name} {reps[name][-1]:.2f}ms" for name, *_ in configs))

    base = np.array(reps["perhead g=32"])
    out = {}
    for name, *_ in configs:
        arr = np.array(reps[name])
        ratios = arr / base
        out[name] = {
            "median_ms": round(float(np.median(arr)), 4),
            "ratio_vs_perhead_per_rep": [round(float(r), 3) for r in ratios],
            "median_ratio": round(float(np.median(ratios)), 3),
        }
        log(f"{name}: median {np.median(arr):.3f} ms, "
            f"median ratio vs perhead {np.median(ratios):.3f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
