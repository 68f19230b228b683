"""Probe 8: head-STACKED compact softmax body vs per-head (r2).

The per-head body runs 5 VPU ops x H heads per group over [G, SP, SP]
tensors whose 24-wide lane dim pads to 128 (5.3x lane waste); softmax
measured ~45% of kernel time (probe3c). The stacked body batches heads
on axis 0 of ONE 3-D dot so the chain runs once over [H*G, SP, SP] —
same element count, 4x fewer op invocations. Sweep G to re-find the
optimum (per-group fixed cost changed).

Run ONE instance at a time (the TPU tunnel serializes clients).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_inputs, time_fn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ampnet_tpu.ops.edge_attention import MHAParams  # noqa: E402
from ampnet_tpu.ops.pallas import edge_attention_fused as eaf  # noqa: E402

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main():
    e, h = 10556, 4
    x, senders, receivers, params = build_inputs(e=e)
    n = x.shape[0]
    p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])

    results = {}
    ref = None
    for stacked in (False, True):
        for g in ((32,) if not stacked else (96, 128, 160, 192)):
            eaf.STACKED_SOFTMAX_DEFAULT = stacked
            orig_auto = eaf._auto_group
            eaf._auto_group = lambda sp, emax, gather, _g=g: (
                _g if gather == "vmem" else orig_auto(sp, emax, gather))
            try:
                fused = eaf.make_pallas_edge_attention(
                    np.asarray(senders), np.asarray(receivers),
                    np.ones(e, bool), n, h,
                )
                out = fused(x, p)
                if ref is None:
                    ref = np.asarray(out)
                    err = 0.0
                else:
                    err = float(np.max(np.abs(np.asarray(out) - ref)))
                name = f"{'stacked' if stacked else 'perhead'} g={g}"
                log(f"timing {name} (err {err:.1e}) ...")
                ts = sorted(time_fn(lambda xx: fused(xx, p), x) for _ in range(3))
                t = ts[1]
                results[name] = round(t * 1e3, 4)
                log(f"  {name}: {t*1e3:.3f} ms median of "
                    f"{['%.2f' % (u*1e3) for u in ts]} ({e/t/1e6:.2f} M edges/s)")
            except Exception as exc:
                results[f"{'stacked' if stacked else 'perhead'} g={g}"] = (
                    f"ERR {type(exc).__name__}: {str(exc).splitlines()[0][:120]}")
                log(results[f"{'stacked' if stacked else 'perhead'} g={g}"])
            finally:
                eaf._auto_group = orig_auto
    eaf.STACKED_SOFTMAX_DEFAULT = False
    print(json.dumps(results))


if __name__ == "__main__":
    main()
