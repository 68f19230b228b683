"""Probe 14: tile-size boundary — tn=512 vs tn=256 at Cora scale.

Follow-up to probe11/12/13 (tn=256 default): padded-work/live only
improves 1.016 -> 1.008 at tn=512 while the per-tile working set pushes
the kernel past VMEM residency. First run FAILED compile at 102 MB > the
100 MB scoped limit (the residency guard didn't charge tile blocks —
fixed in _resolve_gather, which now degrades tn>=512 to the DMA path);
after the fix this probe runs with parity but measures the DMA fallback,
settling tn=256 as the end of the tile-granularity line.
"""
import sys
sys.path.insert(0, ".")
import numpy as np
import bench
import jax

import ampnet_tpu.ops.pallas.edge_attention_fused as eaf
from ampnet_tpu.ops.edge_attention import MHAParams

e, h = 10556, 4
x, senders, receivers, params = bench.build_inputs(e=e)
p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])
n = x.shape[0]
em = np.ones(e, bool)
eaf.FUSE_PROJ_DEFAULT = True

def build(tn):
    fused = eaf.make_pallas_edge_attention(
        np.asarray(senders), np.asarray(receivers), em, n, h, tile_nodes=tn)
    return lambda xx: fused(xx, p)

fns = {256: build(256), 512: build(512)}
o256 = np.asarray(jax.jit(fns[256])(x))
o512 = np.asarray(jax.jit(fns[512])(x))
print("parity 512 vs 256:", float(np.abs(o512 - o256).max()), flush=True)
ratios = []
for r in range(6):
    ts = {}
    for tn in (256, 512) if r % 2 == 0 else (512, 256):
        ts[tn] = bench.time_fn(fns[tn], x)
    ratios.append(ts[512] / ts[256])
    print(f"rep {r}: tn256 {ts[256]*1e3:.2f} ms tn512 {ts[512]*1e3:.2f} ms ratio {ratios[-1]:.3f}", flush=True)
print("median ratio tn512/tn256 =", sorted(ratios)[len(ratios)//2])
