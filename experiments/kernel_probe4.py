"""v4 (async-gather overlap) timing + improved full-op."""
import json, sys, time
import numpy as np
sys.path.insert(0, ".")
from bench import time_fn, build_inputs
import jax, jax.numpy as jnp
from experiments.kernel_probe3 import log
from experiments.kernel_bench2 import build
from ampnet_tpu.ops.pallas.edge_attention_fused import _fused_edge_sums_v2

def main():
    results = {}
    tcsr, q_rows, kv_rows, meta = build()
    ts = jnp.asarray(tcsr.senders)[:, None, :]
    tr = jnp.asarray(tcsr.recv_local)[:, None, :]
    tv = jnp.asarray(tcsr.valid)[:, None, :]
    tc = jnp.asarray(tcsr.counts)
    e = meta["e"]
    kw = dict(num_heads=4, softmax=True, tile_nodes=64,
              num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile, s=meta["s"])

    def rec(name, fn):
        log(f"timing {name} ...")
        try:
            t = time_fn(fn, q_rows, k1=2, k2=12)
            results[name] = round(t * 1e3, 4)
            log(f"  {name}: {t*1e3:.3f} ms ({e/t/1e6:.2f} M edges/s)")
        except Exception as err:
            results[name] = f"ERR {type(err).__name__}: {str(err)[:150]}"
            log(f"  {name}: FAILED {type(err).__name__}: {str(err)[:250]}")

    for g in (32, 16, 64):
        rec(f"v4 overlap g={g}", lambda q, g=g: _fused_edge_sums_v2(
            q, kv_rows, ts, tr, tv, tc, group=g, overlap=True, **kw))

    # improved full-op (pad-before-projection + compact g=32 auto)
    from ampnet_tpu.ops.edge_attention import MHAParams
    from ampnet_tpu.ops.pallas.edge_attention_fused import make_pallas_edge_attention
    x, senders, receivers, params = build_inputs(e=e)
    fused = make_pallas_edge_attention(
        np.asarray(senders), np.asarray(receivers), np.ones(e, bool),
        x.shape[0], 4)
    p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])
    rec2 = lambda xx: fused(xx, p)
    log("timing full-op v2 (pad-first) ...")
    t = time_fn(rec2, x)
    results["full_op_padfirst_ms"] = round(t * 1e3, 4)
    log(f"  full-op: {t*1e3:.3f} ms ({e/t/1e6:.2f} M edges/s)")

    print(json.dumps(results), flush=True)

if __name__ == "__main__":
    main()
