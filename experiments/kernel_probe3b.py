"""v3 follow-up sweep: larger G, bigger tiles, bf16."""
import json, sys, time
import numpy as np
sys.path.insert(0, ".")
from bench import time_fn
import jax, jax.numpy as jnp
from experiments.kernel_probe3 import run_v3, T0, log
from experiments.kernel_bench2 import build
from ampnet_tpu.ops.pallas.format import build_tiled_csr

def main():
    results = {}
    tcsr, q_rows, kv_rows, meta = build()
    ts = jnp.asarray(tcsr.senders)[:, None, :]
    tr = jnp.asarray(tcsr.recv_local)[:, None, :]
    tv = jnp.asarray(tcsr.valid)[:, None, :]
    tc = jnp.asarray(tcsr.counts)
    e = meta["e"]

    def rec(name, fn):
        log(f"timing {name} ...")
        try:
            t = time_fn(fn, q_rows, k1=2, k2=12)
            results[name] = round(t * 1e3, 4)
            log(f"  {name}: {t*1e3:.3f} ms ({e/t/1e6:.2f} M edges/s)")
        except Exception as err:
            results[name] = f"ERR {type(err).__name__}: {str(err)[:150]}"
            log(f"  {name}: FAILED {type(err).__name__}: {str(err)[:200]}")

    for g in (48, 64, 96):
        rec(f"v3 g={g}", lambda q, g=g: run_v3(
            q, kv_rows, ts, tr, tv, tc, num_heads=4, tile_nodes=64,
            group=g, num_tiles=tcsr.num_tiles, emax=tcsr.edges_per_tile,
            s=meta["s"]))

    # bigger tiles at g=32 (fewer tiles -> less cross-tile padding)
    tcsr2, q2, kv2, meta2 = build(tile_nodes=128)
    ts2 = jnp.asarray(tcsr2.senders)[:, None, :]
    tr2 = jnp.asarray(tcsr2.recv_local)[:, None, :]
    tv2 = jnp.asarray(tcsr2.valid)[:, None, :]
    tc2 = jnp.asarray(tcsr2.counts)
    # NOTE: rec() times with the OUTER q_rows; the tn=128 layout needs
    # its own q2 row count, so time this point directly
    log("timing v3 tn=128 g=32 ...")
    try:
        t = time_fn(lambda q: run_v3(
            q, kv2, ts2, tr2, tv2, tc2, num_heads=4, tile_nodes=128,
            group=32, num_tiles=tcsr2.num_tiles, emax=tcsr2.edges_per_tile,
            s=meta2["s"]), q2, k1=2, k2=12)
        results["v3 tn=128 g=32"] = round(t * 1e3, 4)
        log(f"  v3 tn=128 g=32: {t*1e3:.3f} ms ({e/t/1e6:.2f} M edges/s)")
    except Exception as err:
        results["v3 tn=128 g=32"] = f"ERR {type(err).__name__}"
        log(f"  v3 tn=128 g=32: ERR {err}")

    # bf16 at g=32 (sp stays 24 is illegal for bf16 (16-sublane tile);
    # rebuild with sp=32 by padding s->32)
    rng = np.random.default_rng(0)
    spb = 32
    nt = tcsr.num_tiles * tcsr.tile_nodes
    qb = jnp.asarray(rng.normal(size=(nt * spb, 128)), jnp.bfloat16)
    kvb = jnp.asarray(rng.normal(size=(nt * spb, 256)), jnp.bfloat16)
    rec2 = lambda q: run_v3(q, kvb, ts, tr, tv, tc, num_heads=4,
                            tile_nodes=64, group=32,
                            num_tiles=tcsr.num_tiles,
                            emax=tcsr.edges_per_tile, s=meta["s"])
    log("timing v3 bf16 g=32 (sp=32) ...")
    try:
        t = time_fn(rec2, qb, k1=2, k2=12)
        results["v3 bf16 g=32"] = round(t * 1e3, 4)
        log(f"  v3 bf16 g=32: {t*1e3:.3f} ms ({e/t/1e6:.2f} M edges/s)")
    except Exception as err:
        results["v3 bf16 g=32"] = f"ERR {type(err).__name__}: {str(err)[:150]}"
        log(f"  bf16 FAILED {type(err).__name__}: {str(err)[:200]}")

    print(json.dumps(results), flush=True)

if __name__ == "__main__":
    main()
