"""v3 cost split at g=32 + multi-batch-dim dot probe + full-op bench."""
import json, sys, time
import numpy as np
sys.path.insert(0, ".")
from bench import time_fn, build_inputs
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from experiments.kernel_probe3 import log
from experiments.kernel_bench2 import build

def probe_2batch_dot():
    """scores for ALL heads in one dot: batch dims (G, H)."""
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )
    g, h, m, k = 8, 4, 24, 32
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(g, h, m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(g, h, m, k)), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((g, h, m, m), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        ref = jnp.einsum("ghmk,ghnk->ghmn", a, b)
        err = float(jnp.max(jnp.abs(out - ref)))
        log(f"2-batch-dim dot: LOWERS, err {err:.2e}")
        return err < 1e-3
    except Exception as e:
        log(f"2-batch-dim dot: FAILS — {type(e).__name__}: {str(e)[:200]}")
        return False

def main():
    results = {"p_2batch_dot": probe_2batch_dot()}

    # v3 g=32 cost split via ablated variants of the compact kernel
    import functools
    from experiments.kernel_probe3 import make_v3_kernel
    tcsr, q_rows, kv_rows, meta = build()
    ts = jnp.asarray(tcsr.senders)[:, None, :]
    tr = jnp.asarray(tcsr.recv_local)[:, None, :]
    tv = jnp.asarray(tcsr.valid)[:, None, :]
    tc = jnp.asarray(tcsr.counts)
    e = meta["e"]

    def run_ablated(q_rows, *, softmax=True, attn=True, group=32):
        sp, d = meta["sp"], meta["d"]
        tn = 64
        num_tiles, emax = tcsr.num_tiles, tcsr.edges_per_tile
        ngroups = ((tc.astype(jnp.int32) + group - 1) // group).reshape(1, num_tiles)
        g = group
        dh = d // 4
        scale = 1.0 / (dh ** 0.5)
        s = meta["s"]
        def kernel(ng_ref, s_ref, r_ref, v_ref, q_ref, kv_ref, o_ref,
                   acc_ref, qb_ref, kvb_ref):
            acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
            col_tok = jax.lax.broadcasted_iota(jnp.int32, (g, sp, sp), 2)
            kmask = col_tok < s
            def body(gi, _):
                for j in range(g):
                    idx = jnp.minimum(gi * g + j, emax - 1)
                    ns = s_ref[0, 0, idx]; r = r_ref[0, 0, idx]
                    kvb_ref[pl.ds(j * sp, sp), :] = kv_ref[pl.ds(ns * sp, sp), :]
                    qb_ref[pl.ds(j * sp, sp), :] = q_ref[pl.ds(r * sp, sp), :]
                kv3 = kvb_ref[:].reshape(g, sp, 2 * d)
                q3 = qb_ref[:].reshape(g, sp, d)
                dtype = q3.dtype
                if attn:
                    outs = []
                    for h in range(4):
                        qh = q3[:, :, h*dh:(h+1)*dh] * jnp.asarray(scale, dtype)
                        kh = kv3[:, :, h*dh:(h+1)*dh]
                        vh = kv3[:, :, d+h*dh:d+(h+1)*dh]
                        sc = jax.lax.dot_general(qh, kh, (((2,),(2,)),((0,),(0,))),
                                                 preferred_element_type=jnp.float32)
                        if softmax:
                            sc = jnp.where(kmask, sc, -jnp.inf)
                            m = jnp.max(sc, axis=2, keepdims=True)
                            ex = jnp.exp(sc - m)
                            w = ex / jnp.sum(ex, axis=2, keepdims=True)
                        else:
                            w = jnp.where(kmask, sc, 0.0)
                        outs.append(jax.lax.dot_general(
                            w.astype(dtype), vh, (((2,),(1,)),((0,),(0,))),
                            preferred_element_type=jnp.float32))
                    msg = jnp.concatenate(outs, axis=2).reshape(g * sp, d)
                else:
                    msg = kvb_ref[:][:, :d].astype(jnp.float32)
                for j in range(g):
                    idx = jnp.minimum(gi * g + j, emax - 1)
                    r = r_ref[0, 0, idx]
                    dup = (gi * g + j) > idx
                    val = jnp.where(dup, 0, v_ref[0, 0, idx]).astype(jnp.float32)
                    cur = acc_ref[pl.ds(r * sp, sp), :]
                    acc_ref[pl.ds(r * sp, sp), :] = cur + msg[j*sp:(j+1)*sp, :] * val
                return 0
            jax.lax.fori_loop(0, ng_ref[0, pl.program_id(0)], body, 0)
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((1, num_tiles), lambda t: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, emax), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((kv_rows.shape[0], 2 * d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tn * sp, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_tiles * tn * sp, d), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tn * sp, d), jnp.float32),
                pltpu.VMEM((group * sp, d), q_rows.dtype),
                pltpu.VMEM((group * sp, 2 * d), kv_rows.dtype),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(ngroups, ts, tr, tv, q_rows, kv_rows)

    run_j = jax.jit(functools.partial(run_ablated))
    for name, kw in [("v3g32 full", {}), ("v3g32 no softmax", {"softmax": False}),
                     ("v3g32 no attn", {"attn": False})]:
        log(f"timing {name} ...")
        try:
            fn = jax.jit(functools.partial(run_ablated, **kw))
            t = time_fn(fn, q_rows, k1=2, k2=12)
            results[name] = round(t * 1e3, 4)
            log(f"  {name}: {t*1e3:.3f} ms ({e/t/1e6:.2f} M e/s)")
        except Exception as err:
            results[name] = f"ERR {type(err).__name__}: {str(err)[:150]}"
            log(f"  {name} FAILED: {str(err)[:200]}")

    # full-op headline via the library path (bench.py protocol)
    from ampnet_tpu.ops.edge_attention import MHAParams
    from ampnet_tpu.ops.pallas.edge_attention_fused import make_pallas_edge_attention
    x, senders, receivers, params = build_inputs(e=e)
    fused = make_pallas_edge_attention(
        np.asarray(senders), np.asarray(receivers), np.ones(e, bool),
        x.shape[0], 4)
    p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])
    log("timing full-op (library, auto group) ...")
    t = time_fn(lambda xx: fused(xx, p), x)
    results["full_op_ms"] = round(t * 1e3, 4)
    log(f"  full-op: {t*1e3:.3f} ms ({e/t/1e6:.2f} M edges/s)")

    print(json.dumps(results), flush=True)

if __name__ == "__main__":
    main()
