"""Round-2 consolidated TPU measurements. Sections:

1. HBM bandwidth (device copy) -> the roofline denominator for RESULTS.md.
2. Mosaic vectorized-gather lowering probe (jnp.take / take_along_axis
   inside a kernel — ROADMAP item 1 retry on this jax pin).
3. 1M-edge fused TRAIN STEP (fwd + chunked bwd + adam) — the scale where
   the un-chunked dK|dV stream (~25 GB) could not fit (VERDICT r1 item 7).

Each section prints immediately; run ONE device process at a time.
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

cache = os.path.expanduser("~/.cache/jax_ampnet")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def section(name):
    def deco(fn):
        def run():
            print(f"\n=== {name} ===", flush=True)
            t0 = time.time()
            try:
                fn()
            except Exception:
                traceback.print_exc()
            print(f"=== {name} done in {time.time()-t0:.1f}s ===", flush=True)
        return run
    return deco


def device_time(fn, *args, iters=10):
    """Device-loop protocol (host wall-clock through the relay is noisy)."""
    from bench import time_fn

    return time_fn(fn, *args, iters=iters)


@section("HBM bandwidth (copy roofline)")
def hbm_bw():
    # Device-loop protocol, but timed at k values NOT used during warmup:
    # the relay deduped repeat-identical (x, k) dispatches of the large
    # buffer (returned cached results -> 0 ms), which bench.time_fn's
    # warm-then-retime sequence trips over at GiB sizes.
    # relay dispatch noise is O(100 ms), so the k contrast must represent
    # SECONDS of device work: 2000 extra iterations x ~0.65 ms/iter.
    nbytes = 256 << 20  # 256 MiB buffer -> 512 MiB moved per iteration
    # START AT 0.5, NOT 1.0: x=1.0 is the exact fixed point of
    # a*0.999+0.001 and such dispatches short-circuit (hbm_probe.py
    # documents the resulting bogus ~0 ms readings); verify the loop
    # actually iterated via the converging value.
    x = jnp.full(nbytes // 4, 0.5, jnp.float32)

    def body(i, a):
        return a * 0.999 + 0.001  # one read + one write of the buffer

    @jax.jit
    def run(a, k):
        return jax.lax.fori_loop(0, k, body, a)

    jax.block_until_ready(run(x, 2))  # compile (k traced: one program)
    times = {}
    for k in (101, 2103):  # fresh k values (the relay dedupes repeats)
        t0 = time.perf_counter()
        v = run(x, k)
        jax.block_until_ready(v)
        times[k] = time.perf_counter() - t0
    expected = 1.0 + (0.5 - 1.0) * 0.999 ** 2103
    got = float(v[0])
    assert abs(got - expected) < 1e-3, f"loop elided? {got} vs {expected}"
    t = (times[2103] - times[101]) / 2002
    print(f"axpy(256MiB): {t*1e3:.3f} ms/iter -> {2*nbytes/t/1e9:.0f} GB/s "
          f"effective HBM bandwidth", flush=True)


@section("Mosaic vectorized gather probe")
def gather_probe():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, d, k = 4096, 256, 512
    table = jnp.asarray(np.random.default_rng(0).normal(size=(rows, d)),
                        jnp.float32)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, rows, k), jnp.int32)

    def k_take(table_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take(table_ref[...], idx_ref[...], axis=0)

    def k_dynslice(table_ref, idx_ref, out_ref):
        def body(i, _):
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
            return 0
        jax.lax.fori_loop(0, k, body, 0)

    for name, kern in [("jnp.take", k_take), ("dynamic-slice loop", k_dynslice)]:
        try:
            fn = pl.pallas_call(
                kern,
                in_specs=[
                    pl.BlockSpec((rows, d), lambda: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((k,), lambda: (0,), memory_space=pltpu.SMEM)
                    if name != "jnp.take"
                    else pl.BlockSpec((k,), lambda: (0,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((k, d), lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((k, d), jnp.float32),
            )
            out = jax.jit(fn)(table, idx)
            ref = np.asarray(table)[np.asarray(idx)]
            ok = np.allclose(np.asarray(out), ref)
            # time_fn chains each iteration's OUTPUT into the next input,
            # so the timed fn must be shape-preserving — pad the gather
            # result back to the table shape (the original passed the
            # raw fn and ALWAYS raised a broadcast ValueError into the
            # except branch, reporting "FAILS" for kernels that lowered)
            t = device_time(
                lambda tbl: jnp.pad(fn(tbl, idx), ((0, rows - k), (0, 0))),
                table,
            )
            print(f"{name}: LOWERS, correct={ok}, {t*1e6:.1f} us "
                  f"({k*d*4/t/1e9:.1f} GB/s gathered)", flush=True)
        except Exception as err:
            msg = str(err).split("\n")[0][:200]
            print(f"{name}: FAILS ({type(err).__name__}: {msg})", flush=True)


@section("1M-edge fused train step (fwd + chunked bwd + adam)")
def big_train_step():
    import optax

    from ampnet_tpu.ops.edge_attention import MHAParams
    from ampnet_tpu.ops.pallas.edge_attention_fused import (
        amp_edge_attention_pallas,
    )
    from ampnet_tpu.ops.pallas.format import build_tiled_csr

    n, e, s, d, h = 100_000, 1_000_000, 20, 128, 4
    rng = np.random.default_rng(0)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, s, d)) * 0.1, jnp.float32)
    p = MHAParams(
        w_qkv=jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.05, jnp.float32),
        b_qkv=jnp.zeros((3 * d,), jnp.float32),
        w_out=jnp.asarray(rng.normal(size=(d, d)) * 0.05, jnp.float32),
        b_out=jnp.zeros((d,), jnp.float32),
    )
    tn = 64
    n_pad = -(-n // tn) * tn
    t_build0 = time.time()
    tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool), n_pad,
                           tile_nodes=tn, group=8)
    print(f"layout build: {time.time()-t_build0:.1f}s "
          f"T={tcsr.num_tiles} EMAX={tcsr.edges_per_tile}", flush=True)
    ts = jnp.asarray(tcsr.senders).reshape(tcsr.num_tiles, -1)
    tr = jnp.asarray(tcsr.recv_local).reshape(tcsr.num_tiles, -1)
    tv = jnp.asarray(tcsr.valid).reshape(tcsr.num_tiles, -1)
    senders_j = jnp.asarray(senders)
    receivers_j = jnp.asarray(receivers)
    tx = optax.adam(1e-3)

    def loss_fn(x, p):
        out = amp_edge_attention_pallas(
            x, p, senders_j, receivers_j, None, ts, tr, tv, h,
            tile_nodes=tn, gather="dma", fused_bwd=True,
        )
        return jnp.sum(out * out)

    @jax.jit
    def step(x, p, opt_state):
        loss, (gx, gp) = jax.value_and_grad(loss_fn, argnums=(0, 1))(x, p)
        updates, opt_state = tx.update(gp, opt_state)
        p = optax.apply_updates(p, updates)
        return loss, x - 1e-3 * gx, p, opt_state

    opt_state = tx.init(p)
    t0 = time.time()
    loss, x, p, opt_state = step(x, p, opt_state)
    jax.block_until_ready(loss)
    print(f"compile+first step: {time.time()-t0:.1f}s loss={float(loss):.3e}",
          flush=True)
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        loss, x, p, opt_state = step(x, p, opt_state)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / iters
    stream_gb = e * 24 * 2 * d * 4 / 1e9
    print(f"train step: {dt*1e3:.1f} ms ({e/dt/1e6:.2f} M edges/s); "
          f"chunked dK|dV stream total {stream_gb:.1f} GB "
          f"(live cap {int(os.environ.get('AMPNET_STREAM_CHUNK_BYTES', 1<<30))/1e9:.1f} GB)",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["hbm", "gather", "big"]
    table = {"hbm": hbm_bw, "gather": gather_probe, "big": big_train_step}
    for w in which:
        table[w]()
