"""HBM bandwidth probe with relay-artifact defenses.

Previous attempts returned ~0 ms/iter for a 256MiB-1GiB axpy loop. Two
suspected artifacts: (a) the relay dedupes repeat-identical dispatches,
(b) x=ones is EXACTLY the fixed point of a*0.999+0.001, so the output
buffer is bit-identical to the input every iteration. Defenses here:
non-fixed-point start value, every timed dispatch uses a fresh k, a k
SWEEP to check linearity, and a value check that proves the loop body
actually executed k times.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

cache = os.path.expanduser("~/.cache/jax_ampnet")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

NBYTES = 256 << 20  # 256 MiB -> 512 MiB moved per iteration


def main():
    n = NBYTES // 4
    x = jnp.full((n,), 0.5, jnp.float32)

    def body(i, a):
        return a * 0.999 + 0.001

    @jax.jit
    def run(a, k):
        return jax.lax.fori_loop(0, k, body, a)

    t0 = time.time()
    out = jax.block_until_ready(run(x, 7))
    print(f"compile+first: {time.time()-t0:.2f}s", flush=True)
    # value check: 0.5*0.999^7 + (1-0.999^7)
    expect = 0.5 * 0.999**7 + (1 - 0.999**7)
    got = float(out[12345])
    print(f"value check k=7: got {got:.8f} expect {expect:.8f} "
          f"({'OK' if abs(got-expect) < 1e-5 else 'MISMATCH'})", flush=True)

    ks = [50, 300, 800, 1800]
    times = []
    for k in ks:
        t0 = time.perf_counter()
        jax.block_until_ready(run(x, k))
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"k={k}: {dt:.3f}s", flush=True)
    # least-squares slope of time vs k
    A = np.vstack([ks, np.ones(len(ks))]).T
    slope, intercept = np.linalg.lstsq(A, np.array(times), rcond=None)[0]
    bw = 2 * NBYTES / slope / 1e9 if slope > 0 else float("nan")
    print(f"slope {slope*1e3:.3f} ms/iter, intercept {intercept*1e3:.0f} ms "
          f"-> {bw:.0f} GB/s effective HBM bandwidth", flush=True)


if __name__ == "__main__":
    main()
