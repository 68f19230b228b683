"""Decompose the tokenizer-frontend's ~4.4 ms forward cost (bench step
decomposition, step_decomposition_probe.py) and A/B faster sampler
formulations.

The default frontend at Cora shapes runs, per forward:
  standardize(batch)        masked mean/std over [N, F] = 3.9M elems
  sample_present_features   jax.random.categorical over [N, S, F] logits
                            -> ~78M Gumbel draws + argmax (the suspect)
  gather_tokens             [N, S] embedding + value gathers

Candidate replacements for the categorical (same distribution — uniform
over present features, with replacement; tests are distribution-level):
  cdf_compare   u ~ U[0,1) [N, S]; idx = sum_F(u*total > cdf_f) — 78M
                compares but only 54k random draws, no log/gumbel
  cdf_search    vmap'd searchsorted (binary search, 11 gathers/row)

Run: python experiments/frontend_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dev_loop(run, arg, k1=3, k2=33, salt=0):
    import jax

    jax.block_until_ready(run(arg, k1 + salt))
    t0 = time.perf_counter()
    jax.block_until_ready(run(arg, k1 + salt + 1))
    t1 = time.perf_counter()
    jax.block_until_ready(run(arg, k2 + salt + 1))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def best_ms(run, arg, reps=5):
    vals = sorted(dev_loop(run, arg, salt=1000 * r + 7) for r in range(reps))
    pos = [u for u in vals if u > 0]
    return (pos[0] if pos else float("nan")) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from ampnet_tpu.ops.tokenize import (
        gather_tokens,
        sample_present_features,
        standardize,
    )

    n, f, s = 2712, 1433, 20
    r2 = np.random.default_rng(0)
    xf = (r2.random((n, f)) < 0.02).astype(np.float32)
    xf[xf.sum(1) == 0, 0] = 1.0
    x = jnp.asarray(xf)
    node_mask = jnp.ones((n,), bool)
    table = jnp.asarray(r2.normal(size=(f, 127)).astype(np.float32))
    key0 = jax.random.PRNGKey(0)
    results = {}

    def cdf_compare(key, xx, num_samples):
        present = xx != 0
        anyp = jnp.any(present, axis=1, keepdims=True)
        w = jnp.where(present | ~anyp, 1.0, 0.0)
        cdf = jnp.cumsum(w, axis=1)                     # [N, F]
        u = jax.random.uniform(key, (xx.shape[0], num_samples))
        tgt = u * cdf[:, -1:]                           # [N, S)
        # idx = #{j : cdf_j <= tgt} == first j with cdf_j > tgt
        return jnp.sum(
            (cdf[:, None, :] <= tgt[:, :, None]).astype(jnp.int32), axis=-1
        ).astype(jnp.int32)

    def cdf_search(key, xx, num_samples):
        present = xx != 0
        anyp = jnp.any(present, axis=1, keepdims=True)
        w = jnp.where(present | ~anyp, 1.0, 0.0)
        cdf = jnp.cumsum(w, axis=1)
        u = jax.random.uniform(key, (xx.shape[0], num_samples))
        tgt = u * cdf[:, -1:]
        return jax.vmap(
            lambda c, t: jnp.searchsorted(c, t, side="right")
        )(cdf, tgt).astype(jnp.int32)

    # distribution sanity: all draws land on present features
    for name, fn in [("cdf_compare", cdf_compare), ("cdf_search", cdf_search)]:
        idx = np.asarray(fn(key0, x, 200))
        ok = bool(np.all(np.take_along_axis(xf, idx, axis=1) != 0))
        results[name + "_valid"] = ok
        assert ok, name

    def mk(run_body):
        @jax.jit
        def run(xx, k):
            def body(i, xx):
                out = run_body(jax.random.fold_in(key0, i + k), xx)
                return xx + 0.0 * out
            return jax.lax.fori_loop(0, k, body, xx)
        return run

    rows = {
        "standardize_batch": mk(
            lambda kk, xx: standardize(xx, node_mask=node_mask).sum()),
        "sample_categorical": mk(
            lambda kk, xx: sample_present_features(kk, xx, s).sum()),
        "sample_cdf_compare": mk(
            lambda kk, xx: cdf_compare(kk, xx, s).sum().astype(jnp.float32)),
        "sample_cdf_search": mk(
            lambda kk, xx: cdf_search(kk, xx, s).sum().astype(jnp.float32)),
        "gather_tokens": mk(
            lambda kk, xx: gather_tokens(
                xx, jax.random.randint(kk, (n, s), 0, f), table).sum()),
    }
    for name, run in rows.items():
        ms = best_ms(run, x)
        results[name + "_ms"] = round(ms, 3)
        print(f"{name} {ms:.3f} ms", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
