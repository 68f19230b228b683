"""Trustworthy device-side timing.

Host wall-clock around individual dispatches is unreliable through the
remote-execution relay (non-linear in iteration count — see RESULTS.md).
Here K training steps run inside ONE jitted lax.fori_loop dispatch; the
per-step time is (T(K2) - T(K1)) / (K2 - K1), which the relay cannot
elide or pipeline away.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.expanduser("~/.cache/jax_ampnet")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ampnet_tpu.core.config import AMPGCNConfig
from ampnet_tpu.core.graph import from_arrays
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.ops.edge_attention import MHAParams, amp_edge_attention
from ampnet_tpu.train import create_train_state, make_optimizer
from ampnet_tpu.train.losses import saint_weighted_nll
from ampnet_tpu.train.pallas_step import compute_layout, default_edge_budget, make_fused_fns
from ampnet_tpu.train.state import split_rngs


def make_graph(n=768, e=4096, f=1433, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.random((n, f)) < 0.02).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    return from_arrays(x, ei, y=rng.integers(0, 7, n), train_mask=np.ones(n, bool),
                       node_norm=np.ones(n, np.float32))


def loop_time(body_fn, init, k1=2, k2=12):
    """Per-iteration device time via differenced in-jit loops.

    Salted against relay dedupe: the original timed run(init,k1)/run(
    init,k2) dispatches were repeat-identical to the warmups, exactly
    the cached-result artifact bench.time_fn was hardened for in r2 —
    every timed dispatch here now uses a fresh k (k traced: one
    program serves all counts)."""
    _SALT[0] += 1
    salt = 2 * _SALT[0]

    @jax.jit
    def run(init, k):
        return jax.lax.fori_loop(0, k, body_fn, init)

    jax.block_until_ready(run(init, k1))  # compile + warm
    ka, kb = k1 + salt, k2 + salt + 1
    t0 = time.perf_counter()
    jax.block_until_ready(run(init, ka))
    t1 = time.perf_counter()
    jax.block_until_ready(run(init, kb))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (kb - ka)


_SALT = [0]


def main():
    cfg = AMPGCNConfig(dropout_rate=0.0, dropout_adj_rate=0.0)
    model = AMPGCN(config=cfg)
    g = make_graph()
    tx = make_optimizer(1e-3)
    state = create_train_state(model, g, tx, seed=0)

    def xla_body(i, s):
        new_rng, rngs = split_rngs(s.rng)

        def loss_fn(params):
            out = model.apply({"params": params}, g, deterministic=False,
                              return_aux=False, rngs=rngs)
            return saint_weighted_nll(out.logits, g.y, g.node_norm,
                                      g.train_mask & g.node_mask)

        grads = jax.grad(loss_fn)(s.params)
        return s.apply_gradients(grads=grads, rng=new_rng)

    t_xla = loop_time(xla_body, state)
    print(f"XLA train step (device loop): {t_xla*1e3:.2f} ms", flush=True)

    budget = default_edge_budget(g.num_edges_padded, g.num_nodes_padded // 64, slack=4.0)
    layout = compute_layout(g, tile_nodes=64, edges_per_tile=budget)
    fns = make_fused_fns(model, g, layout)

    def fused_body(i, s):
        new_rng, rngs = split_rngs(s.rng)

        def loss_fn(params):
            out = model.apply({"params": params}, g, deterministic=False,
                              return_aux=False, rngs=rngs, fused_fns=fns)
            return saint_weighted_nll(out.logits, g.y, g.node_norm,
                                      g.train_mask & g.node_mask)

        grads = jax.grad(loss_fn)(s.params)
        return s.apply_gradients(grads=grads, rng=new_rng)

    t_fused = loop_time(fused_body, state)
    print(f"fused train step (device loop): {t_fused*1e3:.2f} ms  "
          f"speedup {t_xla/t_fused:.2f}x", flush=True)

    # single conv forward at full-Cora scale for the kernel headline
    rng = np.random.default_rng(0)
    N, E, S, D, H = 2708, 10556, 20, 128, 4
    xx = jnp.asarray(rng.normal(size=(N, S, D)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    receivers = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
    params = MHAParams(
        w_qkv=jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.05),
        b_qkv=jnp.zeros(3 * D), w_out=jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.05),
        b_out=jnp.zeros(D),
    )

    def conv_body(i, x):
        out, _ = amp_edge_attention(x, senders, receivers, None, params, H,
                                    return_weights=False)
        return x * 0.99 + out * 0.01

    t_conv = loop_time(conv_body, xx)
    print(f"XLA conv fwd, Cora scale (device loop): {t_conv*1e3:.2f} ms "
          f"({E/t_conv:.3g} edges/s)", flush=True)

    from ampnet_tpu.ops.pallas.edge_attention_fused import make_pallas_edge_attention

    fused_conv = make_pallas_edge_attention(
        np.asarray(senders), np.asarray(receivers), np.ones(E, bool), N, H,
    )

    def pconv_body(i, x):
        out = fused_conv(x, params)
        return x * 0.99 + out * 0.01

    t_pconv = loop_time(pconv_body, xx)
    print(f"pallas conv fwd, Cora scale (device loop): {t_pconv*1e3:.2f} ms "
          f"({E/t_pconv:.3g} edges/s)  speedup {t_conv/t_pconv:.2f}x", flush=True)


if __name__ == "__main__":
    main()
