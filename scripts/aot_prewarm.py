"""AOT compile / persistent-cache prewarm (VERDICT r4 weak #6: the
1M-edge scatter-free train step's first compile is ~473 s cold — an
operational hazard on a fresh machine).

Deploy flow this script demonstrates and times:

 1. `jax.jit(step).lower(shapes).compile()` — compiles WITHOUT
    dispatching (no data transfer, no execution): safe to run at deploy
    time, in CI, or on a warmup node.
 2. With `jax_compilation_cache_dir` set (the library default via
    _enable_compile_cache: ~/.cache/jax_ampnet, override
    AMPNET_JAX_CACHE), step 1 populates the PERSISTENT executable
    cache. Every later process on this machine — or any machine the
    cache dir is copied to with the same jaxlib + topology — skips
    straight to the warm path.
 3. Run twice to see both numbers: first invocation = cold compile,
    second (or after copying the cache) = warm load.

Usage:
    python scripts/aot_prewarm.py            # 1M-edge op-level step
    python scripts/aot_prewarm.py --cora     # full-batch Cora AMPGCN step
    python scripts/aot_prewarm.py --all

Prints one JSON line per program: {"program", "compile_s", "cached"}.
The `cached` flag is inferred: a warm load of the 1M step is ~seconds,
the cold compile is minutes.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _enable_compile_cache():
    import jax

    cache_dir = os.environ.get(
        "AMPNET_JAX_CACHE", os.path.expanduser("~/.cache/jax_ampnet")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


def prewarm_1m():
    """The heavyweight program: 1M-edge dma-gather fused op, scatter-free
    backward, adam — bench.py's scale_1m step, compiled WITHOUT data."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ampnet_tpu.ops.edge_attention import MHAParams
    from ampnet_tpu.ops.pallas.edge_attention_fused import (
        amp_edge_attention_pallas,
    )
    from ampnet_tpu.ops.pallas.format import build_tiled_csr

    nb, eb, sb, db, h = 100_000, 1_000_000, 20, 128, 4
    tn = 256
    rng = np.random.default_rng(0)
    sd = rng.integers(0, nb, eb).astype(np.int32)
    rc = rng.integers(0, nb, eb).astype(np.int32)
    n_pad = -(-nb // tn) * tn
    tcsr = build_tiled_csr(sd, rc, np.ones(eb, bool), n_pad,
                           tile_nodes=tn, group=8)
    stcsr = build_tiled_csr(rc, sd, np.ones(eb, bool), n_pad,
                            tile_nodes=tn, group=8)
    kw = dict(
        snd_receivers=jnp.asarray(stcsr.senders),
        snd_local=jnp.asarray(stcsr.recv_local),
        snd_valid=jnp.asarray(stcsr.valid),
        snd_counts=jnp.asarray(stcsr.counts),
    )
    sd_j, rc_j = jnp.asarray(sd), jnp.asarray(rc)
    ts_ = jnp.asarray(tcsr.senders)
    tr_ = jnp.asarray(tcsr.recv_local)
    tv_ = jnp.asarray(tcsr.valid)
    tx = optax.adam(1e-3)

    def loss_1m(x, p):
        out = amp_edge_attention_pallas(
            x, p, sd_j, rc_j, None, ts_, tr_, tv_, h,
            tile_nodes=tn, gather="dma", fused_bwd=True,
            scatterfree=True, **kw,
        )
        return jnp.sum(out * out)

    def step(x, p, opt_state):
        loss, (gx, gp) = jax.value_and_grad(loss_1m, argnums=(0, 1))(x, p)
        updates, opt_state = tx.update(gp, opt_state)
        p = optax.apply_updates(p, updates)
        return loss, x - 1e-3 * gx, p, opt_state

    x_shape = jax.ShapeDtypeStruct((nb, sb, db), jnp.float32)
    p_shape = MHAParams(
        w_qkv=jax.ShapeDtypeStruct((db, 3 * db), jnp.float32),
        b_qkv=jax.ShapeDtypeStruct((3 * db,), jnp.float32),
        w_out=jax.ShapeDtypeStruct((db, db), jnp.float32),
        b_out=jax.ShapeDtypeStruct((db,), jnp.float32),
    )
    opt_shape = jax.eval_shape(tx.init, p_shape)
    t0 = time.time()
    jax.jit(step).lower(x_shape, p_shape, opt_shape).compile()
    dt = time.time() - t0
    print(json.dumps({"program": "1M-edge scatter-free train step",
                      "compile_s": round(dt, 1), "cached": dt < 60.0}),
          flush=True)


def prewarm_cora():
    """Full-batch Cora fused AMPGCN train step (bench.py's train_step)."""
    import jax
    import numpy as np

    from ampnet_tpu.core.config import AMPGCNConfig
    from ampnet_tpu.core.graph import from_arrays
    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.train import create_train_state, make_optimizer
    from ampnet_tpu.train.pallas_step import (
        compute_layout,
        default_edge_budget,
        make_pallas_train_step,
    )

    rng = np.random.default_rng(0)
    n_g, e = 2712, 10556
    xf = (rng.random((n_g, 1433)) < 0.02).astype(np.float32)
    xf[xf.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n_g, e), rng.integers(0, n_g, e)])
    g = from_arrays(xf, ei, y=rng.integers(0, 7, n_g),
                    train_mask=np.ones(n_g, bool),
                    node_norm=np.ones(n_g, np.float32))
    budget = default_edge_budget(g.num_edges_padded,
                                 -(-g.num_nodes_padded // 256), slack=4.0)
    layout = compute_layout(g, edges_per_tile=budget)
    cfg = AMPGCNConfig(dropout_rate=0.0, dropout_adj_rate=0.0)
    model = AMPGCN(config=cfg)
    step = make_pallas_train_step(model, loss_mode="saint")
    state = create_train_state(model, g, make_optimizer(1e-3), seed=0)
    t0 = time.time()
    # step is already jitted (donate_argnums) — lower it directly;
    # .compile() populates the persistent cache without dispatching
    step.lower(state, g, layout).compile()
    dt = time.time() - t0
    print(json.dumps({"program": "full-batch Cora fused AMPGCN train step",
                      "compile_s": round(dt, 1), "cached": dt < 30.0}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cora", action="store_true")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()
    cache = _enable_compile_cache()
    print(f"persistent cache: {cache}", file=sys.stderr)
    if args.all or not args.cora:
        prewarm_1m()
    if args.all or args.cora:
        prewarm_cora()


if __name__ == "__main__":
    main()
