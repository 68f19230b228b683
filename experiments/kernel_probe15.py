"""Probe 15: scatter-free two-pass backward (r4) vs the dK|dV-stream
backward, interleaved pairwise on chip.

The toggle is DATA, not an env flag: layouts built with
sender_layout=True carry the transposed snd_* arrays and route
amp_edge_attention_pallas's VJP through the scatter-free passes
(edge_attention_bwd_scatterfree.py); layouts built without them fall
back to the stream backward. Distinct pytree structures -> distinct jit
entries, so no stale-compile hazard (the probe8d lesson).

Scales:
  A. SAINT-subgraph full AMPGCN train step (N=768, E=4096, vmem)
  B. full-batch Cora train step (N=2712, E=10556, vmem)
  C. 1M-edge op-level train step (N=100k, E=1M, dma — the chunked-fold
     regime the scatter-free backward deletes)
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def model_scales():
    import jax

    from time_train_step import make_graph, timed

    from ampnet_tpu.core.config import AMPGCNConfig
    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.train import create_train_state, make_optimizer
    from ampnet_tpu.train.pallas_step import (
        compute_layout,
        default_edge_budget,
        make_pallas_train_step,
    )

    cfg = AMPGCNConfig(dropout_rate=0.0, dropout_adj_rate=0.0)
    model = AMPGCN(config=cfg)
    tx = make_optimizer(1e-3)
    step = make_pallas_train_step(model, loss_mode="saint")

    for label, (n, e) in (("saint-subgraph", (768, 4096)),
                          ("full-batch", (2712, 10556))):
        graphs = [make_graph(n=n, e=e, seed=i) for i in range(4)]

        def make_state():
            return create_train_state(model, graphs[0], tx, seed=0)

        budget = default_edge_budget(
            graphs[0].num_edges_padded,
            -(-graphs[0].num_nodes_padded // 256), slack=4.0)
        layouts = {}
        for mode, snd in (("scatterfree", True), ("stream", False)):
            layouts[mode] = [
                compute_layout(g, edges_per_tile=budget, sender_layout=snd)
                for g in graphs
            ]

        losses = {}
        for mode, lay in layouts.items():
            s = make_state()
            _, m = step(s, graphs[0], lay[0])
            losses[mode] = float(m["loss"])
        print(f"{label}: loss sf {losses['scatterfree']:.6f} stream "
              f"{losses['stream']:.6f} "
              f"(|d| {abs(losses['scatterfree']-losses['stream']):.2e})",
              flush=True)

        reps = 5
        ratios = []
        for r in range(reps):
            ts = {}
            order = (("scatterfree", "stream") if r % 2 == 0
                     else ("stream", "scatterfree"))
            for mode in order:
                ts[mode] = timed(step, make_state, graphs,
                                 extra=layouts[mode], iters=8)
            ratios.append(ts["scatterfree"] / ts["stream"])
            print(f"  rep {r}: sf {ts['scatterfree']*1e3:7.2f} ms  stream "
                  f"{ts['stream']*1e3:7.2f} ms  ratio {ratios[-1]:.3f}",
                  flush=True)
        med = sorted(ratios)[len(ratios) // 2]
        print(f"{label}: median train-step ratio sf/stream = {med:.3f} "
              f"({'scatter-free faster' if med < 1 else 'scatter-free not faster'})",
              flush=True)


def big_scale():
    import jax
    import jax.numpy as jnp
    import optax

    from ampnet_tpu.ops.edge_attention import MHAParams
    from ampnet_tpu.ops.pallas.edge_attention_fused import (
        amp_edge_attention_pallas,
    )
    from ampnet_tpu.ops.pallas.format import build_tiled_csr

    n, e, s, d, h = 100_000, 1_000_000, 20, 128, 4
    tn = 256
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
    senders_j = jnp.asarray(senders)
    receivers_j = jnp.asarray(receivers)
    tx = optax.adam(1e-3)

    n_pad = -(-n // tn) * tn
    t0 = time.time()
    tcsr = build_tiled_csr(senders, receivers, np.ones(e, bool), n_pad,
                           tile_nodes=tn, group=8)
    stcsr = build_tiled_csr(receivers, senders, np.ones(e, bool), n_pad,
                            tile_nodes=tn, group=8)
    print(f"layouts {time.time()-t0:.1f}s  recv EMAX={tcsr.edges_per_tile} "
          f"snd EMAX={stcsr.edges_per_tile}", flush=True)
    ts_ = jnp.asarray(tcsr.senders)
    tr_ = jnp.asarray(tcsr.recv_local)
    tv_ = jnp.asarray(tcsr.valid)
    snd_kw = dict(
        snd_receivers=jnp.asarray(stcsr.senders),
        snd_local=jnp.asarray(stcsr.recv_local),
        snd_valid=jnp.asarray(stcsr.valid),
        snd_counts=jnp.asarray(stcsr.counts),
    )

    steps = {}
    for mode in ("scatterfree", "stream"):
        kw = snd_kw if mode == "scatterfree" else {}

        def loss_fn(x, p, kw=kw):
            out = amp_edge_attention_pallas(
                x, p, senders_j, receivers_j, None, ts_, tr_, tv_, h,
                tile_nodes=tn, gather="dma", fused_bwd=True,
                scatterfree=bool(kw), **kw,
            )
            return jnp.sum(out * out)

        @jax.jit
        def step(x, p, opt_state, loss_fn=loss_fn):
            loss, (gx, gp) = jax.value_and_grad(loss_fn, argnums=(0, 1))(x, p)
            updates, opt_state = tx.update(gp, opt_state)
            p = optax.apply_updates(p, updates)
            return loss, x - 1e-3 * gx, p, opt_state

        steps[mode] = step

    losses = {}
    for mode, step in steps.items():
        opt_state = tx.init(p)
        t0 = time.time()
        loss, *_ = step(x, p, opt_state)
        jax.block_until_ready(loss)
        losses[mode] = float(loss)
        print(f"{mode}: compile+first {time.time()-t0:.1f}s "
              f"loss={losses[mode]:.6e}", flush=True)
    print(f"loss |d| = {abs(losses['scatterfree']-losses['stream']):.3e}",
          flush=True)

    reps = 4
    iters = 4
    ratios = []
    for r in range(reps):
        ts2 = {}
        order = (("scatterfree", "stream") if r % 2 == 0
                 else ("stream", "scatterfree"))
        for mode in order:
            step = steps[mode]
            xx, pp, os_ = x, p, tx.init(p)
            loss, xx, pp, os_ = step(xx, pp, os_)  # re-warm
            jax.block_until_ready(loss)
            t0 = time.time()
            for _ in range(iters):
                loss, xx, pp, os_ = step(xx, pp, os_)
            jax.block_until_ready(loss)
            ts2[mode] = (time.time() - t0) / iters
        ratios.append(ts2["scatterfree"] / ts2["stream"])
        print(f"rep {r}: sf {ts2['scatterfree']*1e3:8.1f} ms  stream "
              f"{ts2['stream']*1e3:8.1f} ms  ratio {ratios[-1]:.3f}",
              flush=True)
    med = sorted(ratios)[len(ratios) // 2]
    print(f"1M-edge train step: median ratio sf/stream = {med:.3f} "
          f"({'scatter-free faster' if med < 1 else 'scatter-free not faster'})",
          flush=True)


if __name__ == "__main__":
    if "--big" in sys.argv:
        big_scale()
    else:
        model_scales()
