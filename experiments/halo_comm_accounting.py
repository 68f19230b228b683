"""Comm-bytes accounting: all-gather vs boundary-only halo exchange
(VERDICT r4 item 1/6 — the scaling-efficiency story BASELINE.md's >=80%
clause demands, made falsifiable without multi-chip hardware).

Two evidence classes, both emitted as one table:

  * ANALYTIC per-chip ICI traffic per AMPConv, from the partition plans
    themselves: all-gather recv = (P-1)/P * N_tot rows of S*2D f32;
    halo recv = sum over remote pairs of that pair's TRUE boundary set
    (pair_counts), plus the padded figure actually moved (P-1)*H rows.
  * MEASURED collective shapes from the compiled HLO of the jitted
    partitioned train step on the virtual mesh (XLA SPMD inserts the
    collectives; their operand shapes are inspectable without hardware).

Graphs: the padded-Cora surrogate (N=2708 -> pad 4096, E=10556, the
reference's benchmark graph) partitioned RANDOMLY (worst-case cut: Cora
order has no locality) and the 1M-edge scale graph (N=100k, E=1M,
RESULTS.md line) with a locality window (the regime partitioning exists
for). P = 2/4/8 (+16/32 on the 1M graph — the scale where the earlier
uniform-budget all_to_all design degraded toward all-gather traffic and
the per-offset ppermute budgets keep tracking the cut).

Usage: JAX_PLATFORMS=cpu python experiments/halo_comm_accounting.py
       [--hlo] (also compile both Cora-scale steps and grep collectives)
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from ampnet_tpu.core.graph import from_arrays
from ampnet_tpu.parallel import build_halo_plan, partition_graph

S, D = 20, 128          # reference main config tokens/node, embedding
ROW_BYTES = S * 2 * D * 4  # one projected K|V row, f32


def make_graph(n, e, window=None, seed=0):
    rng = np.random.default_rng(seed)
    recv = rng.integers(0, n, e)
    if window:
        send = (recv + rng.integers(-window, window + 1, e)) % n
    else:
        send = rng.integers(0, n, e)
    x = np.zeros((n, 4), np.float32)
    x[:, 0] = 1.0
    return from_arrays(x.astype(np.float32), np.stack([send, recv]),
                       y=np.zeros(n, np.int64),
                       train_mask=np.ones(n, bool),
                       node_norm=np.ones(n, np.float32))


def account(g, p_shards):
    pg = partition_graph(g, p_shards)
    plan = build_halo_plan(pg)
    n_loc = pg.x.shape[1]
    n_tot = n_loc * p_shards
    pc = np.asarray(plan.pair_counts)  # [dst, src]
    # per-chip RECEIVED rows per conv
    allgather_rows = (p_shards - 1) * n_loc
    halo_true_rows = int(pc.sum(axis=1).max())   # worst chip, true cut
    # per-offset ppermute: every chip receives each live offset's block
    halo_padded_rows = int(sum(plan.sizes))
    return {
        "P": p_shards,
        "N_tot": n_tot,
        "live_offsets": len(plan.offsets),
        "halo_rows_per_chip": halo_padded_rows,
        "allgather_recv_MB_per_chip_per_conv": round(allgather_rows * ROW_BYTES / 1e6, 1),
        "halo_recv_MB_true": round(halo_true_rows * ROW_BYTES / 1e6, 1),
        "halo_recv_MB_padded": round(halo_padded_rows * ROW_BYTES / 1e6, 1),
        "reduction_x": round(allgather_rows / max(halo_padded_rows, 1), 2),
        "kv_buffer_MB_allgather": round(n_tot * ROW_BYTES / 1e6, 1),
        "kv_buffer_MB_halo": round((n_loc + halo_padded_rows) * ROW_BYTES / 1e6, 1),
    }


def hlo_collectives(use_halo):
    """Compile the Cora-scale partitioned train step on the 8-virtual
    mesh and return the collective ops + shapes XLA actually inserted."""
    import re

    from ampnet_tpu.core.config import AMPGCNConfig
    from ampnet_tpu.core.graph import pad_graph
    from ampnet_tpu.models import AMPGCN
    from ampnet_tpu.parallel import make_mesh, make_partitioned_train_step
    from ampnet_tpu.train import make_optimizer

    rng = np.random.default_rng(0)
    n, e, f = 2708, 10556, 1433
    x = (rng.random((n, f)) < 0.02).astype(np.float32)
    x[x.sum(1) == 0, 0] = 1.0
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = from_arrays(x, ei, y=rng.integers(0, 7, n),
                    train_mask=np.ones(n, bool),
                    node_norm=np.ones(n, np.float32))
    g = pad_graph(g, 4096, 32768)
    cfg = AMPGCNConfig(dropout_rate=0.0, dropout_adj_rate=0.0)
    model = AMPGCN(config=cfg)
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "sample": k, "dropout": k, "edges": k},
                        g, deterministic=True)["params"]
    mesh = make_mesh(data=1, graph=8)
    pg = partition_graph(g, 8)
    tx = make_optimizer(1e-3)
    opt_state = tx.init(params)
    step = make_partitioned_train_step(cfg, mesh, tx, loss_mode="full",
                                       use_halo=use_halo)
    extra = (build_halo_plan(pg),) if use_halo else ()
    with mesh:
        txt = step.lower(params, opt_state, pg, jax.random.PRNGKey(0),
                         *extra).compile().as_text()
    out = {}
    for m in re.finditer(
        r"= ((?:\([^)]*\)|\S+)) (all-gather|all-to-all|collective-permute|reduce-scatter|all-reduce)(?:-start)?\(",
        txt,
    ):
        shape, op = m.group(1), m.group(2)
        key = f"{op} {shape}"
        out[key] = out.get(key, 0) + 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", action="store_true",
                    help="also compile Cora-scale steps and list collectives")
    args = ap.parse_args()

    rows = []
    cora = make_graph(2708, 10556)       # random (no locality — worst case)
    big = make_graph(100_000, 1_000_000, window=4096)   # locality window
    for name, g in (("cora-surrogate(random)", cora),
                    ("1M-edge(window=4096)", big)):
        for p in ((2, 4, 8) if g is cora else (2, 4, 8, 16, 32)):
            r = account(g, p)
            r["graph"] = name
            rows.append(r)
            print(json.dumps(r), flush=True)

    if args.hlo:
        for use_halo in (False, True):
            label = "halo" if use_halo else "all-gather"
            print(f"\n== compiled HLO collectives, Cora-scale step, {label} ==",
                  file=sys.stderr)
            cols = hlo_collectives(use_halo)
            for k in sorted(cols):
                print(f"  {cols[k]:3d} x {k}")


if __name__ == "__main__":
    main()
