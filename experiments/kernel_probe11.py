"""Probe 11 (VERDICT r2 #8 / ROADMAP #4): degree-bucketed edge layout.

The fused kernel's residual padding waste is group-granularity rounding:
each tile's live edge count rounds up to a multiple of g inside the
dynamic trip count (~7% padded work at g=32/tn=64 on Cora). Host-side
accounting (r3) of the candidates:

  identity tn=64   padded-work/live 1.073   emax 295   (current default)
  identity tn=128  1.031                    emax 550
  identity tn=256  1.016                    emax 1061
  deg-balanced tn=64 (round-robin by in-degree) 1.043   emax 255

Two attacks, measured interleaved pairwise vs the default (probe8d
protocol): bigger tiles (fewer partial groups) and a degree-balanced node
relabeling (flatter per-tile counts; also shrinks the shared budget emax,
the memory knob for SAINT's shared-executable layouts). The relabeling is
a one-time host transform: perm applied to x/senders/receivers, output
rows map back via the inverse — per-step kernel cost is what's timed.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def degree_balanced_perm(receivers, edge_mask, n, tile_nodes):
    """node id -> new id: sort by in-degree desc, round-robin over tiles.

    New ids live in [0, t*tile_nodes) — tiles own fixed id ranges, so when
    n % tile_nodes != 0 the relabeled graph needs x padded to t*tile_nodes
    rows. Returns (perm [n], n_pad_bal)."""
    r = np.asarray(receivers)[np.asarray(edge_mask).astype(bool)]
    deg = np.bincount(r, minlength=n)
    order = np.argsort(-deg, kind="stable")
    t = -(-n // tile_nodes)
    # rank i of the degree-sorted order -> tile i%t, row i//t within it
    newid = (np.arange(n) % t) * tile_nodes + (np.arange(n) // t)
    assert newid.max() < t * tile_nodes
    perm = np.empty(n, np.int64)
    perm[order] = newid
    return perm, t * tile_nodes


def main():
    import jax

    import ampnet_tpu.ops.pallas.edge_attention_fused as eaf
    from ampnet_tpu.ops.edge_attention import MHAParams

    e, h = 10556, 4
    x, senders, receivers, params = bench.build_inputs(e=e)
    p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])
    n = x.shape[0]
    em = np.ones(e, bool)
    sen, rec = np.asarray(senders), np.asarray(receivers)

    eaf.FUSE_PROJ_DEFAULT = True

    def build(s_, r_, tn, n_pad=None):
        fused = eaf.make_pallas_edge_attention(
            s_, r_, em, n_pad or n, h, tile_nodes=tn)
        return lambda xx: fused(xx, p)

    variants = {"tn64": (build(sen, rec, 64), None)}
    variants["tn128"] = (build(sen, rec, 128), None)
    variants["tn256"] = (build(sen, rec, 256), None)
    perm, n_bal = degree_balanced_perm(rec, em, n, 64)
    xp = np.zeros((n_bal,) + np.asarray(x).shape[1:], np.asarray(x).dtype)
    xp[perm] = np.asarray(x)  # x_perm[perm[i]] = x[i]; pad rows zero
    variants["degbal64"] = (build(perm[sen].astype(sen.dtype),
                                  perm[rec].astype(rec.dtype), 64, n_pad=n_bal),
                            (xp, perm))

    # parity: every variant must reproduce the default's output
    base_out = np.asarray(jax.jit(variants["tn64"][0])(x))
    for name, (fn, permed) in variants.items():
        if name == "tn64":
            continue
        if permed is None:
            out = np.asarray(jax.jit(fn)(x))
        else:
            xin, pm = permed
            out = np.asarray(jax.jit(fn)(jax.numpy.asarray(xin)))[pm]
        err = float(np.max(np.abs(out - base_out)))
        print(f"parity {name} vs tn64: max abs err {err:.3e}", flush=True)

    reps = 6
    for name, (fn, permed) in variants.items():
        if name == "tn64":
            continue
        xin = x if permed is None else jax.numpy.asarray(permed[0])
        ratios = []
        for r in range(reps):
            order = ("tn64", name) if r % 2 == 0 else (name, "tn64")
            ts = {}
            for nm in order:
                f, pm = variants[nm]
                ts[nm] = bench.time_fn(f, x if pm is None else xin)
            ratios.append(ts[name] / ts["tn64"])
            print(f"rep {r}: tn64 {ts['tn64']*1e3:7.2f} ms  {name} "
                  f"{ts[name]*1e3:7.2f} ms  ratio {ratios[-1]:.3f}", flush=True)
        med = sorted(ratios)[len(ratios) // 2]
        print(f"{name}: median ratio vs tn64 = {med:.3f} "
              f"({'faster' if med < 1 else 'not faster'})", flush=True)


if __name__ == "__main__":
    main()
