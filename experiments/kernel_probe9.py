"""Probe 9: v6 whole-layer fusion (in-kernel QKV + out projections) vs the
v3 compact path (XLA projections around the kernel), INTERLEAVED pairwise
at Cora scale.

Motivation (RESULTS.md roofline): the XLA-side qkv materialization
round-trips ~200 MB/layer through HBM (~0.3 ms at the measured 659 GB/s)
and the mean/out-proj epilogue another ~100 MB; v6 keeps x resident
(33 MB), projects K|V once into persistent VMEM scratch, and runs the
epilogue on the MXU in-kernel. Expected ~1.4x on the full op.

Interleaved pairwise protocol (kernel_probe8d lesson): sequential A/Bs
through the relay drift up to ~30%; timing the two variants back-to-back
within each rep and comparing per-rep ratios is what settles a contest.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402  (time_fn + input builder)


def main():
    import argparse

    import jax

    import ampnet_tpu.ops.pallas.edge_attention_fused as eaf
    from ampnet_tpu.ops.edge_attention import MHAParams

    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, nargs="*", default=None,
                    help="v6 group-size sweep (e.g. --groups 32 64 96): "
                         "interleaved pairwise vs the g=32 default "
                         "instead of the v3-vs-v6 contest")
    args = ap.parse_args()

    e, h = 10556, 4
    x, senders, receivers, params = bench.build_inputs(e=e)
    p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])
    n = x.shape[0]

    def build(fuse):
        # NOTE: the variant flag is read at TRACE time, not build time —
        # every timing/parity call below re-sets eaf.FUSE_PROJ_DEFAULT
        # immediately before dispatch, which is what actually selects the
        # kernel; build() only constructs the layout closure.
        fused = eaf.make_pallas_edge_attention(
            np.asarray(senders), np.asarray(receivers), np.ones(e, bool), n, h
        )
        return lambda xx: fused(xx, p)

    if args.groups:
        import functools

        eaf.FUSE_PROJ_DEFAULT = True
        base = 32

        def build_g(g):
            fused = eaf.make_pallas_edge_attention(
                np.asarray(senders), np.asarray(receivers),
                np.ones(e, bool), n, h, group=g,
            )
            return lambda xx: fused(xx, p)

        gfns = {g: build_g(g) for g in {base, *args.groups}}
        reps = 6
        for g in args.groups:
            if g == base:
                continue
            ratios = []
            for r in range(reps):
                order = (base, g) if r % 2 == 0 else (g, base)
                ts = {gg: bench.time_fn(gfns[gg], x) for gg in order}
                ratios.append(ts[g] / ts[base])
                print(f"rep {r}: g{base} {ts[base]*1e3:7.2f} ms  "
                      f"g{g} {ts[g]*1e3:7.2f} ms  ratio {ratios[-1]:.3f}",
                      flush=True)
            med = sorted(ratios)[len(ratios) // 2]
            print(f"g={g}: median ratio vs g{base} = {med:.3f}", flush=True)
        return

    fns = {"v3": build(False), "v6": build(True)}
    # parity first (TPU, not interpret): v6 vs v3 on the same inputs
    eaf.FUSE_PROJ_DEFAULT = False
    o3 = jax.jit(fns["v3"])(x)
    eaf.FUSE_PROJ_DEFAULT = True
    o6 = jax.jit(fns["v6"])(x)
    err = float(np.max(np.abs(np.asarray(o3) - np.asarray(o6))))
    print(f"parity v6 vs v3 (TPU): max abs err {err:.3e}", flush=True)

    reps = 6
    ratios = []
    for r in range(reps):
        ts = {}
        for name in ("v3", "v6") if r % 2 == 0 else ("v6", "v3"):
            eaf.FUSE_PROJ_DEFAULT = name == "v6"
            t = bench.time_fn(fns[name], x)
            ts[name] = t
        ratios.append(ts["v6"] / ts["v3"])
        print(
            f"rep {r}: v3 {ts['v3']*1e3:7.2f} ms  v6 {ts['v6']*1e3:7.2f} ms  "
            f"ratio v6/v3 {ratios[-1]:.3f}",
            flush=True,
        )
    med = sorted(ratios)[len(ratios) // 2]
    print(f"median ratio v6/v3 = {med:.3f} "
          f"({'v6 faster' if med < 1 else 'v6 not faster'})")


if __name__ == "__main__":
    main()
