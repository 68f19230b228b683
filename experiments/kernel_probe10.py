"""Probe 10: edge-groups-on-LANES softmax (VERDICT r2 #2 — the last
untried attack on the binding VPU constraint).

Every previous layout keeps SP on the 128-lane axis, so at SP=24 the
softmax chain runs at 18.75% lane utilization (RESULTS.md roofline: the
chain is ~47% of kernel time). The lanes body transposes each head's
scores to [SP, SP, G] so G rides the lane axis — full utilization at
G>=128 — at the cost of two 3-D relayouts per head per group.

Contest, interleaved pairwise at Cora scale (kernel_probe8d protocol —
sequential A/Bs drift up to ~30% through the relay):
  base       v6 per-head g=32 (current default, on merit from r2)
  lanes_g128 v6 lanes body, G=128 (its natural size)
  lanes_g64  half-lane variant (isolates the relayout cost)
  ctrl_g128  per-head at g=128 (separates group-size from layout effects)

Each variant is parity-checked on-chip against the XLA reference before
timing.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    import jax

    import ampnet_tpu.ops.pallas.edge_attention_fused as eaf
    from ampnet_tpu.ops.edge_attention import MHAParams, amp_edge_attention

    e, h = 10556, 4
    x, senders, receivers, params = bench.build_inputs(e=e)
    p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])
    n = x.shape[0]

    ref, _ = amp_edge_attention(
        x, senders, receivers, None, p, h, softmax=True, return_weights=False
    )
    ref = np.asarray(jax.block_until_ready(ref))

    def build(lanes: bool, group: int):
        # the lanes flag is resolved at TRACE time of each closure's first
        # dispatch — set it, build, dispatch once (parity check), restore
        eaf.LANES_SOFTMAX_DEFAULT = lanes
        fused = eaf.make_pallas_edge_attention(
            np.asarray(senders), np.asarray(receivers), np.ones(e, bool),
            n, h, group=group,
        )
        fn = lambda xx: fused(xx, p)
        out = np.asarray(jax.block_until_ready(fn(x)))
        err = float(np.max(np.abs(out - ref)))
        eaf.LANES_SOFTMAX_DEFAULT = False
        return fn, err

    variants = [
        ("base_g32", False, 32),
        ("lanes_g128", True, 128),
        ("lanes_g64", True, 64),
        ("ctrl_g128", False, 128),
    ]
    fns = {}
    for name, lanes, grp in variants:
        try:
            fn, err = build(lanes, grp)
            print(f"{name}: built, max|err| vs XLA = {err:.2e}", flush=True)
            if err > 5e-4:
                print(f"{name}: PARITY FAIL — excluded from timing", flush=True)
                continue
            fns[name] = fn
        except Exception as ex:
            print(f"{name}: BUILD/COMPILE FAIL — {type(ex).__name__}: "
                  f"{str(ex)[:400]}", flush=True)

    base = "base_g32"
    if base not in fns:
        print("baseline unavailable; aborting")
        return 1
    reps = 6
    for name in [v[0] for v in variants[1:] if v[0] in fns]:
        # re-pin the flag per timing dispatch: time_fn's outer jit traces
        # the closure fresh per (fn, k) identity
        ratios = []
        for r in range(reps):
            order = (base, name) if r % 2 == 0 else (name, base)
            ts = {}
            for v in order:
                eaf.LANES_SOFTMAX_DEFAULT = v.startswith("lanes")
                ts[v] = bench.time_fn(fns[v], x)
            eaf.LANES_SOFTMAX_DEFAULT = False
            ratios.append(ts[name] / ts[base])
            print(f"rep {r}: {base} {ts[base]*1e3:7.2f} ms  "
                  f"{name} {ts[name]*1e3:7.2f} ms  ratio {ratios[-1]:.3f}",
                  flush=True)
        med = sorted(ratios)[len(ratios) // 2]
        verdict = "FASTER" if med < 1.0 else "slower"
        print(f"== {name}: median ratio {med:.3f} ({verdict} than {base})",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
