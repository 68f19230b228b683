"""Probe 12: does the probe11 tile-granularity win (tn=256 fwd 0.955x)
hold on the full fused TRAIN STEP (fwd + fused bwd + optimizer)?

If yes at both SAINT-subgraph and full-batch Cora shapes, the library
default tile_nodes can flip; if not, bench keeps the fwd-only win and
training stays at tn=64. Interleaved pairwise, fresh state per timing
run (steps donate their state), several distinct graphs so the relay
cannot dedupe.
"""
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def main():
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

    for label, (n, e) in (("saint-subgraph", (768, 4096)),
                          ("full-batch", (2712, 10556))):
        graphs = [make_graph(n=n, e=e, seed=i) for i in range(4)]

        def make_state():
            return create_train_state(model, graphs[0], tx, seed=0)

        steps = {}
        for tn in (64, 256):
            budget = default_edge_budget(
                graphs[0].num_edges_padded, -(-graphs[0].num_nodes_padded // tn),
                slack=4.0)
            layouts = [compute_layout(g, tile_nodes=tn, edges_per_tile=budget)
                       for g in graphs]
            steps[tn] = (make_pallas_train_step(model, tile_nodes=tn,
                                                loss_mode="saint"),
                         layouts)

        # parity: one step from identical fresh states must agree on loss
        losses = {}
        for tn, (fn, lay) in steps.items():
            s = make_state()
            _, m = fn(s, graphs[0], lay[0])
            losses[tn] = float(m["loss"])
        print(f"{label}: loss tn64 {losses[64]:.6f} tn256 {losses[256]:.6f} "
              f"(|d| {abs(losses[64]-losses[256]):.2e})", flush=True)

        reps = 5
        ratios = []
        for r in range(reps):
            ts = {}
            for tn in (64, 256) if r % 2 == 0 else (256, 64):
                fn, lay = steps[tn]
                ts[tn] = timed(fn, make_state, graphs, extra=lay, iters=8)
            ratios.append(ts[256] / ts[64])
            print(f"  rep {r}: tn64 {ts[64]*1e3:7.2f} ms  tn256 "
                  f"{ts[256]*1e3:7.2f} ms  ratio {ratios[-1]:.3f}", flush=True)
        med = sorted(ratios)[len(ratios) // 2]
        print(f"{label}: median train-step ratio tn256/tn64 = {med:.3f} "
              f"({'tn256 faster' if med < 1 else 'tn256 not faster'})",
              flush=True)


if __name__ == "__main__":
    main()
