"""One consolidated TPU measurement run: bench paths, fused train step,
GCN raw frontend, fused SAINT smoke. Each section is independent and
prints results immediately (flush=True) so partial runs still inform."""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))

import jax

cache = os.path.expanduser("~/.cache/jax_ampnet")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def section(name):
    def deco(fn):
        def run():
            print(f"\n=== {name} ===", flush=True)
            t0 = time.time()
            try:
                fn()
            except Exception:
                traceback.print_exc()
            print(f"=== {name} done in {time.time()-t0:.1f}s ===", flush=True)
        return run
    return deco


@section("bench kernel paths")
def bench_paths():
    import bench

    x, senders, receivers, params = bench.build_inputs()
    from ampnet_tpu.ops.edge_attention import MHAParams
    from ampnet_tpu.ops.pallas.edge_attention_fused import make_pallas_edge_attention

    fused = make_pallas_edge_attention(
        np.asarray(senders), np.asarray(receivers), np.ones(10556, bool),
        x.shape[0], 4,
    )
    p = MHAParams(params["w_qkv"], params["b_qkv"], params["w_out"], params["b_out"])
    t_pallas = bench.time_fn(lambda xx: fused(xx, p), x, iters=10)
    print(f"pallas fwd: {t_pallas*1e3:.2f} ms ({10556/t_pallas:.3g} edges/s)", flush=True)
    t_naive = bench.time_fn(
        lambda *a: bench.naive_reference_order(*a, 4), x, senders, receivers, params,
        iters=10,
    )
    print(f"naive fwd: {t_naive*1e3:.2f} ms  speedup {t_naive/t_pallas:.2f}x", flush=True)


@section("fused train step (fwd+bwd+opt)")
def train_step_timing():
    from time_train_step import main as tts_main

    tts_main()


@section("GCN raw frontend on Cora surrogate")
def gcn_raw():
    from common import cora_graph

    from ampnet_tpu.core.config import TrainConfig
    from ampnet_tpu.models import GCN
    from ampnet_tpu.train import train_full_batch

    _, g = cora_graph()
    m = GCN(num_node_features=1433, output_dim=7, frontend="raw", hidden_dim=16)
    cfg = TrainConfig(learning_rate=1e-2, weight_decay=5e-4, epochs=100,
                      cosine_t0=None, log_every=50)
    r = train_full_batch(m, g, cfg)
    print("GCN raw final:", {k: round(v, 4) for k, v in r["final_metrics"].items()},
          flush=True)


@section("fused SAINT smoke (1 epoch x 20 steps)")
def fused_saint():
    from cora_benchmark_graphsaint import main as saint_main

    r = saint_main(epochs=1, steps_per_epoch=20, fused=True, run_base="/tmp/runs_fused")
    print("fused SAINT final:", {k: round(v, 4) for k, v in r["final_metrics"].items()},
          flush=True)


if __name__ == "__main__":
    for fn in [bench_paths, train_step_timing, gcn_raw, fused_saint]:
        fn()
