"""bench.py contract: one JSON line with the required keys."""
import json
import subprocess
import sys

import numpy as np
import pytest


def test_bench_functions_tiny():
    import bench

    x, senders, receivers, params = bench.build_inputs(n=32, e=128, s=4, d=16)
    out_opt = bench.optimized(x, senders, receivers, params, 2)
    out_naive = bench.naive_reference_order(x, senders, receivers, params, 2)
    np.testing.assert_allclose(np.asarray(out_opt), np.asarray(out_naive), rtol=2e-4, atol=2e-5)
    t = bench.time_fn(lambda *a: bench.optimized(*a, 2), x, senders, receivers, params, iters=2, warmup=1)
    assert t > 0


def test_bench_json_contract(monkeypatch, capsys):
    import bench

    orig = bench.build_inputs

    def tiny(n=2708, e=10556, s=20, d=128, seed=0, dtype="float32"):
        return orig(n=32, e=128, s=4, d=16, seed=seed, dtype=dtype)

    monkeypatch.setattr(bench, "build_inputs", tiny)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    obj = json.loads(line)
    # required driver contract keys, plus the self-qualifying dispersion
    # fields (VERDICT r2 #4: reps/median/spread so the captured artifact
    # explains its own session drift)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(obj)
    assert obj["value"] > 0
    for arm in ("optimized", "naive"):
        disp = obj[arm]
        assert {"reps_ms", "median_ms", "spread_pct"} <= set(disp)
        assert disp["median_ms"] > 0 and len(disp["reps_ms"]) >= 1
