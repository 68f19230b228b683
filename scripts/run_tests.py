"""Deterministic chunked test runner (VERDICT r4 weak #1).

The full `pytest tests/` invocation segfaults intermittently in this
environment (XLA:CPU compile SIGSEGV inside one long-lived process —
ROADMAP.md "Environment notes"; every file passes alone). This runner
makes the gate deterministic: each test FILE runs in its own
subprocess, a crashed/failed chunk is retried once, and the aggregate
exit code is real.

Usage:
    python scripts/run_tests.py            # the "not slow" suite, per-file
    python scripts/run_tests.py --fast     # <3 min tier for habitual use
    python scripts/run_tests.py --all      # includes -m slow tests
    python scripts/run_tests.py tests/test_pallas.py ...   # explicit files

Exit code: 0 iff every chunk passed (after at most one retry each).
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import time

# The habitual tier: files that together finish in ~2-3 min on this host
# (per-file timings from the r5 full run — see RESULTS.md). Everything
# heavier (Pallas interpret-mode compiles, multiprocess jax.distributed,
# reference parity via the torch shim) stays in the default tier.
FAST_FILES = [
    "tests/test_bench.py",
    "tests/test_custom_mha.py",
    "tests/test_data.py",
    "tests/test_edge_attention.py",
    "tests/test_models.py",
    "tests/test_optim.py",
    "tests/test_segment.py",
    "tests/test_tokenize.py",
    "tests/test_train.py",
]

SUMMARY_RE = re.compile(r"(\d+) (passed|failed|error|skipped|deselected|xfailed|xpassed)")


def run_chunk(files, marker, timeout):
    cmd = [sys.executable, "-m", "pytest", "-q", *files]
    if marker:
        cmd += ["-m", marker]
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        rc, out = proc.returncode, proc.stdout + proc.stderr
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = ((e.stdout or b"").decode(errors="replace") if isinstance(e.stdout, bytes) else (e.stdout or "")) + "\n[runner] TIMEOUT"
    return rc, out, time.time() - t0


def tally(out):
    counts = {}
    # the last pytest summary line wins
    for line in out.splitlines():
        found = SUMMARY_RE.findall(line)
        if found and ("passed" in line or "failed" in line or "error" in line
                      or "skipped" in line or "no tests ran" in line):
            counts = {k: int(v) for v, k in found}
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="explicit test files (default: discover)")
    ap.add_argument("--fast", action="store_true", help="quick tier (~3 min)")
    ap.add_argument("--all", action="store_true", help="include slow-marked tests")
    ap.add_argument("--timeout", type=int, default=1800, help="per-chunk seconds")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.files:
        files = args.files
    elif args.fast:
        files = [f for f in FAST_FILES if os.path.exists(os.path.join(root, f))]
    else:
        files = sorted(
            os.path.relpath(p, root)
            for p in glob.glob(os.path.join(root, "tests", "test_*.py"))
        )
    marker = None if args.all else "not slow"

    total = {"passed": 0, "failed": 0, "error": 0, "skipped": 0, "deselected": 0}
    bad = []
    t_start = time.time()
    for f in files:
        rc, out, dt = run_chunk([f], marker, args.timeout)
        retried = False
        if rc not in (0, 5):  # 5 = nothing collected after deselection
            # segfault (-11/139), flake, or failure: one retry in a fresh
            # process — the documented crash is environmental, not a repo bug
            sig = f"rc={rc}" + (" (SIGSEGV)" if rc in (-11, 139) else "")
            print(f"  retrying {f} after {sig} ...", flush=True)
            rc, out, dt2 = run_chunk([f], marker, args.timeout)
            dt += dt2
            retried = True
        counts = tally(out)
        for k in total:
            total[k] += counts.get(k, 0)
        status = "ok" if rc in (0, 5) else "FAIL"
        if rc not in (0, 5):
            bad.append(f)
        note = " [retried]" if retried else ""
        print(f"{status:4s} {f:42s} {dt:6.1f}s  {counts}{note}", flush=True)
        if rc not in (0, 5):
            tail = "\n".join(out.splitlines()[-30:])
            print(f"---- {f} output tail ----\n{tail}\n----", flush=True)

    dt_all = time.time() - t_start
    print(
        f"\nTOTAL: {total['passed']} passed, {total['failed']} failed, "
        f"{total['error']} errors, {total['skipped']} skipped "
        f"({len(files)} files, {dt_all:.0f}s)"
    )
    if bad:
        print("FAILED chunks:", ", ".join(bad))
        return 1
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
