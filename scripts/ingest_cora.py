"""Ingest the real Planetoid Cora raw files so every Cora driver runs on
real data instead of the synthetic surrogate.

The build environment is network-isolated, so the files cannot be
vendored here; on any machine with the files (or network) run:

    python scripts/ingest_cora.py --src /path/with/ind.cora.*   # copy
    python scripts/ingest_cora.py --download                    # fetch

Files land in data/cora/ — the first hit in load_cora's search path
(ampnet_tpu/data/planetoid.py::load_cora), after which
experiments/cora_benchmark_full.py and cora_benchmark_graphsaint.py
report REAL-Cora numbers with no flag changes. The parser itself is
exercised by a generated fixture (tests/test_data.py::
test_load_planetoid_raw_fixture), so this path is checkable without the
15 MB payload in-repo.
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

SUFFIXES = ["x", "y", "tx", "ty", "allx", "ally", "graph", "test.index"]
# canonical raw-file host used by PyG's Planetoid dataset
URL_BASE = "https://github.com/kimiyoung/planetoid/raw/master/data"
DEST = os.path.join(os.path.dirname(__file__), "..", "data", "cora")


def validate(root: str) -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from ampnet_tpu.data.planetoid import (
        CORA_NUM_CLASSES,
        CORA_NUM_EDGES,
        CORA_NUM_FEATURES,
        CORA_NUM_NODES,
        load_planetoid_raw,
    )

    d = load_planetoid_raw(root, "cora")
    checks = {
        "nodes": (d.num_nodes, CORA_NUM_NODES),
        "features": (d.num_features, CORA_NUM_FEATURES),
        "classes": (d.num_classes, CORA_NUM_CLASSES),
        "directed edges": (d.edge_index.shape[1], CORA_NUM_EDGES),
        "train": (int(d.train_mask.sum()), 140),
        "val": (int(d.val_mask.sum()), 500),
        "test": (int(d.test_mask.sum()), 1000),
    }
    for k, (got, want) in checks.items():
        status = "OK" if got == want else "MISMATCH"
        print(f"  {k:15s} {got:6d} (expected {want}) {status}")
    if any(got != want for got, want in checks.values()):
        raise SystemExit("validation failed — files corrupt or wrong dataset")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", help="directory containing ind.cora.* files")
    ap.add_argument("--download", action="store_true",
                    help="fetch from the canonical planetoid repo (needs network)")
    ap.add_argument("--dest", default=DEST)
    args = ap.parse_args()

    os.makedirs(args.dest, exist_ok=True)
    if args.src:
        for s in SUFFIXES:
            shutil.copy2(os.path.join(args.src, f"ind.cora.{s}"),
                         os.path.join(args.dest, f"ind.cora.{s}"))
    elif args.download:
        import urllib.request

        for s in SUFFIXES:
            url = f"{URL_BASE}/ind.cora.{s}"
            out = os.path.join(args.dest, f"ind.cora.{s}")
            print(f"fetching {url}")
            urllib.request.urlretrieve(url, out)
    else:
        raise SystemExit("pass --src DIR or --download")

    print(f"validating {args.dest} ...")
    validate(args.dest)
    print("done — load_cora() now returns real Cora")


if __name__ == "__main__":
    main()
