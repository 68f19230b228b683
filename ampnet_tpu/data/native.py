"""ctypes bindings for the native sampling core (data/csrc/sampler.cc).

Replaces torch_sparse's C++/CUDA random-walk and saint_subgraph ops
(SURVEY §2.7). Falls back to the pure-numpy implementations in
data/graphsaint.py when the shared library hasn't been built
(`make native` at the repo root builds it with g++)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "csrc", "libampnet_sampler.so")
_SRC_PATH = os.path.join(os.path.dirname(__file__), "csrc", "sampler.cc")


def build_native(force: bool = False) -> Optional[str]:
    """Compile the sampler library with g++ if missing or STALE (source
    newer than the .so). Compiles to a per-pid temp path and
    os.replace()s it in, so concurrent first-use builds (pytest-xdist,
    multi-process drivers) can't race on a half-linked library."""
    if (not force and os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC_PATH)):
        return _LIB_PATH
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", _SRC_PATH, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, _LIB_PATH)
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        # an existing (possibly stale) library is still usable
        return _LIB_PATH if os.path.exists(_LIB_PATH) else None


def load_native(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    # always consult build_native: it no-ops when the .so is fresh and
    # REBUILDS when sampler.cc is newer (the old path only built on a
    # missing file, silently running stale native code after source edits)
    if auto_build:
        if build_native() is None:
            return None
    elif not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f64p = ctypes.POINTER(ctypes.c_double)

    lib.ampnet_random_walk.argtypes = [
        i64p, i32p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, i64p,
    ]
    lib.ampnet_random_walk.restype = None
    lib.ampnet_induced_edges.argtypes = [
        i64p, ctypes.c_int64, u8p, ctypes.c_int64, i64p, i32p, i64p,
        i64p, ctypes.c_int64,
    ]
    lib.ampnet_induced_edges.restype = ctypes.c_int64
    lib.ampnet_norm_prepass.argtypes = [
        i64p, i32p, ctypes.c_int64, i64p, i32p, i64p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_int64, f64p, f64p,
    ]
    lib.ampnet_norm_prepass.restype = ctypes.c_int64
    _LIB = lib
    return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def random_walk_native(
    indptr: np.ndarray, indices: np.ndarray, starts: np.ndarray,
    walk_length: int, seed: int,
) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    starts = np.ascontiguousarray(starts, np.int64)
    out = np.empty((len(starts), walk_length + 1), np.int64)
    lib.ampnet_random_walk(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        len(indptr) - 1, _ptr(starts, ctypes.c_int64), len(starts),
        walk_length, seed & (2**64 - 1), _ptr(out, ctypes.c_int64),
    )
    return out


class NativeInducedEdges:
    """Reusable induced-subgraph extractor over a fixed base graph."""

    def __init__(self, src_indptr: np.ndarray, dst_sorted: np.ndarray,
                 edge_ids: np.ndarray, num_nodes: int):
        self.lib = load_native()
        self.src_indptr = np.ascontiguousarray(src_indptr, np.int64)
        self.dst_sorted = np.ascontiguousarray(dst_sorted, np.int32)
        self.edge_ids = np.ascontiguousarray(edge_ids, np.int64)
        self.n = num_nodes
        self.scratch = np.zeros(num_nodes, np.uint8)
        self.nnz = len(edge_ids)

    def __call__(self, node_set: np.ndarray) -> Optional[np.ndarray]:
        if self.lib is None:
            return None
        node_set = np.ascontiguousarray(node_set, np.int64)
        out = np.empty(self.nnz, np.int64)
        cnt = self.lib.ampnet_induced_edges(
            _ptr(node_set, ctypes.c_int64), len(node_set),
            _ptr(self.scratch, ctypes.c_uint8), self.n,
            _ptr(self.src_indptr, ctypes.c_int64),
            _ptr(self.dst_sorted, ctypes.c_int32),
            _ptr(self.edge_ids, ctypes.c_int64),
            _ptr(out, ctypes.c_int64), self.nnz,
        )
        return out[:cnt]


def norm_prepass_native(
    indptr: np.ndarray, indices: np.ndarray,
    src_indptr: np.ndarray, dst_sorted: np.ndarray, edge_ids: np.ndarray,
    num_nodes: int, batch_size: int, walk_length: int, coverage: int,
    num_steps: int, seed: int, num_threads: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    lib = load_native()
    if lib is None:
        return None
    if num_threads <= 0:
        # FIXED default (not cpu_count-derived): with the deterministic
        # chunked pre-pass the processed-sample set depends on the thread
        # count, so tying it to the host's cores would make norms differ
        # across machines under the same seed
        num_threads = 8
    nnz = len(edge_ids)
    node_count = np.zeros(num_nodes, np.float64)
    edge_count = np.zeros(nnz, np.float64)
    num_samples = lib.ampnet_norm_prepass(
        _ptr(np.ascontiguousarray(indptr, np.int64), ctypes.c_int64),
        _ptr(np.ascontiguousarray(indices, np.int32), ctypes.c_int32),
        num_nodes,
        _ptr(np.ascontiguousarray(src_indptr, np.int64), ctypes.c_int64),
        _ptr(np.ascontiguousarray(dst_sorted, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(edge_ids, np.int64), ctypes.c_int64),
        nnz, batch_size, walk_length, coverage, num_steps,
        seed & (2**64 - 1), num_threads,
        _ptr(node_count, ctypes.c_double), _ptr(edge_count, ctypes.c_double),
    )
    return node_count, edge_count, int(num_samples)
