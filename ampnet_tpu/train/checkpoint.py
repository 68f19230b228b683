"""Checkpoint / resume.

The reference saves {'epoch', 'model_state_dict', 'validation_loss'} via
torch.save every K epochs (cora_benchmark_graphsaint.py:138-143) and does
NOT checkpoint optimizer or RNG state (SURVEY §5.4). Here checkpoints
carry params + opt_state + PRNG key + step so resume is exact.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from flax import serialization

# Checkpoints are pure msgpack (flax.serialization) — no pickle anywhere,
# so loading an untrusted checkpoint file cannot execute code.


def save_checkpoint(
    path: str,
    state,
    epoch: int,
    validation_loss: Optional[float] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Serialize a TrainState (params, opt_state, step, rng) + metadata."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "epoch": epoch,
        "validation_loss": -1.0 if validation_loss is None else float(validation_loss),
        "state_bytes": serialization.to_bytes(state),
        # params stored separately so eval-time reload works without
        # reconstructing the exact optimizer (visualizer pattern, §3.4)
        "params_bytes": serialization.to_bytes(state.params),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    return path


def _read_payload(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_checkpoint(path: str, state_template) -> Dict[str, Any]:
    """Restore into a freshly-created TrainState of identical structure."""
    payload = _read_payload(path)
    state = serialization.from_bytes(state_template, payload["state_bytes"])
    vl = payload["validation_loss"]
    return {
        "state": state,
        "epoch": int(payload["epoch"]),
        "validation_loss": None if vl == -1.0 else vl,
        "extra": payload.get("extra", {}),
    }


def load_checkpoint_params(path: str, params_template):
    """Restore only the params from a full checkpoint (no optimizer
    reconstruction needed — for eval/visualization reload)."""
    payload = _read_payload(path)
    if "params_bytes" in payload:
        return serialization.from_bytes(params_template, payload["params_bytes"])
    raise KeyError(
        "checkpoint predates params_bytes; use load_checkpoint with a "
        "matching optimizer template"
    )


def find_latest_checkpoint(run_dir: str) -> Optional[str]:
    """Latest checkpoint in a run dir by EPOCH NUMBER (failure-recovery
    entry point: the reference's story is 'restart from the latest
    periodic checkpoint' — SURVEY §5.3). Ordering by mtime is wrong
    after an rsync/tar round-trip that flattens timestamps; the epoch is
    parsed from the basename (checkpoint_final outranks every epoch),
    with mtime only as the tie-breaker."""
    import glob
    import re

    def order(p):
        base = os.path.basename(p)
        if base == "checkpoint_final.pkl":
            return (2, 0, os.path.getmtime(p))
        m = re.search(r"ep(\d+)", base)
        if m:
            return (1, int(m.group(1)), os.path.getmtime(p))
        return (0, 0, os.path.getmtime(p))

    cands = [
        p for p in glob.glob(os.path.join(run_dir, "checkpoint_*.pkl"))
        # checkpoint_best.pkl is the model-SELECTION artifact (best-val
        # params, possibly many epochs old) — never the resume point
        if not p.endswith("checkpoint_best.pkl")
    ]
    if not cands:
        return None
    return max(cands, key=order)


def restore_best(run_dir: str, params_template):
    """(best_val_acc, best_params) banked by the selection loop, or
    (-1.0, None) if absent. Resume paths call this so a crash+restart
    cannot let a WORSE post-resume validation overwrite the pre-crash
    best (the loops would otherwise restart best-val tracking at -1).
    Old checkpoints without the best_val_acc metadata return their
    params with -1.0 (pre-fix behavior)."""
    path = os.path.join(run_dir, "checkpoint_best.pkl")
    if not os.path.exists(path):
        return -1.0, None
    payload = _read_payload(path)
    va = float(payload.get("extra", {}).get("best_val_acc", -1.0))
    params = serialization.from_bytes(params_template, payload["params_bytes"])
    return va, params


def resume_or_create(run_dir: Optional[str], state_template):
    """Restore the latest checkpoint if one exists, else return the fresh
    template. Returns (state, start_epoch)."""
    if run_dir:
        path = find_latest_checkpoint(run_dir)
        if path:
            restored = load_checkpoint(path, state_template)
            return restored["state"], restored["epoch"] + 1
    return state_template, 0


def save_params(path: str, params) -> str:
    """Params-only checkpoint (for eval-time reload, e.g. the attention
    visualizers — experiments/visualize_cora_attn_coeffs.py:200-203)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def load_params(path: str, params_template):
    with open(path, "rb") as f:
        return serialization.from_bytes(params_template, f.read())
