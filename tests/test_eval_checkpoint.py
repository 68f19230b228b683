"""Checkpoint discovery logic of the eval CLI (experiments/eval_checkpoint.py)."""
import importlib.util
import os

import pytest


def _load():
    spec = importlib.util.spec_from_file_location(
        "eval_checkpoint",
        os.path.join(os.path.dirname(__file__), "..", "experiments",
                     "eval_checkpoint.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_find_checkpoint_prefers_best(tmp_path):
    m = _load()
    for name in ("checkpoint_ep9.pkl", "checkpoint_ep19.pkl",
                 "checkpoint_best.pkl", "checkpoint_final.pkl"):
        (tmp_path / name).write_bytes(b"x")
    assert m.find_checkpoint(str(tmp_path)).endswith("checkpoint_best.pkl")


def test_find_checkpoint_newest_epoch_then_final(tmp_path):
    m = _load()
    for name in ("checkpoint_ep9.pkl", "checkpoint_ep19.pkl"):
        (tmp_path / name).write_bytes(b"x")
    assert m.find_checkpoint(str(tmp_path)).endswith("checkpoint_ep19.pkl")
    (tmp_path / "checkpoint_final.pkl").write_bytes(b"x")
    assert m.find_checkpoint(str(tmp_path)).endswith("checkpoint_final.pkl")


def test_find_checkpoint_direct_file_and_missing(tmp_path):
    m = _load()
    f = tmp_path / "some.pkl"
    f.write_bytes(b"x")
    assert m.find_checkpoint(str(f)) == str(f)
    with pytest.raises(FileNotFoundError):
        m.find_checkpoint(str(tmp_path / "empty"))
