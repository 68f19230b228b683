"""Failure recovery: restart resumes from the latest checkpoint."""
import numpy as np

from ampnet_tpu.core.config import AMPGCNConfig, TrainConfig
from ampnet_tpu.data.synthetic import get_xor_graphs
from ampnet_tpu.models import AMPGCN
from ampnet_tpu.train import train_full_batch
from ampnet_tpu.train.checkpoint import find_latest_checkpoint


def test_resume_from_latest_checkpoint(tmp_path):
    train_g, _ = get_xor_graphs(num_train_samples=16, num_test_samples=8, seed=0)
    cfg_model = AMPGCNConfig(
        embedding_dim=8, num_heads=2, num_node_features=2,
        num_sampled_vectors=4, output_dim=2, feat_emb_dim=7, val_emb_dim=1,
        dropout_rate=0.0, dropout_adj_rate=0.0,
    )
    model = AMPGCN(config=cfg_model)
    run_dir = str(tmp_path)

    # crash after 4 epochs (checkpoint every 2)
    cfg1 = TrainConfig(learning_rate=1e-3, epochs=4, cosine_t0=None,
                       checkpoint_every=2, run_dir=run_dir, log_every=10)
    r1 = train_full_batch(model, train_g, cfg1)
    assert find_latest_checkpoint(run_dir) is not None
    step_after_crash = int(r1["state"].step)

    # restart with a higher target: resumes, doesn't retrain from scratch
    cfg2 = TrainConfig(learning_rate=1e-3, epochs=6, cosine_t0=None,
                       checkpoint_every=2, run_dir=run_dir, log_every=10)
    r2 = train_full_batch(model, train_g, cfg2)
    epochs_run = [h["epoch"] for h in r2["history"]]
    assert epochs_run and epochs_run[0] >= 4  # started past the crash point
    assert int(r2["state"].step) > step_after_crash


def test_best_checkpoint_saved_and_excluded_from_resume(tmp_path):
    """select_best_every persists checkpoint_best.pkl on improvement, and
    failure recovery resumes from the latest PERIODIC checkpoint, never
    the selection artifact."""
    import jax
    import numpy as np

    from ampnet_tpu.core.config import TrainConfig
    from ampnet_tpu.core.graph import from_arrays
    from ampnet_tpu.models.classifiers import LinearLayer
    from ampnet_tpu.train import train_full_batch
    from ampnet_tpu.train.checkpoint import find_latest_checkpoint

    rng = np.random.default_rng(0)
    n, f = 32, 8
    g = from_arrays(
        rng.normal(size=(n, f)).astype(np.float32), np.empty((2, 0), np.int64),
        y=rng.integers(0, 2, n), train_mask=np.ones(n, bool),
        val_mask=np.ones(n, bool), test_mask=np.ones(n, bool),
    )
    run_dir = str(tmp_path / "run")
    import os
    os.makedirs(run_dir, exist_ok=True)
    cfg = TrainConfig(learning_rate=1e-2, weight_decay=0.0, epochs=4,
                      cosine_t0=None, run_dir=run_dir, checkpoint_every=2,
                      select_best_every=1, num_eval_samples=1)
    model = LinearLayer(out_dim=2)
    train_full_batch(model, g, cfg)
    assert os.path.exists(os.path.join(run_dir, "checkpoint_best.pkl"))
    latest = find_latest_checkpoint(run_dir)
    assert latest is not None and not latest.endswith("checkpoint_best.pkl")


def test_restore_best_survives_resume(tmp_path, rng):
    """A crash+resume must not let a worse post-resume validation
    overwrite the banked best (the loops restart best_val at -1; the
    banked checkpoint carries best_val_acc metadata to reseed it)."""
    import jax
    import jax.numpy as jnp

    from flax import struct

    from ampnet_tpu.train.checkpoint import restore_best, save_checkpoint

    @struct.dataclass
    class S:
        params: dict

    s = S(params={"w": jnp.arange(4.0)})
    save_checkpoint(str(tmp_path / "checkpoint_best.pkl"), s, epoch=25,
                    extra={"best_val_acc": 0.88})
    va, params = restore_best(str(tmp_path), s.params)
    assert va == 0.88
    assert jnp.allclose(params["w"], s.params["w"])
    # absent dir -> sentinel
    va2, p2 = restore_best(str(tmp_path / "nope"), s.params)
    assert va2 == -1.0 and p2 is None


def test_find_latest_checkpoint_epoch_ordered(tmp_path):
    """Resume picks the newest EPOCH even when mtimes are flattened
    (rsync/tar round-trip), and checkpoint_final outranks epochs;
    checkpoint_best is never the resume point."""
    import os

    from ampnet_tpu.train.checkpoint import find_latest_checkpoint

    for name in ("checkpoint_ep9.pkl", "checkpoint_ep49.pkl",
                 "checkpoint_best.pkl"):
        (tmp_path / name).write_bytes(b"x")
    t = 1700000000
    for name in os.listdir(tmp_path):  # identical mtimes
        os.utime(tmp_path / name, (t, t))
    assert find_latest_checkpoint(str(tmp_path)).endswith("checkpoint_ep49.pkl")
    (tmp_path / "checkpoint_final.pkl").write_bytes(b"x")
    os.utime(tmp_path / "checkpoint_final.pkl", (t, t))
    assert find_latest_checkpoint(str(tmp_path)).endswith("checkpoint_final.pkl")
