from ampnet_tpu.train.optim import cosine_warm_restarts, make_optimizer
from ampnet_tpu.train.losses import (
    nll_loss,
    masked_mean_nll,
    saint_weighted_mean_nll,
    saint_weighted_nll,
    bce_with_logits,
    masked_accuracy,
)
from ampnet_tpu.train.state import (
    TrainState,
    create_train_state,
    make_scan_train_step,
    make_train_step,
    make_eval_step,
    split_rngs,
)
from ampnet_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    load_checkpoint_params,
    save_params,
    load_params,
)
from ampnet_tpu.train.loop import train_full_batch, train_saint
from ampnet_tpu.train.rundir import create_run_dir, Logfile

__all__ = [
    "cosine_warm_restarts",
    "make_optimizer",
    "nll_loss",
    "masked_mean_nll",
    "saint_weighted_mean_nll",
    "saint_weighted_nll",
    "bce_with_logits",
    "masked_accuracy",
    "TrainState",
    "create_train_state",
    "make_scan_train_step",
    "make_train_step",
    "make_eval_step",
    "split_rngs",
    "save_checkpoint",
    "load_checkpoint",
    "load_checkpoint_params",
    "save_params",
    "load_params",
    "train_full_batch",
    "train_saint",
    "create_run_dir",
    "Logfile",
]
