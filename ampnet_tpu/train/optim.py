"""Optimizers and LR schedules.

Matches the reference training recipe: torch Adam with L2-style
weight_decay (decay added to the gradient BEFORE the Adam moments — torch
semantics, not AdamW) and CosineAnnealingWarmRestarts stepped once per
iteration (experiments/cora_benchmark_graphsaint.py:84-85,116).
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import optax


def cosine_warm_restarts(
    base_lr: float,
    t_0: int,
    t_mult: int = 1,
    eta_min: float = 0.0,
) -> optax.Schedule:
    """torch.optim.lr_scheduler.CosineAnnealingWarmRestarts as an optax
    schedule over the per-iteration step count.

    lr(t) = eta_min + (base_lr - eta_min) * (1 + cos(pi * T_cur/T_i)) / 2
    with restart cycles T_0, T_0*t_mult, T_0*t_mult^2, ...
    Verified against torch per-iteration stepping in tests/test_optim.py.
    """
    if t_0 <= 0:
        raise ValueError("t_0 must be positive")

    def schedule(step):
        t = jnp.asarray(step, dtype=jnp.float32)
        if t_mult == 1:
            t_i = float(t_0)
            t_cur = jnp.mod(t, t_0)
        else:
            # cycle n: t in [t_0*(m^n - 1)/(m - 1), t_0*(m^{n+1} - 1)/(m - 1))
            m = float(t_mult)
            ratio = t * (m - 1.0) / t_0 + 1.0
            n = jnp.floor(jnp.log(ratio) / math.log(m))
            cycle_start = t_0 * (jnp.power(m, n) - 1.0) / (m - 1.0)
            t_i = t_0 * jnp.power(m, n)
            t_cur = t - cycle_start
        return eta_min + (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0

    return schedule


def make_optimizer(
    learning_rate: float,
    weight_decay: float = 0.0,
    cosine_t0: Optional[int] = None,
    cosine_t_mult: int = 2,
    eta_min: float = 0.0,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """torch-Adam-equivalent chain: [clip] -> +wd*p -> adam moments -> -lr."""
    if cosine_t0:
        schedule = cosine_warm_restarts(learning_rate, cosine_t0, cosine_t_mult, eta_min)
    else:
        schedule = learning_rate
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        # torch Adam: d_p = grad + wd * p fed into the moment estimates
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
