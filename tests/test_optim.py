"""Optimizer parity: cosine-warm-restarts schedule and Adam+L2 chain vs
torch (the reference recipe, cora_benchmark_graphsaint.py:84-85,116)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ampnet_tpu.train.optim import cosine_warm_restarts, make_optimizer


@pytest.mark.parametrize("t0,t_mult", [(400, 2), (150, 2), (10, 1), (7, 3)])
def test_cosine_warm_restarts_matches_torch(t0, t_mult):
    torch = pytest.importorskip("torch")
    lr = 0.1
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=t0, T_mult=t_mult
    )
    ours = cosine_warm_restarts(lr, t0, t_mult)
    torch_lrs, our_lrs = [], []
    for step in range(3 * t0 + 5):
        torch_lrs.append(opt.param_groups[0]["lr"])
        our_lrs.append(float(ours(step)))
        sched.step()
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-5, atol=1e-7)


def test_adam_weight_decay_matches_torch():
    """torch Adam with weight_decay feeds grad+wd*p into the moments —
    verify our chain reproduces several steps exactly."""
    torch = pytest.importorskip("torch")
    import optax

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array(g, np.float32) for g in ([0.1, -0.3, 0.2], [0.05, 0.0, -0.1], [0.2, 0.2, 0.2])]

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([p], lr=0.01, weight_decay=0.1)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = make_optimizer(0.01, weight_decay=0.1)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), p.detach().numpy(), rtol=1e-5, atol=1e-7)
