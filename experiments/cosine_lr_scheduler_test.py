"""LR-schedule probe — mirrors experiments/cosine_lr_scheduler_test.py:
print CosineAnnealingWarmRestarts(T_0=150, T_mult=2) LR per iteration."""
from common import *  # noqa: F401,F403

from ampnet_tpu.train.optim import cosine_warm_restarts


def main(iters=700, base_lr=0.1, t0=150, t_mult=2):
    sched = cosine_warm_restarts(base_lr, t0, t_mult)
    for i in range(0, iters, 10):
        print(f"iter {i:5d}  lr {float(sched(i)):.6f}")


if __name__ == "__main__":
    main()
