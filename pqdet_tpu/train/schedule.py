"""Learning-rate schedules as pure functions of the global step.

Matches the reference's hand-rolled per-step schedulers
(trainer.py:71-117): linear warmup to init_lr, then cosine anneal to
end_lr or milestone step decay.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def cosine_warmup(init_lr: float, end_lr: float, warmup_steps: int,
                  max_steps: int):
    warmup_steps = max(warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup_steps * init_lr
        progress = (step - warmup_steps) / max(max_steps - warmup_steps, 1)
        cos = end_lr + 0.5 * (init_lr - end_lr) * (1 + jnp.cos(progress * math.pi))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def step_decay_warmup(init_lr: float, warmup_steps: int, steps_per_epoch: int,
                      mile_stones: Sequence[int], gamma: float):
    warmup_steps = max(warmup_steps, 1)
    boundaries = [m * steps_per_epoch for m in mile_stones]

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup_steps * init_lr
        decayed = jnp.full_like(step, init_lr)
        for i, b in enumerate(boundaries):
            decayed = jnp.where(step >= b, init_lr * gamma ** (i + 1), decayed)
        return jnp.where(step < warmup_steps, warm, decayed)

    return schedule


def build_schedule(cfg, steps_per_epoch: int):
    """Schedule from the train config group (reference trainer.py:66-69)."""
    warmup = int(cfg.train.warmup_epochs * steps_per_epoch)
    if cfg.train.scheduler == 'cosine':
        return cosine_warmup(cfg.train.learning_rate_init,
                             cfg.train.learning_rate_end,
                             warmup, cfg.train.max_epochs * steps_per_epoch)
    if cfg.train.scheduler == 'step':
        return step_decay_warmup(cfg.train.learning_rate_init, warmup,
                                 steps_per_epoch, cfg.train.mile_stones,
                                 cfg.train.gamma)
    raise ValueError(f'unknown scheduler: {cfg.train.scheduler}')
