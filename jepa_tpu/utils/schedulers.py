"""Training schedules as pure functions of the (1-indexed) update step.

The reference implements these as stateful iterators that mutate optimizer
param groups and must be replayed on resume (reference:
src/utils/schedulers.py:11-76, app/vjepa/train.py:322-326). Here every
schedule is a closed-form function of the step count, so resume is O(1) and
the whole thing lives inside the jitted train step.

Step convention: the reference calls ``scheduler.step()`` at the *start* of
update ``i`` (i = 0, 1, ...), which sets its internal counter to ``i + 1``
before computing. So ``lr_at(i + 1)`` here reproduces the lr used for update
``i``. The EMA momentum iterator is consumed with no pre-increment, so
``momentum_at(i)`` uses the raw update index.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WarmupCosine:
    """Linear warmup ``start_lr -> ref_lr`` then cosine decay to ``final_lr``.

    ``t_max`` is the total schedule length *including* warmup (the cosine
    phase spans ``t_max - warmup_steps`` steps), matching the reference.
    """

    warmup_steps: int
    start_lr: float
    ref_lr: float
    t_max: int
    final_lr: float = 0.0

    def __call__(self, step):
        """step: 1-indexed update counter (int or traced int array)."""
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = jnp.float32(max(1, self.warmup_steps))
        warm_lr = self.start_lr + (step / warm) * (self.ref_lr - self.start_lr)
        cos_span = jnp.float32(max(1, self.t_max - self.warmup_steps))
        progress = (step - self.warmup_steps) / cos_span
        cos_lr = self.final_lr + (self.ref_lr - self.final_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * progress)
        )
        cos_lr = jnp.maximum(self.final_lr, cos_lr)
        return jnp.where(step < self.warmup_steps, warm_lr, cos_lr)


@dataclasses.dataclass(frozen=True)
class CosineWD:
    """Cosine weight-decay schedule ``ref_wd -> final_wd`` over ``t_max``.

    The reference clamps toward ``final_wd`` from whichever side it sits on
    (wd can *increase* over training, e.g. 0.04 -> 0.4 in the pretrain
    configs).
    """

    ref_wd: float
    t_max: int
    final_wd: float = 0.0

    def __call__(self, step):
        step = jnp.asarray(step, dtype=jnp.float32)
        progress = step / jnp.float32(self.t_max)
        wd = self.final_wd + (self.ref_wd - self.final_wd) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * progress)
        )
        if self.final_wd <= self.ref_wd:
            return jnp.maximum(self.final_wd, wd)
        return jnp.minimum(self.final_wd, wd)


@dataclasses.dataclass(frozen=True)
class LinearMomentum:
    """EMA momentum ramp ``ema0 -> ema1`` over ``total`` steps (0-indexed)."""

    ema0: float
    ema1: float
    total: int

    def __call__(self, step):
        step = jnp.asarray(step, dtype=jnp.float32)
        return self.ema0 + step * (self.ema1 - self.ema0) / jnp.float32(self.total)


def build_schedules(
    *,
    ipe: int,
    num_epochs: int,
    warmup_epochs: float,
    start_lr: float,
    ref_lr: float,
    final_lr: float,
    wd: float,
    final_wd: float,
    ema: Tuple[float, float],
    ipe_scale: float = 1.0,
) -> Tuple[WarmupCosine, CosineWD, LinearMomentum]:
    """Construct the three pretrain schedules from config values.

    Mirrors app/vjepa/utils.py:init_opt + app/vjepa/train.py momentum
    generator in the reference.
    """
    t_max = int(ipe_scale * num_epochs * ipe)
    lr_sched = WarmupCosine(
        warmup_steps=int(warmup_epochs * ipe),
        start_lr=start_lr,
        ref_lr=ref_lr,
        final_lr=final_lr,
        t_max=t_max,
    )
    wd_sched = CosineWD(ref_wd=wd, final_wd=final_wd, t_max=t_max)
    mom_sched = LinearMomentum(ema0=ema[0], ema1=ema[1], total=t_max)
    return lr_sched, wd_sched, mom_sched
