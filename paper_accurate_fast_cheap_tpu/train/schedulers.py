"""LR schedules as optax-compatible schedule functions.

Parity targets: `wenet/utils/scheduler.py` — WarmupLR (`:28-73`:
lr * d? no — lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)),
NoamHoldAnnealing (`:625-718`), SteadyLR (`:721-757`: linear warmup then
constant).
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_lr(lr: float, warmup_steps: int = 25000):
    """WarmupLR: inverse-sqrt decay with warmup; at step==warmup the value is
    exactly ``lr``."""

    def sched(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return lr * warmup_steps ** 0.5 * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5
        )

    return sched


def steady_lr(lr: float, warmup_steps: int = 25000):
    """SteadyLR: linear ramp 0 -> lr over warmup_steps, then constant."""

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        return lr * jnp.minimum(1.0, (s + 1.0) / warmup_steps)

    return sched


def noam_hold_annealing(lr: float, warmup_steps: int, hold_steps: int,
                        max_steps: int, decay_rate: float = 0.5,
                        min_lr: float = 0.0):
    """NeMo-style Noam + hold + polynomial annealing."""

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        warm = s / jnp.maximum(warmup_steps, 1)
        hold_end = warmup_steps + hold_steps
        decay_span = jnp.maximum(max_steps - hold_end, 1)
        frac = jnp.clip((s - hold_end) / decay_span, 0.0, 1.0)
        decayed = lr * (1.0 - frac) ** (1.0 / decay_rate) \
            if decay_rate else lr
        val = jnp.where(
            s < warmup_steps, lr * warm,
            jnp.where(s < hold_end, lr, jnp.maximum(decayed, min_lr)),
        )
        return val

    return sched


SCHEDULERS = {
    "warmuplr": warmup_lr,
    "steadylr": steady_lr,
}
