"""BasicSR learning-rate schedules as optax-compatible schedule functions
(basicsr/models/lr_scheduler.py).

Both are pure ``step -> lr`` callables (pass to ``optax.scale_by_schedule``
or any optimizer's ``learning_rate=``), jit-compatible via jnp ops on the
step counter.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def multistep_restart_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    restarts: Sequence[int] = (0,),
    restart_weights: Sequence[float] = (1.0,),
):
    """MultiStepRestartLR (lr_scheduler.py:6-33): decay by gamma at each
    milestone; at a restart iteration the lr resets to base_lr * weight
    and the milestone decays start over from that point."""
    if len(restarts) != len(restart_weights):
        raise ValueError("restarts and restart_weights must match")
    restarts = np.asarray(sorted(restarts))
    weights = np.asarray(
        [w for _, w in sorted(zip(restarts, restart_weights))], np.float32)
    milestones = np.asarray(sorted(milestones))

    def schedule(step):
        step = jnp.asarray(step)
        # which restart segment are we in?
        seg = jnp.sum(step >= jnp.asarray(restarts)) - 1
        seg = jnp.clip(seg, 0, len(restarts) - 1)
        seg_start = jnp.asarray(restarts)[seg]
        weight = jnp.asarray(weights)[seg]
        # milestones passed since the segment start
        ms = jnp.asarray(milestones)
        n_decay = jnp.sum((ms > seg_start) & (ms <= step))
        return base_lr * weight * (gamma ** n_decay)

    return schedule


def cosine_annealing_restart_lr(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1.0,),
    eta_min: float = 0.0,
):
    """CosineAnnealingRestartLR (lr_scheduler.py:57-96): per-cycle cosine
    anneal from base_lr*weight down to eta_min, restarting at each period
    boundary."""
    if len(periods) != len(restart_weights):
        raise ValueError("periods and restart_weights must match")
    cum = np.cumsum(periods)
    starts = np.concatenate([[0], cum[:-1]])

    def schedule(step):
        step = jnp.asarray(step)
        idx = jnp.sum(step > jnp.asarray(cum))   # first i with step <= cum[i]
        idx = jnp.clip(idx, 0, len(periods) - 1)
        w = jnp.asarray(np.asarray(restart_weights, np.float32))[idx]
        start = jnp.asarray(starts)[idx]
        period = jnp.asarray(np.asarray(periods))[idx]
        t = (step - start) / period
        return eta_min + w * 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * t))

    return schedule
