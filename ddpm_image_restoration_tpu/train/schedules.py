"""Optax learning-rate schedules.

The reference uses torch CosineAnnealingWarmRestarts(T_0=100, T_mult=2),
stepped once per *epoch* (webp_training.py:776, :531). Optax has no built-in
warm-restart cosine, so it is composed from joined cosine segments with
doubling periods.
"""

from __future__ import annotations

import optax


def cosine_warm_restarts(
    base_lr: float,
    t0: int,
    t_mult: int = 2,
    eta_min: float = 0.0,
    max_steps: int = 1_000_000,
) -> optax.Schedule:
    """Cosine annealing with warm restarts, in the same units the caller
    counts steps in (the train loop passes epoch-granular step counts
    scaled by steps_per_epoch)."""
    schedules = []
    boundaries = []
    period, total = t0, 0
    while total < max_steps:
        schedules.append(
            optax.cosine_decay_schedule(
                init_value=base_lr - eta_min, decay_steps=max(1, period), alpha=0.0
            )
        )
        total += period
        boundaries.append(total)
        period *= t_mult
    base = optax.join_schedules(schedules, boundaries[:-1])

    def schedule(count):
        return base(count) + eta_min

    return schedule
