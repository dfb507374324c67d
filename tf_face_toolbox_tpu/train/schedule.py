"""Learning-rate schedules.

The reference used a staircase decay driven by flags [TF1-IDIOM,
SURVEY.md §2a "LR schedule"]; we add linear warmup (standard for
large-batch margin-softmax training, which the DP mesh enables).
"""

from __future__ import annotations

from typing import Sequence

import optax


def staircase(base_lr: float, boundaries: Sequence[int],
              decay: float = 0.1, warmup_steps: int = 0) -> optax.Schedule:
    """base_lr, ×decay at each boundary step, optional linear warmup.

    Boundaries are ABSOLUTE global steps (optax.join_schedules would
    shift them late by warmup_steps — the inner schedule sees
    step-warmup; we implement the staircase directly instead).
    """
    import jax.numpy as jnp

    bnd = jnp.asarray(sorted(int(b) for b in boundaries), jnp.int32)

    def sched(step):
        step = jnp.asarray(step)
        lr = base_lr * decay ** jnp.sum(step >= bnd)
        if warmup_steps > 0:
            ramp = jnp.minimum(1.0, (step + 1) / warmup_steps)
            lr = lr * ramp
        return lr

    return sched
