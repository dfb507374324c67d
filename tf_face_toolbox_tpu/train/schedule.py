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


def cosine(base_lr: float, total_steps: int, warmup_steps: int = 0,
           final_scale: float = 0.0) -> optax.Schedule:
    """Half-cosine decay base_lr → final_scale·base_lr over
    ``total_steps``, with the same absolute-step linear warmup as
    :func:`staircase` (the modern large-batch recipe; the reference era
    used staircase only [TF1-IDIOM]). Steps past ``total_steps`` hold
    the final value.
    """
    import jax.numpy as jnp

    if total_steps <= 0:
        raise ValueError("cosine schedule needs total_steps > 0 "
                         f"(got {total_steps})")

    def sched(step):
        step = jnp.asarray(step)
        frac = jnp.clip(step / total_steps, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        lr = base_lr * (final_scale + (1.0 - final_scale) * cos)
        if warmup_steps > 0:
            ramp = jnp.minimum(1.0, (step + 1) / warmup_steps)
            lr = lr * ramp
        return lr

    return sched
