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
    """base_lr, ×decay at each boundary step, optional linear warmup."""
    sched = optax.piecewise_constant_schedule(
        base_lr, {int(b): decay for b in boundaries})
    if warmup_steps <= 0:
        return sched
    warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
    return optax.join_schedules([warmup, sched], [warmup_steps])
