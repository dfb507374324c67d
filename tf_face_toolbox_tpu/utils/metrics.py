"""Metric logging: console + TensorBoard-compatible writers.

Rebuild of the reference's tf.summary scalars + console loss/speed
prints (ref: upstream train.py summary hooks [TF1-IDIOM]; SURVEY.md §5).
Uses clu's metric_writers when available (installed in this image),
falling back to a console-only writer.
"""

from __future__ import annotations

import time
from typing import Mapping

from absl import logging


class MetricLogger:
    """Scalar logger with step-rate (faces/sec) tracking."""

    def __init__(self, logdir: str | None = None, *,
                 batch_size: int | None = None):
        self.batch_size = batch_size
        self._writer = None
        if logdir:
            try:
                from clu import metric_writers
                self._writer = metric_writers.create_default_writer(logdir)
            except Exception as e:  # pragma: no cover - env dependent
                logging.warning("clu writer unavailable (%s); console only", e)
        self._last_time: float | None = None
        self._last_step: int | None = None

    def log(self, step: int, scalars: Mapping[str, float]) -> None:
        scalars = {k: float(v) for k, v in scalars.items()}
        now = time.perf_counter()
        if self._last_time is not None and step > self._last_step:
            dt = now - self._last_time
            steps_per_sec = (step - self._last_step) / dt
            scalars["steps_per_sec"] = steps_per_sec
            if self.batch_size:
                scalars["faces_per_sec"] = steps_per_sec * self.batch_size
        self._last_time, self._last_step = now, step
        if self._writer is not None:
            self._writer.write_scalars(step, scalars)
        logging.info("step %d: %s", step,
                     " ".join(f"{k}={v:.5g}" for k, v in scalars.items()))

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
