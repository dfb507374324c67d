"""Checkpoint watcher: TF-Serving-style model version polling.

The reference era deployed new face models by pointing a serving
process at a directory and letting it poll for new versions
[TF1-IDIOM — TF Serving's file-system model watcher]. The daemon here
gets the same contract: :class:`CheckpointWatcher` polls a train dir's
orbax checkpoints and hot-swaps the resident
:class:`~tf_face_toolbox_tpu.serving.server.EmbeddingService` onto the
newest step via :meth:`EmbeddingService.reload` — requests keep
flowing through the old weights until the swap, which is atomic.

The expensive half of a reload (checkpoint restore, optional int8
recalibration, optional BN re-fold + recompile) runs on the watcher
thread, never on the request path. A reload that fails for any reason
(partially written checkpoint, calibration error) is logged and
retried next poll; the daemon keeps serving the previous weights —
a bad new version must never take down the live one.
"""

from __future__ import annotations

import threading
from typing import Callable

from absl import logging


class CheckpointWatcher:
    """Poll ``checkpoint_dir`` and hot-reload the service on new steps.

    ``rebuild()`` is the boot-time model-build chain packaged as a
    closure (cli.serve owns it: restore → optional calibrate →
    optional fold). It returns ``(variables, apply_fn_or_None, step)``;
    ``apply_fn=None`` means the flax/int8 zero-recompile swap path.
    """

    def __init__(self, service, checkpoint_dir: str,
                 rebuild: Callable[[], tuple], *,
                 interval: float = 30.0):
        from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

        self.service = service
        self.interval = float(interval)
        self._mgr = CheckpointManager(checkpoint_dir)
        self._rebuild = rebuild
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def poll_once(self) -> bool:
        """One poll: reload if a newer step exists. Returns True on a
        completed swap; False (never raises) otherwise."""
        try:
            self._mgr.refresh()      # see checkpoints OTHER processes wrote
            latest = self._mgr.latest_step()
        except Exception as e:       # unreadable dir: keep serving
            logging.warning("checkpoint poll failed: %s", e)
            return False
        if latest is None or latest == self.service.step:
            return False
        old = self.service.step
        try:
            variables, apply_fn, step = self._rebuild()
            if apply_fn is None:
                self.service.reload(variables, step=step)
            else:
                self.service.reload(variables, apply_fn=apply_fn,
                                    step=step)
        # SystemExit too: it is a BaseException, and a rebuild closure
        # that reuses boot-path helpers could leak one — in a non-main
        # thread Python swallows it and the watcher would die silently,
        # permanently stopping version tracking
        except (Exception, SystemExit) as e:
            logging.warning("reload to step %s failed (still serving "
                            "step %s): %s", latest, old, e)
            return False
        logging.info("hot-reloaded serving weights: step %s -> %s",
                     old, step)
        return True

    def start(self) -> "CheckpointWatcher":
        def loop():
            while not self._stop.wait(self.interval):
                self.poll_once()

        self._thread = threading.Thread(target=loop, daemon=True,
                                        name="ckpt-watcher")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
