"""The training loop: data → step_fn → metrics → checkpoints → resume.

Rebuild of the reference's session loop (ref: upstream train.py
``while step < max: sess.run(train_op)`` [TF1-IDIOM]; SURVEY.md §3.1 hot
loop), restructured for JAX's async dispatch: the host thread stays
ahead of the device, prefetching and enqueueing the next step while the
current one runs; metrics are only materialized (device sync) every
``log_every`` steps.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import numpy as np

from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager
from tf_face_toolbox_tpu.train.state import TrainState
from tf_face_toolbox_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
    shard_state,
)
from tf_face_toolbox_tpu.utils.metrics import MetricLogger


@dataclasses.dataclass
class LoopResult:
    state: TrainState
    last_metrics: dict


def train_loop(cfg: TrainConfig, mesh, batches: Iterator[dict], *,
               num_steps: int,
               train_dir: str | None = None,
               save_every: int = 1000,
               log_every: int = 100,
               net=None,
               rng_seed: int = 0,
               logger: MetricLogger | None = None,
               eval_fn=None,
               eval_every: int = 0,
               keep_best: str = "",
               input_format: str = "u8",
               should_stop=None,
               warm_start=None,
               teacher=None,
               max_consecutive_skips: int = 100) -> LoopResult:
    """Run (or resume) training for ``num_steps`` total steps.

    Resume semantics match the reference's Saver/latest_checkpoint
    behavior [TF1-IDIOM]: if ``train_dir`` holds a checkpoint, training
    continues from its step with optimizer state, BN stats, and RNG
    intact. The caller aligns the data iterator (see
    data.pipeline.batch_iterator start_epoch/start_step).

    ``warm_start``: optional ``state -> state`` fine-tune initializer
    (train.finetune), applied ONLY when the run starts fresh — a
    checkpoint in ``train_dir`` always wins, so a preempted fine-tune
    run resumes its own progress instead of re-grafting the source.

    ``teacher``: optional ``(teacher_net, teacher_variables)`` for
    embedding-space distillation (see make_train_step).

    ``keep_best``: name of an ``eval_fn`` metric (higher = better, e.g.
    ``"lfw_accuracy"``); whenever an eval improves on the best seen so
    far — across restarts — the state is also saved to
    ``<train_dir>/best`` (CheckpointManager.save_best), immune to the
    periodic ring buffer's GC.

    ``max_consecutive_skips``: with ``cfg.skip_nonfinite``, a
    persistently diverged run (LR blowup, corrupted shard) would skip
    every step forever while appearing to train. The loop keeps the
    per-step skip flags as unmaterialized device scalars (no extra
    sync; async dispatch is preserved) and settles them every
    min(log_every, 100) steps — a fixed cadence, so the abort fires
    even with logging disabled: the cumulative count is logged as
    ``skipped_nonfinite_total`` and a run of ``max_consecutive_skips``
    consecutive skips — tracked across log boundaries — raises
    ``FloatingPointError`` (t5x-style) instead of training on air.
    0 disables the abort (counting still logs).
    """
    state, net = create_train_state(cfg, jax.random.key(rng_seed), mesh,
                                    net=net)
    resumed = False
    mgr = None
    if train_dir:
        mgr = CheckpointManager(train_dir, save_every=save_every)
        if mgr.latest_step() is not None:
            resumed = True
            if mgr.has_ema() != (state.ema_params is not None):
                raise ValueError(
                    "checkpoint EMA state does not match config: resume "
                    f"with {'--ema_decay>0' if mgr.has_ema() else '--ema_decay=0'} "
                    "(the same setting the run was started with)")
            ck_heads = mgr.head_state_children()
            st_heads = set(state.head_state or {})
            if ck_heads != st_heads:
                raise ValueError(
                    "checkpoint loss-head state does not match config: "
                    f"checkpoint has {sorted(ck_heads) or 'none'}, config "
                    f"builds {sorted(st_heads) or 'none'} — resume with "
                    "the same --margin/--center_loss settings the run "
                    "was started with")
            from tf_face_toolbox_tpu.train.trainer import state_pspecs

            if jax.process_count() > 1:
                # restore straight into global shardings — resharding
                # after the fact is a cross-host transfer (see
                # CheckpointManager.restore)
                state = mgr.restore(state, mesh=mesh,
                                    pspecs=state_pspecs(state))
            else:
                state = shard_state(mgr.restore(state), mesh)
    if warm_start is not None and not resumed:
        state = warm_start(state)
    step_fn = make_train_step(net, cfg, mesh, state,
                              input_format=input_format,
                              teacher=teacher)
    logger = logger or MetricLogger(train_dir,
                                    batch_size=cfg.global_batch)

    # Preemption checks. Single-process: test the local flag each step.
    # Multi-process: the flag is process-local but the checkpoint flush
    # is a global collective, so breaking on a local flag would leave
    # the other processes inside the next step's all-reduce — a
    # distributed deadlock. All processes therefore AGREE on stopping
    # via a tiny allgather, at a bounded cadence (every `stop_sync`
    # steps) so the collective doesn't serialize every step's dispatch.
    check_stop = should_stop
    stop_sync = 1
    if should_stop is not None and jax.process_count() > 1:
        from jax.experimental import multihost_utils

        stop_sync = 10  # ≤10 extra steps before the flush; SIGTERM
        # grace windows are tens of seconds, steps ~100 ms

        def check_stop():
            return bool(np.asarray(multihost_utils.process_allgather(
                np.asarray(should_stop()))).any())

    metrics = {}
    preempted = False
    keep_best_warned = False
    # skip_nonfinite bookkeeping: per-step device scalars, settled on a
    # fixed step cadence INDEPENDENT of log_every (advisor r4: with
    # log_every=0 the divergence abort never fired and skip_pending
    # grew one device scalar per step for the whole run) and again at
    # log points. cum/consec persist across settle points.
    skip_pending: list = []
    skip_total = 0
    skip_consec = 0
    settle_cadence = min(log_every or 100, 100,
                         max_consecutive_skips or 10**9)

    def settle_skips():
        nonlocal skip_total, skip_consec
        for v in jax.device_get(skip_pending):
            if float(v) > 0:
                skip_total += 1
                skip_consec += 1
            else:
                skip_consec = 0
        skip_pending.clear()
        if max_consecutive_skips and skip_consec >= max_consecutive_skips:
            raise FloatingPointError(
                f"skip_nonfinite: {skip_consec} consecutive steps "
                f"skipped (>= {max_consecutive_skips}) — the run has "
                "diverged (every batch produces non-finite loss/grads); "
                "lower the LR or restore an earlier checkpoint instead "
                "of skipping forever")

    start = int(jax.device_get(state.step))
    for _ in range(start, num_steps):
        if (check_stop is not None and start % stop_sync == 0
                and check_stop()):
            # preemption (SIGTERM on TPU VMs): flush a checkpoint at
            # the CURRENT step so at most zero finished steps are lost,
            # instead of up to save_every (the reference-era behavior)
            preempted = True
            break
        batch = next(batches)
        state, metrics = step_fn(state, batch["image"], batch["label"])
        if "skipped_nonfinite" in metrics:
            skip_pending.append(metrics["skipped_nonfinite"])
            if len(skip_pending) >= settle_cadence:
                settle_skips()
        step = start = start + 1
        if log_every and (step % log_every == 0 or step == num_steps):
            settle_skips()
            host = {k: float(jax.device_get(v)) for k, v in metrics.items()}
            if "skipped_nonfinite" in metrics:
                host["skipped_nonfinite_total"] = float(skip_total)
            if not np.isfinite(host["loss"]) and not host.get(
                    "skipped_nonfinite"):
                # cfg.skip_nonfinite reports the bad loss but HELD the
                # state — that is a survivable event, not a crash; the
                # hard stop is for unguarded runs where the weights are
                # already poisoned.
                raise FloatingPointError(
                    f"non-finite loss at step {step}: {host['loss']}")
            logger.log(step, host)
        if eval_fn is not None and eval_every and step % eval_every == 0:
            eval_metrics = eval_fn(state)
            logger.log(step, {f"eval/{k}": v
                              for k, v in eval_metrics.items()})
            if keep_best and mgr is not None:
                # Multi-process: only the eval process has the metric,
                # but orbax saves are collective — broadcast the value
                # so every process reaches the same save decision.
                val = eval_metrics.get(keep_best)
                if val is None and eval_metrics and not keep_best_warned:
                    # a typo'd metric name would otherwise no-op for
                    # the whole run with no diagnostic
                    from absl import logging
                    logging.warning(
                        "keep_best=%r is not among the eval metrics %s "
                        "— no best checkpoint will be saved",
                        keep_best, sorted(eval_metrics))
                    keep_best_warned = True
                if jax.process_count() > 1:
                    from jax.experimental import multihost_utils

                    # broadcast the f64 as raw uint32 bits:
                    # broadcast_one_to_all routes through jnp arrays,
                    # which silently downcast f64→f32 while x64 is off
                    # — the recorded bar 0.9 came back 0.89999997
                    bits = np.frombuffer(
                        np.float64(np.nan if val is None else val)
                        .tobytes(), np.uint32)
                    bits = np.asarray(
                        multihost_utils.broadcast_one_to_all(bits))
                    val = float(np.frombuffer(bits.tobytes(),
                                              np.float64)[0])
                if val is not None and np.isfinite(val):
                    mgr.save_best(state, step=step, metric=float(val),
                                  name=keep_best)
        if mgr is not None:
            mgr.maybe_save(state, step=step)
    if mgr is not None:
        mgr.maybe_save(state, step=start, force=True)
        mgr.wait()
    logger.flush()
    settle_skips()
    host = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    if "skipped_nonfinite" in metrics:
        host["skipped_nonfinite_total"] = float(skip_total)
    host["preempted"] = float(preempted)
    return LoopResult(state=state, last_metrics=host)
