"""Warm-start (fine-tune) initialization for training runs.

Rebuild of the reference era's pretrained-restore workflow: TF-1.x
toolboxes fine-tune by restoring a pretrained checkpoint into the new
graph while excluding the classification scope (the slim-style
``--checkpoint_path`` / ``--checkpoint_exclude_scopes`` idiom
[TF1-IDIOM]; SURVEY.md §2a checkpoint/resume row), because the
identity set — and therefore the softmax classifier — changes between
pretraining and fine-tuning.

Here the same contract is explicit: :func:`warm_start_state` grafts
backbone params and BN statistics from a source (a previous run's
``train_dir`` or an interop ``.npz`` from the TF1/Keras importers)
into a freshly initialized :class:`TrainState`, leaf by leaf, keeping

- the classifier fresh (new identity set),
- the optimizer state fresh (momentum from the old task is noise),
- step = 0 (LR schedule restarts, as a fine-tune run expects).

Leaves whose path or shape does not match are skipped loudly and
reported, so e.g. a source with a different ``embedding_dim`` restores
every conv/BN and skips only the head projection.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np

from tf_face_toolbox_tpu.train.state import TrainState


def graft_tree(dst: Any, src: Any, *, path: tuple = (),
               restored: list | None = None,
               skipped: list | None = None):
    """Copy ``src`` leaves into the structure of ``dst`` wherever the
    path exists in both AND the leaf shapes match; keep the ``dst``
    leaf otherwise. Returns (new_tree, restored_paths, skipped_paths).

    Source leaves are materialized to host numpy (restore_raw already
    yields numpy; an .npz or in-memory source may hold device arrays,
    and a committed array fed into the sharded train step would
    conflict with the step's own placement — numpy leaves place
    exactly like a fresh init's).
    """
    restored = [] if restored is None else restored
    skipped = [] if skipped is None else skipped
    if isinstance(dst, Mapping):
        src_map = src if isinstance(src, Mapping) else {}
        out = {}
        for k, v in dst.items():
            out[k], _, _ = graft_tree(
                v, src_map.get(k), path=path + (k,),
                restored=restored, skipped=skipped)
        return out, restored, skipped
    name = "/".join(str(p) for p in path)
    if src is None:
        skipped.append(name)
        return dst, restored, skipped
    src_arr = np.asarray(jax.device_get(src))
    if src_arr.shape != getattr(dst, "shape", None):
        skipped.append(f"{name} (shape {src_arr.shape} != "
                       f"{getattr(dst, 'shape', None)})")
        return dst, restored, skipped
    restored.append(name)
    return src_arr.astype(dst.dtype), restored, skipped


def load_pretrained_variables(source: str, *,
                              use_ema: bool = False) -> dict:
    """``source`` → ``{"params": ..., "batch_stats": ...}``.

    Two source kinds, matching what the repo's own tools emit:
    - a train directory (orbax checkpoint, restored RAW via
      ``CheckpointManager.restore_raw`` — leaves keep the checkpoint's
      own shapes, so an architecture delta vs the new run is a
      graft-time skip, not an orbax restore error; and numpy leaves
      restore identically on every process of a multi-host run), or
    - a flat ``.npz`` from ``interop.port.save_variables_npz`` (the
      TF1 / Keras importer output).
    """
    if source.endswith(".npz"):
        from tf_face_toolbox_tpu.interop.port import load_variables_npz

        if use_ema:
            raise ValueError(
                ".npz sources hold one weight set; --finetune_use_ema "
                "only applies to train-dir sources")
        return load_variables_npz(source)
    from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

    raw = CheckpointManager(source).restore_raw()
    params = raw.get("params")
    if use_ema:
        params = raw.get("ema_params")
        if params is None or not jax.tree.leaves(params):
            raise ValueError(
                "--finetune_use_ema: the source checkpoint has no EMA")
    return {"params": params, "batch_stats": raw.get("batch_stats", {})}


def warm_start_state(state: TrainState, variables: dict,
                     *, log=None) -> TrainState:
    """Graft pretrained ``variables`` into a fresh ``state``.

    EMA (when the new run trains with it) restarts FROM the grafted
    weights — the moving average of the fine-tune run should track the
    fine-tuned model, not average in the random init it replaced.
    """
    params, restored, skipped = graft_tree(
        state.params, variables.get("params", {}))
    batch_stats, _, _ = graft_tree(
        state.batch_stats, variables.get("batch_stats", {}),
        restored=restored, skipped=skipped)
    if not restored:
        raise ValueError(
            "warm start restored nothing: the source does not look "
            f"like this network's tree (skipped: {skipped[:5]}...)")
    if log is not None:
        log("warm start: %d leaves restored, %d kept fresh%s",
            len(restored), len(skipped),
            (" (" + ", ".join(skipped[:8]) + ")") if skipped else "")
    ema = (jax.tree.map(np.copy, params)
           if state.ema_params is not None else None)
    return state.replace(params=params, batch_stats=batch_stats,
                         ema_params=ema)
