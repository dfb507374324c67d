"""Checkpoint save / restore / resume.

Rebuilds the reference's ``tf.train.Saver`` periodic save + resume-from-
latest [TF1-IDIOM, SURVEY.md §5] with Orbax: the full TrainState pytree
(params, BN stats, classifier shard, optimizer state, step, RNG) is
saved atomically, so resume is bit-exact — step counter, momentum, and
augmentation RNG all continue where they left off.

Orbax writes per-array via tensorstore, which on multi-host TPU pods
saves each host's shards in parallel (the TPU-native replacement for the
reference's single-process tensor-bundle writer).
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from tf_face_toolbox_tpu.train.state import TrainState


class CheckpointManager:
    """Thin wrapper: periodic save, latest-checkpoint resume, GC of old."""

    def __init__(self, directory: str, *, save_every: int = 1000,
                 keep: int = 5):
        self._dir = os.path.abspath(directory)
        self.save_every = save_every
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=True)
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def maybe_save(self, state: TrainState, *, step: int | None = None,
                   force: bool = False) -> bool:
        """Save if the step hits the cadence (reference: Saver every-N).

        Pass the host-side ``step`` counter when you have one:
        ``device_get(state.step)`` blocks on the in-flight train step and
        would serialize the async-dispatch pipeline every iteration.
        """
        if step is None:
            step = int(jax.device_get(state.step))
        if not force and (self.save_every <= 0 or step % self.save_every):
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        return True

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        """Every retained checkpoint step, ascending (the export CLI's
        --average_last averages the tail of this list)."""
        return sorted(self._mgr.all_steps())

    def refresh(self) -> None:
        """Drop the cached step list. Orbax caches the directory's
        steps at manager construction; a watcher polling a train dir
        that ANOTHER process writes to (serving hot reload) must
        refresh before latest_step() reflects new checkpoints."""
        self._mgr.reload()

    def restore(self, target: TrainState, step: int | None = None,
                *, mesh=None, pspecs=None) -> TrainState:
        """Restore into the structure/shardings of ``target``.

        ``target`` is a freshly-initialized state (create_train_state):
        orbax uses its pytree structure, dtypes, and shardings as the
        restore spec — so a checkpoint written on one mesh restores onto
        another as long as shapes match.

        Forward compatibility: a TrainState field the CHECKPOINT never
        saved (it predates the field — e.g. ``head_state``, added r3)
        is dropped from the restore template when the target holds None
        there, and filled back with None afterwards — otherwise orbax
        refuses the structure mismatch and every pre-upgrade checkpoint
        becomes unrestorable.

        Multi-process: pass ``mesh`` + ``pspecs`` (trainer.state_pspecs)
        so orbax restores each leaf DIRECTLY as a global array with its
        canonical sharding. A fresh ``target``'s leaves are process-local
        host arrays, and re-sharding them after the fact would need a
        cross-host device transfer the CPU/TPU backends don't do outside
        DCN configs (caught by the two-process durability test).
        """
        import dataclasses

        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self._dir}")
        meta = self.tree_metadata(step) or {}
        saved_fields = {k.split("'")[1] for k in meta}
        dropped = [f.name for f in dataclasses.fields(target)
                   if saved_fields and f.name not in saved_fields
                   and getattr(target, f.name) is None]
        template = target
        if dropped:
            template = {f.name: getattr(target, f.name)
                        for f in dataclasses.fields(target)
                        if f.name not in dropped}
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            spec_tree = pspecs
            if dropped:
                spec_tree = {f.name: getattr(pspecs, f.name)
                             for f in dataclasses.fields(pspecs)
                             if f.name not in dropped}
            shardings = jax.tree.map(
                lambda spec: NamedSharding(mesh, spec), spec_tree,
                is_leaf=lambda x: isinstance(x, P))
            abstract = jax.tree.map(
                lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                                  sharding=s),
                abstract, shardings)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))
        if dropped:
            restored = type(target)(
                **restored, **{name: None for name in dropped})
        return restored

    def restore_raw(self, step: int | None = None) -> dict:
        """Restore the checkpoint AS SAVED, to host numpy, with no
        template: leaves come back with the checkpoint's own shapes and
        dtypes regardless of the caller's config, mesh, or process
        topology. The warm-start loader (train.finetune) needs exactly
        this — shape mismatches are graft_tree's job to skip, and numpy
        leaves carry no device placement to conflict with multi-process
        runs (a template restore targets an addressable device, which
        global device 0 is not on every host)."""
        import numpy as np

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self._dir}")
        path = os.path.join(self._dir, str(step), "default")
        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda m: (ocp.RestoreArgs(restore_type=np.ndarray)
                       if m is not None else ocp.RestoreArgs()),
            tree, is_leaf=lambda x: x is None)
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args))

    def tree_metadata(self, step: int | None = None) -> dict | None:
        """The checkpoint's _METADATA tree, read straight off disk (a
        fresh orbax manager exposes no item metadata before a restore).
        None when no checkpoint exists."""
        import json
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        path = os.path.join(self._dir, str(step), "default", "_METADATA")
        with open(path) as f:
            return json.load(f)["tree_metadata"]

    def global_shapes(self, step: int | None = None) -> dict:
        """GLOBAL (unsharded) shape of every saved array leaf, keyed
        like ``tree_metadata`` ("('classifier',)" → (C, D)).

        ``tree_metadata``'s ``write_shape`` is the PER-SHARD write
        chunk: a classifier class-sharded over 8 devices records 1/8
        of its rows there. Any consumer recovering array SIZES from a
        checkpoint (pretrained.load_variables inferring num_classes)
        must read these instead — caught by a checkpoint trained with
        num_classes divisible by the device count, whose serving-time
        restore rebuilt a 1/8-width classifier template."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self._dir}")
        path = os.path.join(self._dir, str(step), "default")
        tree = ocp.PyTreeCheckpointer().metadata(path).item_metadata
        out: dict = {}

        def rec(prefix, node):
            if hasattr(node, "keys"):        # dict / orbax tree-metadata
                for k in node.keys():
                    rec(prefix + (str(k),), node[k])
            elif node is not None and hasattr(node, "shape"):
                out[str(prefix)] = tuple(node.shape)

        rec((), tree)
        return out

    def has_ema(self, meta: dict | None = None) -> bool:
        """True if the checkpoint holds real EMA arrays (a None
        ema_params still appears in the metadata with value_type None).
        Pass an already-loaded ``tree_metadata()`` to avoid re-parsing."""
        meta = self.tree_metadata() if meta is None else meta
        if not meta:
            return False
        return any(
            k.startswith("('ema_params'") and
            v.get("value_metadata", {}).get("value_type") != "None"
            for k, v in meta.items())

    def head_state_children(self, meta: dict | None = None) -> set[str]:
        """Names of the checkpoint's ``TrainState.head_state`` entries
        (empty set when it was None). Restore templates must recreate
        the same children ("adaface" EMA stats / "centers" table) or
        orbax refuses the structure mismatch — pretrained.load_variables
        and the resume guard in train/loop.py key off this."""
        meta = self.tree_metadata() if meta is None else meta
        if not meta:
            return set()
        return {k.split("'")[3] for k in meta
                if k.startswith("('head_state', ")}

    # ---- best-checkpoint tracking (--keep_best) -------------------
    # Periodic retention is a ring buffer (max_to_keep): by the time a
    # long run ends, the checkpoint with the best eval metric is long
    # garbage-collected. ``save_best`` keeps it alive in ``<dir>/best``
    # — itself a normal orbax dir, so every downstream consumer
    # (cli.export/extract/serve --checkpoint_dir=<run>/best) reads it
    # with zero new code. The bar persists in ``<dir>/best_step.json``
    # and is reloaded on resume, so a restarted run never demotes an
    # earlier, better checkpoint. Higher metric = better (accuracy
    # convention; negate a loss-like metric at the call site).

    _BEST_JSON = "best_step.json"

    def _best_manager(self):
        if getattr(self, "_best_mgr", None) is None:
            options = ocp.CheckpointManagerOptions(
                max_to_keep=1, create=True,
                enable_async_checkpointing=True)
            self._best_mgr = ocp.CheckpointManager(
                os.path.join(self._dir, "best"), options=options)
        return self._best_mgr

    def best_info(self) -> dict | None:
        """{"step", "metric", "name"} of the best save, or None."""
        import json

        path = os.path.join(self._dir, self._BEST_JSON)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def save_best(self, state: TrainState, *, step: int, metric: float,
                  name: str = "metric") -> bool:
        """Save to ``<dir>/best`` iff ``metric`` beats the stored bar.

        Multi-process: the save is a collective, so the save/skip
        decision must be uniform — process 0's reading of the bar is
        broadcast (a per-process filesystem read of the json could
        diverge under attribute caching and deadlock the collective);
        only process 0 writes the json record.
        """
        import json

        best = self.best_info()
        improved = best is None or metric > best["metric"]
        if jax.process_count() > 1:
            import numpy as np
            from jax.experimental import multihost_utils

            improved = bool(np.asarray(
                multihost_utils.broadcast_one_to_all(
                    np.asarray(improved))))
        if not improved:
            return False
        self._best_manager().save(
            step, args=ocp.args.StandardSave(state))
        # The bar is only durable once the checkpoint is: block on the
        # async save BEFORE recording it, or a crash in the window
        # would leave a bar with no checkpoint behind it, permanently
        # suppressing future best saves. Best saves are eval-cadence
        # rare; the sync wait costs nothing that matters.
        self._best_manager().wait_until_finished()
        if jax.process_index() == 0:
            path = os.path.join(self._dir, self._BEST_JSON)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"step": int(step), "metric": float(metric),
                           "name": name}, f)
            os.replace(tmp, path)
        return True

    def wait(self):
        """Block until async saves are durable (call before exit)."""
        self._mgr.wait_until_finished()
        if getattr(self, "_best_mgr", None) is not None:
            self._best_mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
        if getattr(self, "_best_mgr", None) is not None:
            self._best_mgr.close()


_EMB_BIN_MAGIC = b"TFFB"


def save_embeddings(path: str, embeddings, names=None) -> None:
    """Write extracted features to disk; format routed by extension.

    Rebuild of the reference's feature dump (ref: upstream features.py
    output [UPSTREAM-K] — the era wrote .npy/.mat/binary for offline
    MATLAB/numpy verification):

    - ``.npy`` (default) / ``.npz`` (when ``names`` is given)
    - ``.mat`` — MATLAB v5 via scipy.io, variables ``embeddings``
      (+ ``names``): drop-in for MATLAB-side LFW/megaface scripts
    - ``.bin`` — little-endian raw: 4-byte magic ``TFFB``, int32 n,
      int32 d, then n*d float32 row-major (names not stored)
    """
    import numpy as np
    embeddings = np.asarray(embeddings)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".mat":
        from scipy.io import savemat
        data = {"embeddings": embeddings}
        if names is not None:
            data["names"] = np.asarray(names)
        savemat(path, data)
    elif ext == ".bin":
        n, d = embeddings.shape
        with open(path, "wb") as f:
            f.write(_EMB_BIN_MAGIC)
            f.write(np.asarray([n, d], "<i4").tobytes())
            f.write(np.ascontiguousarray(embeddings, "<f4").tobytes())
    elif ext == ".npz" or names is not None:
        data = {"embeddings": embeddings}
        if names is not None:
            data["names"] = np.asarray(names)
        np.savez(path, **data)
    else:
        np.save(path, embeddings)


def load_embeddings(path: str):
    """Inverse of :func:`save_embeddings` → (embeddings, names|None)."""
    import numpy as np
    ext = os.path.splitext(path)[1].lower()
    if ext == ".mat":
        from scipy.io import loadmat
        data = loadmat(path)
        names = data.get("names")
        if names is not None:
            names = np.asarray([str(s).strip() for s in names.ravel()])
        return np.asarray(data["embeddings"]), names
    if ext == ".bin":
        with open(path, "rb") as f:
            magic = f.read(4)
            if magic != _EMB_BIN_MAGIC:
                raise ValueError(
                    f"{path}: not a TFFB embedding file (magic {magic!r})")
            n, d = np.frombuffer(f.read(8), "<i4")
            emb = np.frombuffer(f.read(int(n) * int(d) * 4), "<f4")
            if emb.size != n * d:
                raise ValueError(f"{path}: truncated ({emb.size} of "
                                 f"{n * d} values)")
        return emb.reshape(int(n), int(d)).copy(), None
    data = np.load(path, allow_pickle=False)
    if hasattr(data, "files"):
        names = data["names"] if "names" in data.files else None
        return data["embeddings"], names
    return data, None
