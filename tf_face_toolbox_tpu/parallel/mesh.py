"""Mesh construction and axis conventions.

Owning module for device-mesh topology (SURVEY.md §2d requires this to
be "a named component ... not an implicit detail").

Axis names:
- ``data``:  data parallelism — batches shard here; gradients psum here.
             Maps onto ICI within a slice (XLA lowers the psum to an
             ICI all-reduce), replacing the reference's on-host tower
             gradient averaging [TF1-IDIOM].
- ``model``: identity/class sharding for the margin-softmax head
             (Partial-FC-style TP — SURVEY.md §2c). Size 1 unless the
             identity count makes the (D, C) classifier worth sharding.

Use ``create_mesh()`` for the common 1D data mesh, or pass explicit
sizes for dp×tp. Mesh axes are laid out so `data` is the fastest-varying
hardware dimension — neighbor chips on the ICI ring exchange gradients.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: int | None = None, model: int = 1,
                devices: list | None = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis (pure DP) — the rebuild of
    the reference's `num_gpus` flag [TF1-IDIOM].
    """
    devs = devices if devices is not None else jax.devices()
    if data is None:
        if len(devs) % model:
            raise ValueError(f"{len(devs)} devices not divisible by model={model}")
        data = len(devs) // model
    if data * model > len(devs):
        raise ValueError(
            f"mesh ({data}x{model}) needs {data * model} devices, "
            f"have {len(devs)}")
    grid = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def create_multislice_mesh(model: int = 1, slices: int | None = None,
                           devices: list | None = None,
                           slice_ids: list[int] | None = None) -> Mesh:
    """Multi-slice (data, model) mesh with slice-major data ordering.

    Multi-slice pods connect chips WITHIN a slice over ICI and slices
    over DCN (much lower bandwidth). The trainer's collectives are
    unchanged — one logical ``pmean`` over `data` — but the device
    order here puts each slice's chips contiguous along the data axis,
    which is what lets XLA decompose the all-reduce hierarchically:
    reduce-scatter/all-gather on ICI inside each slice, one small
    cross-slice exchange on DCN (SURVEY.md §2d "DCN collectives for
    multi-slice"). Single-slice it degenerates to :func:`create_mesh`.

    ``slices``/``slice_ids``: explicit slice count / per-device slice
    assignment — used on backends whose devices don't expose
    ``slice_index`` (CPU tests) and to validate grouping logic.
    """
    devs = list(devices if devices is not None else jax.devices())
    if slice_ids is None:
        slice_ids = [getattr(d, "slice_index", None) or 0 for d in devs]
    if len(slice_ids) != len(devs):
        raise ValueError("slice_ids must match devices")
    by_slice: dict[int, list] = {}
    for d, s in zip(devs, slice_ids):
        by_slice.setdefault(s, []).append(d)
    n_slices = slices or len(by_slice)
    if len(by_slice) == 1 and n_slices > 1:
        # virtual testing: split the flat device list into equal groups
        if len(devs) % n_slices:
            raise ValueError(
                f"{len(devs)} devices not divisible into "
                f"{n_slices} slices")
        per = len(devs) // n_slices
        by_slice = {i: devs[i * per:(i + 1) * per]
                    for i in range(n_slices)}
    if len(by_slice) != n_slices:
        raise ValueError(
            f"found {len(by_slice)} slices, expected {n_slices}")
    sizes = {len(v) for v in by_slice.values()}
    if len(sizes) != 1:
        raise ValueError(f"uneven slices: {sorted(by_slice)}")
    per = sizes.pop()
    if per % model:
        raise ValueError(
            f"{per} chips/slice not divisible by model={model}; the "
            "model axis must stay inside one slice (its all_gather/psum "
            "run per-sample — keep them on ICI)")
    ordered = [d for s in sorted(by_slice) for d in by_slice[s]]
    grid = np.asarray(ordered).reshape(n_slices * (per // model), model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over `data`; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def class_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (C, D) classifier over classes on the `model` axis."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def globalize_host_batches(it, mesh: Mesh):
    """Multi-host adapter: assemble per-process local batches into global
    jax.Arrays sharded over the mesh's batch axes.

    Each process's iterator yields its own (global/num_hosts, ...) numpy
    shard; ``jax.make_array_from_process_local_data`` stitches them into
    the single global array the jitted train step expects. On one
    process this is pass-through-equivalent (still returns committed
    device arrays with the right sharding).
    """
    import numpy as np

    def globalize(value):
        if isinstance(value, tuple):  # e.g. the DCT path's (coef, qtab)
            return tuple(globalize(v) for v in value)
        arr = np.asarray(value)
        sharding = NamedSharding(
            mesh, P(*( [(DATA_AXIS, MODEL_AXIS)] +
                       [None] * (arr.ndim - 1) )))
        return jax.make_array_from_process_local_data(sharding, arr)

    for item in it:
        out = dict(item)
        for key in ("image", "label"):
            out[key] = globalize(item[key])
        yield out


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"data-parallel size {n}")
    return global_batch // n
