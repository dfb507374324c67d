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

    for item in it:
        out = dict(item)
        for key in ("image", "label"):
            arr = np.asarray(item[key])
            sharding = NamedSharding(
                mesh, P(*( [(DATA_AXIS, MODEL_AXIS)] +
                           [None] * (arr.ndim - 1) )))
            out[key] = jax.make_array_from_process_local_data(
                sharding, arr)
        yield out


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"data-parallel size {n}")
    return global_batch // n
