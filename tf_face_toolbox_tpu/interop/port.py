"""Bidirectional weight porter: flax variables <-> Keras mirror model.

Mapping is mechanical because the mirror names every weighted Keras
layer with its flax module path (see keras_mirror.py). Layouts match
by construction (NHWC/HWIO, Dense (in, out)), so porting is pure
assignment — no transposes.

Porting is *total*: both directions assert that every flax leaf was
consumed/produced, so any architectural drift between the twins fails
loudly instead of silently zero-filling a layer.

flax leaf <-> Keras weight correspondence:

    ConvBN path P:
      params[P]["kernel"]                 <-> Conv2D(name=P).kernel
      params[P]["BatchNorm_0"]["scale"]   <-> BN(name=P+".BatchNorm_0").gamma
      params[P]["BatchNorm_0"]["bias"]    <-> ... .beta
      batch_stats[P]["BatchNorm_0"]["mean"] <-> ... .moving_mean
      batch_stats[P]["BatchNorm_0"]["var"]  <-> ... .moving_variance
    Dense path P: params[P]["kernel"/"bias"] <-> Dense(name=P) weights
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _get(tree: dict, path: list[str]):
    for key in path:
        tree = tree[key]
    return tree


def _set(tree: dict, path: list[str], value) -> None:
    for key in path[:-1]:
        tree = tree[key]
    assert path[-1] in tree, f"no flax leaf at {'/'.join(path)}"
    tree[path[-1]] = value


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _leaf_paths(tree: dict, prefix=()) -> list[tuple[str, ...]]:
    out = []
    for key, value in tree.items():
        if isinstance(value, dict):
            out.extend(_leaf_paths(value, prefix + (key,)))
        else:
            out.append(prefix + (key,))
    return out


def _weighted_layers(model):
    from tensorflow import keras

    for layer in model.layers:
        if isinstance(layer, keras.layers.Conv2D):
            yield "conv", layer
        elif isinstance(layer, keras.layers.BatchNormalization):
            yield "bn", layer
        elif isinstance(layer, keras.layers.Dense):
            yield "dense", layer


def _flax_paths_for(kind: str, layer_name: str):
    """Keras layer name -> the flax (params_paths, stats_paths) it owns."""
    path = layer_name.split(".")
    if kind == "conv":
        return [path + ["kernel"]], []
    if kind == "bn":
        return ([path + ["scale"], path + ["bias"]],
                [path + ["mean"], path + ["var"]])
    if kind == "dense":
        return [path + ["kernel"], path + ["bias"]], []
    raise ValueError(kind)


def jax_to_keras(variables: dict, model) -> None:
    """Copy flax ``variables`` (params + batch_stats) into the mirror
    ``model`` in place; asserts every flax leaf was consumed."""
    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables.get("batch_stats", {}))
    remaining = {("params",) + p for p in _leaf_paths(params)}
    remaining |= {("stats",) + p for p in _leaf_paths(stats)}

    def take(tree, tag, path):
        value = np.asarray(_get(tree, path), np.float32)
        key = (tag, *path)
        assert key in remaining, f"flax leaf reused/missing: {key}"
        remaining.discard(key)
        return value

    for kind, layer in _weighted_layers(model):
        p_paths, s_paths = _flax_paths_for(kind, layer.name)
        weights = [take(params, "params", p) for p in p_paths]
        weights += [take(stats, "stats", p) for p in s_paths]
        assert len(weights) == len(layer.get_weights()), layer.name
        layer.set_weights(weights)

    assert not remaining, (
        f"{len(remaining)} flax leaves not ported, e.g. "
        f"{sorted(remaining)[:5]}")


def keras_to_jax(model, variables_template: dict) -> dict:
    """Read the mirror ``model``'s weights into a fresh variables tree
    shaped like ``variables_template``; asserts every leaf is written."""
    params = _to_mutable(variables_template["params"])
    stats = _to_mutable(variables_template.get("batch_stats", {}))
    pending = {("params",) + p for p in _leaf_paths(params)}
    pending |= {("stats",) + p for p in _leaf_paths(stats)}

    def put(tree, tag, path, value):
        old = _get(tree, path)
        assert tuple(value.shape) == tuple(np.shape(old)), (
            f"{'/'.join(path)}: keras {value.shape} vs flax "
            f"{np.shape(old)}")
        _set(tree, path, value.astype(np.asarray(old).dtype))
        pending.discard((tag, *path))

    for kind, layer in _weighted_layers(model):
        p_paths, s_paths = _flax_paths_for(kind, layer.name)
        weights = [np.asarray(w) for w in layer.get_weights()]
        assert len(weights) == len(p_paths) + len(s_paths), layer.name
        for path, w in zip(p_paths, weights[:len(p_paths)]):
            put(params, "params", path, w)
        for path, w in zip(s_paths, weights[len(p_paths):]):
            put(stats, "stats", path, w)

    assert not pending, (
        f"{len(pending)} flax leaves not filled, e.g. "
        f"{sorted(pending)[:5]}")
    out: dict[str, Any] = {"params": params}
    if "batch_stats" in variables_template:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# portable on-disk form for ported variables
# ---------------------------------------------------------------------------

def flatten_variables(variables: dict) -> dict[str, "np.ndarray"]:
    """Nested variables tree -> {"collection/a/b/leaf": array} flat dict
    (the .npz key space used by save/load_variables_npz)."""
    flat = {}
    for collection, tree in variables.items():
        for path in _leaf_paths(_to_mutable(tree)):
            flat["/".join((collection,) + path)] = np.asarray(
                _get(tree, list(path)))
    return flat


def unflatten_variables(flat: dict) -> dict:
    out: dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)
    return out


def save_variables_npz(path: str, variables: dict) -> None:
    """Write a ported variables tree as a single portable .npz — the
    hand-off format of cli.import_keras, served directly by
    cli.extract --variables_npz."""
    np.savez(path, **flatten_variables(variables))


def load_variables_npz(path: str) -> dict:
    with np.load(path) as data:
        return unflatten_variables({k: data[k] for k in data.files})
