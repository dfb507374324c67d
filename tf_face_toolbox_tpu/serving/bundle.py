"""Deployment bundles: one-file serving artifacts.

The reference era's deployment hand-off was freeze_graph +
fold_batch_norms — collapse a train checkpoint plus its flag soup into
ONE self-contained artifact the serving side loads without knowing how
training was configured [TF1-IDIOM; SURVEY.md §2a checkpoint row]. The
rebuild's equivalent: ``cli.export`` restores a checkpoint, optionally
selects the EMA weights, runs static-int8 calibration ONCE, and writes
a single ``.npz`` holding every variable collection plus a JSON config
record (network, embedding dim, stem/head, input geometry, input norm,
quant mode, training step). ``cli.serve --bundle`` / ``cli.extract
--bundle`` then boot from the artifact alone:

- no flag bookkeeping between training and deployment (the #1 silent
  skew source: a daemon booted with the wrong --stem or --input_norm
  serves garbage embeddings that LOOK valid);
- no calibration shard at serving hosts — the frozen quant_stats ride
  in the bundle;
- the artifact is plain ``np.savez`` (portable, mmap-free, versioned),
  loadable from any language with an npz reader.

Format: flat ``collection/path/leaf → array`` keys (the same key space
as ``interop.port.save_variables_npz``) plus one ``__bundle_meta__``
key holding the JSON config. ``format_version`` gates forward
compatibility — readers refuse versions they don't know.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from tf_face_toolbox_tpu.interop.port import (
    flatten_variables,
    unflatten_variables,
)

META_KEY = "__bundle_meta__"
FORMAT_VERSION = 1

# Meta fields every bundle must carry (writers fill them; readers check).
REQUIRED_META = ("format_version", "network", "embedding_dim",
                 "image_size", "input_norm", "quant_mode")


def write_bundle(path: str, variables: dict, meta: dict[str, Any]) -> None:
    """Write variables + config as one .npz deployment artifact.

    ``meta`` must contain REQUIRED_META minus format_version (added
    here). A quant_mode of "static" requires the calibrated
    ``quant_stats`` collection to be present — refused otherwise, so a
    bundle can never promise int8 it cannot serve.
    """
    meta = dict(meta, format_version=FORMAT_VERSION)
    missing = [k for k in REQUIRED_META if k not in meta]
    if missing:
        raise ValueError(f"bundle meta is missing {missing}")
    if meta["quant_mode"] == "static" and "quant_stats" not in variables:
        raise ValueError(
            "quant_mode='static' bundle needs calibrated quant_stats "
            "(run the calibration pass before exporting)")
    flat = flatten_variables(variables)
    if META_KEY in flat:
        raise ValueError(f"variables tree collides with {META_KEY}")
    flat[META_KEY] = np.array(json.dumps(meta))
    np.savez(path, **flat)


def read_bundle(path: str) -> tuple[dict, dict[str, Any]]:
    """Load a bundle → (variables tree, meta dict). Refuses artifacts
    without a meta record (a plain variables_npz is not a bundle) and
    format versions this reader does not know."""
    with np.load(path) as data:
        files = set(data.files)
        if META_KEY not in files:
            raise ValueError(
                f"{path} has no {META_KEY} record — not a deployment "
                "bundle (for raw variable trees use --variables_npz)")
        meta = json.loads(str(data[META_KEY]))
        flat = {k: data[k] for k in files if k != META_KEY}
    version = meta.get("format_version")
    if version != FORMAT_VERSION:
        raise ValueError(f"bundle format_version {version} is not "
                         f"supported (reader knows {FORMAT_VERSION})")
    missing = [k for k in REQUIRED_META if k not in meta]
    if missing:
        raise ValueError(f"bundle meta is missing {missing}")
    return unflatten_variables(flat), meta


def network_from_meta(meta: dict[str, Any], *, dtype) -> Any:
    """Reconstruct the exact backbone a bundle was exported for.

    stem/head_variant are the RESOLVED module attributes recorded at
    export (post registry pins), so reconstruction never warns and can
    never drift from what the weights were trained with. ``dtype`` is
    the serving-side compute choice (params in the bundle are f32).
    """
    from tf_face_toolbox_tpu.models import create_network

    kwargs = {}
    for key in ("stem", "head_variant"):
        if meta.get(key) is not None:
            kwargs[key] = meta[key]
    quant = meta.get("quant_mode", "none")
    if quant and quant != "none":
        kwargs["quantized"] = quant
    return create_network(meta["network"],
                          embedding_dim=int(meta["embedding_dim"]),
                          dtype=dtype, **kwargs)
