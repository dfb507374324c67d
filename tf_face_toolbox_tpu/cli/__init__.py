"""CLI entry points (the reference's tf.app.flags surface, rebuilt on absl).

    python -m tf_face_toolbox_tpu.cli.pack      # dataset packer
    python -m tf_face_toolbox_tpu.cli.train     # training
    python -m tf_face_toolbox_tpu.cli.extract   # feature extraction
    python -m tf_face_toolbox_tpu.cli.eval_lfw  # pair verification
"""

import os


def setup_platform() -> None:
    """Honor TFFT_PLATFORM=cpu|tpu for deterministic backend selection.

    On this image the JAX_PLATFORMS env var is unreliable (a site hook
    clears it), so subprocess-driven tests set TFFT_PLATFORM and every
    CLI applies it through jax.config before first backend use.
    """
    plat = os.environ.get("TFFT_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms",
                          "cpu" if plat == "cpu" else None)


def json_sanitize(value):
    """Replace non-finite floats with None (JSON null), recursively —
    json.dumps would otherwise emit bare NaN/Infinity tokens that
    strict RFC-8259 parsers (jq, JSON.parse) reject. Used by the eval
    CLIs whose reports can contain NaN (e.g. TAR at a FAR finer than
    the pair set resolves, CMC with zero rankable probes)."""
    import math

    if isinstance(value, dict):
        return {k: json_sanitize(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [json_sanitize(v) for v in value]
    if isinstance(value, float) and not math.isfinite(value):
        return None
    return value
