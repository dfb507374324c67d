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

    # Persistent compile cache for EVERY CLI: remote-TPU cold compiles
    # run 10-90 s (the Pallas batched search: 90 s measured); cached
    # reruns are ~free. TFFT_COMPILE_CACHE overrides the location,
    # =0 disables.
    cache = os.environ.get(
        "TFFT_COMPILE_CACHE",
        os.path.expanduser("~/.cache/tf_face_toolbox_tpu/jax"))
    if cache and cache != "0":
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          0)


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
