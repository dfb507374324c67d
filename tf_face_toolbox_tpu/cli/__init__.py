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
