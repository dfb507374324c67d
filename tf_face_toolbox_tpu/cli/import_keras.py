"""Import a TF/Keras checkpoint into the JAX framework.

The migration entry point for reference-era users: load a Keras model
file (.keras / .h5) whose architecture matches one of our backbones —
e.g. a model built with ``interop.build_keras_resnet``, or the
reference's own network re-saved through Keras — port every weight
(incl. BatchNorm moving statistics) into a flax variables tree, and
write a portable .npz that ``cli.extract --variables_npz`` serves
directly:

    python -m tf_face_toolbox_tpu.cli.import_keras \
        --keras_model=/models/face_r50.keras --output=/models/r50.npz \
        --network=resnet_v1_50 --stem=face
    python -m tf_face_toolbox_tpu.cli.extract \
        --variables_npz=/models/r50.npz --data=... --output=...

The port is total-consumption checked: any architecture drift between
the Keras file and the named backbone fails loudly with the missing
layer paths (interop/port.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_string("keras_model", None, ".keras/.h5 model file")
flags.DEFINE_string("output", None, "output .npz variables path")
flags.DEFINE_string("network", "resnet_v1_50", "backbone name")
flags.DEFINE_enum("stem", "face", ["face", "imagenet", "space2depth"],
                  "backbone stem matching the Keras model")
flags.DEFINE_enum("head", "gap", ["gap", "flatten"],
                  "embedding head variant")
flags.DEFINE_integer("embedding_dim", 512, "embedding size")
flags.DEFINE_integer("image_size", 112, "input size for shape checks")
flags.mark_flag_as_required("keras_model")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()
    import tensorflow as tf

    from tf_face_toolbox_tpu.interop.port import (
        keras_to_jax,
        save_variables_npz,
    )
    from tf_face_toolbox_tpu.models import create_network, init_variables

    model = tf.keras.models.load_model(FLAGS.keras_model, compile=False)
    net = create_network(FLAGS.network, embedding_dim=FLAGS.embedding_dim,
                         dtype=jnp.float32, stem=FLAGS.stem,
                         head_variant=FLAGS.head)
    template = init_variables(
        net, jax.random.key(0),
        (1, FLAGS.image_size, FLAGS.image_size, 3))
    variables = keras_to_jax(model, template)
    save_variables_npz(FLAGS.output, variables)
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"imported {n:,} weights from {FLAGS.keras_model} "
          f"into {FLAGS.output}")


if __name__ == "__main__":
    app.run(main)
