"""Import a TF1 (`tf.train.Saver`) checkpoint — the reference's native
training output [TF1-IDIOM] — into a portable .npz served by
``cli.extract --variables_npz``.

    python -m tf_face_toolbox_tpu.cli.import_tf1 \
        --checkpoint=/models/face_r50.ckpt-90000 \
        --output=/models/r50.npz --network=resnet_v1_50 --stem=face

Variable names are mapped mechanically from the flax tree by
``interop.tf1.slim_name_map`` (slim-era scoping); repo-specific scope
names are handled with ``--scope`` / ``--head_scope`` and, for
point-wise quirks, ``--name_map_json`` ({flax_flat_key: tf1_name}).
``--use_ema`` prefers each parameter's ExponentialMovingAverage shadow,
the weights the era's extract scripts actually served.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint", None,
                    "TF1 checkpoint prefix (e.g. model.ckpt-90000)")
flags.DEFINE_string("output", None, "output .npz variables path")
flags.DEFINE_string("network", "resnet_v1_50", "backbone name")
flags.DEFINE_enum("stem", "face", ["face", "imagenet", "space2depth"],
                  "backbone stem matching the checkpoint")
flags.DEFINE_enum("head", "gap", ["gap", "flatten"],
                  "embedding head variant")
flags.DEFINE_integer("embedding_dim", 512, "embedding size")
flags.DEFINE_integer("image_size", 112, "input size for shape checks")
flags.DEFINE_string("scope", "", "outermost variable scope "
                    "(default: the network name, slim convention)")
flags.DEFINE_string("head_scope", "embedding",
                    "embedding layer's variable scope upstream")
flags.DEFINE_string("name_map_json", "",
                    "JSON file of {flax_flat_key: tf1_name} overrides")
flags.DEFINE_bool("use_ema", False,
                  "prefer <var>/ExponentialMovingAverage shadows")
flags.DEFINE_bool("skip_missing", False,
                  "keep init values for unmatched leaves (prints them)")
flags.mark_flag_as_required("checkpoint")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.interop.port import save_variables_npz
    from tf_face_toolbox_tpu.interop.tf1 import (
        import_tf1_checkpoint,
        network_stage_sizes,
        slim_name_map,
    )
    from tf_face_toolbox_tpu.models import create_network, init_variables

    net = create_network(FLAGS.network, embedding_dim=FLAGS.embedding_dim,
                         dtype=jnp.float32, stem=FLAGS.stem,
                         head_variant=FLAGS.head)
    template = init_variables(
        net, jax.random.key(0),
        (1, FLAGS.image_size, FLAGS.image_size, 3))
    overrides = None
    if FLAGS.name_map_json:
        with open(FLAGS.name_map_json) as f:
            overrides = json.load(f)
    name_map = slim_name_map(
        template, stage_sizes=network_stage_sizes(FLAGS.network),
        scope=FLAGS.scope or FLAGS.network,
        head_scope=FLAGS.head_scope, overrides=overrides)
    variables, report = import_tf1_checkpoint(
        FLAGS.checkpoint, template, name_map,
        use_ema=FLAGS.use_ema, skip_missing=FLAGS.skip_missing)
    save_variables_npz(FLAGS.output, variables)
    print(f"imported {report['imported']} variables "
          f"({report['ema_used']} from EMA shadows) into {FLAGS.output}")
    for key in ("missing", "unused"):
        if report[key]:
            print(f"{key} ({len(report[key])}): "
                  + ", ".join(report[key][:8])
                  + (" ..." if len(report[key]) > 8 else ""))


if __name__ == "__main__":
    app.run(main)
