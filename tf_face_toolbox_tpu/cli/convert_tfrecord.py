"""Migrate TFRecord face datasets (the reference's format) to FaceShard.

    python -m tf_face_toolbox_tpu.cli.convert_tfrecord \
        --tfrecords=/data/train-00000,/data/train-00001 \
        --output=/data/train.faceshard \
        --image_key=image/encoded --label_key=image/label
"""

from __future__ import annotations

from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_list("tfrecords", None, "comma-separated TFRecord paths")
flags.DEFINE_string("output", None, "output .faceshard path")
flags.DEFINE_string("image_key", "image/encoded",
                    "Example feature holding the encoded image bytes")
flags.DEFINE_string("label_key", "image/label",
                    "Example feature holding the int identity label")
flags.mark_flag_as_required("tfrecords")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.data.tfrecord import (
        convert_tfrecords_to_faceshard)

    n = convert_tfrecords_to_faceshard(
        list(FLAGS.tfrecords), FLAGS.output,
        image_key=FLAGS.image_key, label_key=FLAGS.label_key)
    print(f"converted {n} records into {FLAGS.output}")


if __name__ == "__main__":
    app.run(main)
