"""Import an MXNet/InsightFace .rec face dataset into FaceShard.

The InsightFace distributions of MS1M/Glint360K/CASIA ship as
``train.rec``/``train.idx``; this is the migration path for users
arriving from that ecosystem (the .rec analogue of
``cli.convert_tfrecord`` for the reference's TFRecords):

    python -m tf_face_toolbox_tpu.cli.import_rec \
        --rec=/data/faces_emore/train.rec \
        --output=/data/train.faceshard

Identities are re-labeled to dense 0..K-1 (what --num_classes expects);
the original→dense mapping lands in <output>.labels.json. Pass
--norelabel to keep source ids verbatim.
"""

from __future__ import annotations

from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("rec", None, "train.rec path (the .idx is not "
                    "needed — records are read sequentially)")
flags.DEFINE_string("output", None, "output .faceshard path")
flags.DEFINE_bool("relabel", True,
                  "map identities to dense 0..K-1 in first-seen order "
                  "(mapping written to <output>.labels.json)")
flags.mark_flag_as_required("rec")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.data.recordio import convert_rec_to_faceshard

    n, k = convert_rec_to_faceshard(
        FLAGS.rec, FLAGS.output, relabel=FLAGS.relabel,
        log_every=100_000, log=logging.info)
    print(f"imported {n} images / {k} identities into {FLAGS.output}")


if __name__ == "__main__":
    app.run(main)
