"""Import an InsightFace verification .bin (lfw/cfp_fp/agedb_30).

Produces a FaceShard plus an index-format pairs file, so the standard
extract → eval chain runs unchanged (SURVEY.md §3.2-3.3):

    python -m tf_face_toolbox_tpu.cli.import_bin \
        --bin=/data/faces_emore/lfw.bin --output=/tmp/lfw.faceshard
    python -m tf_face_toolbox_tpu.cli.extract \
        --checkpoint_dir=... --data=/tmp/lfw.faceshard \
        --output=/tmp/lfw_emb.npy ...
    python -m tf_face_toolbox_tpu.cli.eval_lfw \
        --embeddings=/tmp/lfw_emb.npy --pairs=/tmp/lfw.faceshard.pairs.txt
"""

from __future__ import annotations

from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("bin", None,
                    "InsightFace verification .bin (pickled "
                    "(bins, issame_list))")
flags.DEFINE_string("output", None, "output .faceshard path")
flags.DEFINE_string("pairs", "",
                    "output pairs file (default <output>.pairs.txt)")
flags.mark_flag_as_required("bin")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.data.binpairs import convert_bin_to_faceshard

    n, pairs, transcoded = convert_bin_to_faceshard(
        FLAGS.bin, FLAGS.output, pairs_path=FLAGS.pairs or None,
        log=logging.info)
    note = f" ({transcoded} transcoded to JPEG)" if transcoded else ""
    print(f"imported {n} images / {pairs} pairs into "
          f"{FLAGS.output}{note}")


if __name__ == "__main__":
    app.run(main)
