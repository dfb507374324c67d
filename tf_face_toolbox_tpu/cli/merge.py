"""Merge FaceShards — the parallel-packing workflow's second half.

Pack chunks of a large dataset concurrently (one `cli.pack` per chunk),
then combine them into the single shard the training pipeline mmaps:

    python -m tf_face_toolbox_tpu.cli.merge \
        --inputs=chunk0.faceshard,chunk1.faceshard,... \
        --output=full.faceshard [--relabel]

``--relabel`` offsets each chunk's labels so per-chunk identity
numbering (every chunk starting at 0) stays disjoint; omit it when the
chunks already share a global id space. Streaming, O(1) memory.
"""

from __future__ import annotations

from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_list("inputs", None, "input .faceshard paths, in order")
flags.DEFINE_string("output", None, "merged .faceshard path")
flags.DEFINE_bool("relabel", False,
                  "offset each input's labels past the previous "
                  "input's max (disjoint per-chunk id spaces)")
flags.mark_flag_as_required("inputs")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.data.format import merge_shards

    n = merge_shards(FLAGS.inputs, FLAGS.output, relabel=FLAGS.relabel)
    print(f"merged {len(FLAGS.inputs)} shards "
          f"({n} records) into {FLAGS.output}")


if __name__ == "__main__":
    app.run(main)
