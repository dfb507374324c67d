"""Dataset packer CLI: image-list → FaceShard.

Rebuild of the reference's dataset conversion step (ref: upstream
data/convert_*.py [UPSTREAM-K LOW]).

    python -m tf_face_toolbox_tpu.cli.pack \
        --list=/data/casia_list.txt --root=/data/casia \
        --output=/data/casia.faceshard
"""

from __future__ import annotations

from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_string("list", None, "lines of 'relative/path.jpg label'")
flags.DEFINE_string("root", "", "prefix for relative image paths")
flags.DEFINE_string("output", None, "output .faceshard path")
flags.DEFINE_integer("recode_size", 0,
                     "re-encode every image to this square size as a "
                     "4:4:4 JPEG (multiple of 8) — the uniform shard "
                     "the DCT input path needs; 0 keeps original bytes")
flags.DEFINE_integer("recode_quality", 95, "JPEG quality when recoding")
flags.DEFINE_string("landmarks", "",
                    "align while packing: file parallel to --list with "
                    "10 floats per line (x1 y1 .. x5 y5 — eyes, nose, "
                    "mouth corners); each face is similarity-aligned "
                    "to the ArcFace template (ops/align, Umeyama) at "
                    "--align_size² and re-encoded 4:4:4. The external "
                    "MTCNN-era alignment step, folded into the packer")
flags.DEFINE_integer("align_size", 112,
                     "aligned crop size (multiple of 8)")
flags.mark_flag_as_required("list")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.data.format import pack_image_list

    n = pack_image_list(FLAGS.list, FLAGS.output, root=FLAGS.root,
                        recode_size=FLAGS.recode_size,
                        recode_quality=FLAGS.recode_quality,
                        landmarks_path=FLAGS.landmarks,
                        align_size=FLAGS.align_size)
    print(f"packed {n} records into {FLAGS.output}")


if __name__ == "__main__":
    app.run(main)
