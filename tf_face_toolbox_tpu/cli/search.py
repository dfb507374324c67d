"""Open-set 1:N gallery search — the production counterpart of
cli.eval_identification's closed-set CMC (SURVEY.md §3.3 L7 layer).

Given an enrolled gallery and probe embeddings (both from
``cli.extract``), emit each probe's top-k gallery matches with cosine
scores, optionally mapped to identity labels and thresholded (scores
below ``--threshold`` become identity −1, "unknown" — the open-set
decision). One MXU matmul + on-device top_k per probe batch; the
gallery stays device-resident, so distractor-scale galleries stream.

    python -m tf_face_toolbox_tpu.cli.search \
        --gallery=gal.npy --gallery_list=gal_list.txt \
        --probe=probe.npy --k=5 --threshold=0.3 \
        --output=matches.npz

Output .npz: ``indices`` (P, k) int32 gallery rows, ``scores`` (P, k)
f32 descending, and — when ``--gallery_list`` is given — ``labels``
(P, k) int32 identities with the threshold applied.
"""

from __future__ import annotations

import json

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_string("gallery", None, "gallery embeddings file")
flags.DEFINE_string("probe", None, "probe embeddings file")
flags.DEFINE_string("gallery_list", "",
                    "pack list file with gallery labels (optional: "
                    "adds a thresholded identity matrix to the output)")
flags.DEFINE_integer("k", 5, "matches per probe")
flags.DEFINE_float("threshold", 0.0,
                   "open-set floor: matches scoring below this become "
                   "identity -1 (only meaningful with --gallery_list)")
flags.DEFINE_integer("probe_batch", 4096, "probes per device matmul")
flags.DEFINE_bool("data_parallel", False,
                  "shard the GALLERY over all visible devices (per-"
                  "shard top-k + one ICI all-gather of k candidates "
                  "per device — the pattern for galleries beyond one "
                  "chip's HBM); results equal single-device ranking")
flags.DEFINE_string("cohort", "",
                    "impostor-cohort embeddings file: switches scores "
                    "to ADAPTIVE S-NORM — each probe/gallery score is "
                    "½(z+t)-normalized by that embedding's top-"
                    "--snorm_top cohort statistics (the production "
                    "calibration for open-set thresholds; --threshold "
                    "then applies on the normalized scale)")
flags.DEFINE_integer("snorm_top", 200,
                     "cohort scores per embedding used for the "
                     "adaptive statistics (0 = whole cohort)")
flags.DEFINE_string("output", None, "output .npz path")
flags.mark_flag_as_required("gallery")
flags.mark_flag_as_required("probe")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.data.format import load_labels
    from tf_face_toolbox_tpu.ops.verification import top_k_matches
    from tf_face_toolbox_tpu.train.checkpoint import load_embeddings

    gallery, _ = load_embeddings(FLAGS.gallery)
    probe, _ = load_embeddings(FLAGS.probe)
    p_stats = g_stats = None
    if FLAGS.cohort:
        from tf_face_toolbox_tpu.ops.verification import cohort_stats
        cohort, _ = load_embeddings(FLAGS.cohort)
        top = min(FLAGS.snorm_top, cohort.shape[0]) \
            if FLAGS.snorm_top else 0
        p_stats = cohort_stats(probe, cohort, top=top)
        g_stats = cohort_stats(gallery, cohort, top=top)
    if FLAGS.data_parallel:
        from tf_face_toolbox_tpu.ops.verification import (
            sharded_top_k_matches)
        from tf_face_toolbox_tpu.parallel.mesh import create_mesh

        indices, scores = sharded_top_k_matches(
            gallery, probe, k=FLAGS.k, mesh=create_mesh(),
            batch=FLAGS.probe_batch,
            probe_stats=p_stats, gallery_stats=g_stats)
    else:
        indices, scores = top_k_matches(gallery, probe, k=FLAGS.k,
                                        batch=FLAGS.probe_batch,
                                        probe_stats=p_stats,
                                        gallery_stats=g_stats)
    out = {"indices": indices, "scores": scores.astype(np.float32)}
    summary = {
        "probes": int(probe.shape[0]),
        "gallery": int(gallery.shape[0]),
        "k": FLAGS.k,
        "top1_score_mean": float(scores[:, 0].mean()),
    }
    if FLAGS.cohort:
        summary["snorm"] = {"cohort": int(cohort.shape[0]), "top": top}
    if FLAGS.gallery_list:
        gal_labels = load_labels(FLAGS.gallery_list)
        if len(gal_labels) != gallery.shape[0]:
            raise SystemExit(
                f"--gallery_list has {len(gal_labels)} labels but the "
                f"gallery has {gallery.shape[0]} rows")
        labels = gal_labels[indices].astype(np.int32)
        labels = np.where(scores >= FLAGS.threshold, labels, -1)
        out["labels"] = labels
        summary["threshold"] = FLAGS.threshold
        summary["top1_unknown_frac"] = float((labels[:, 0] < 0).mean())
    np.savez(FLAGS.output, **out)
    summary["output"] = FLAGS.output
    print(json.dumps(summary))


if __name__ == "__main__":
    app.run(main)
