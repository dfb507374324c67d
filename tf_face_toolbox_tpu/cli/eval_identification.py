"""Closed-set identification (1:N) evaluation — CMC curve.

Completes the L7 eval layer next to pair verification (SURVEY.md §3.3):
gallery + probe embedding files → rank-k hit rates, megaface-style.
The similarity matrix runs on-device in probe batches (one MXU matmul
per batch; ranks via count-above-best-correct, no host argsort), so
large distractor galleries stream through.

    python -m tf_face_toolbox_tpu.cli.eval_identification \
        --gallery=gal.npy --gallery_list=gal_list.txt \
        --probe=probe.npy --probe_list=probe_list.txt --ranks=1,5,10

Embeddings come from ``cli.extract`` (any of .npy/.npz/.mat/.bin);
labels come from the SAME pack list files the extraction consumed
(``image_path label`` per line, row order = embedding order).
"""

from __future__ import annotations

import json

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_string("gallery", None, "gallery embeddings file")
flags.DEFINE_string("probe", None, "probe embeddings file")
flags.DEFINE_string("gallery_list", None,
                    "pack list file with gallery labels")
flags.DEFINE_string("probe_list", None, "pack list file with probe labels")
flags.DEFINE_list("ranks", ["1", "5", "10"], "CMC ranks to report")
flags.DEFINE_list("far", ["1e-1", "1e-2"],
                  "open-set operating points: DIR@FAR is reported "
                  "whenever the probe set contains non-mated "
                  "(not-enrolled) identities — the IJB-style 1:N "
                  "watchlist protocol")
flags.DEFINE_integer("dir_rank", 1,
                     "rank within which a mated probe must be "
                     "identified for DIR@FAR")
flags.DEFINE_integer("probe_batch", 4096,
                     "probes per device matmul batch")
flags.mark_flag_as_required("gallery")
flags.mark_flag_as_required("probe")
flags.mark_flag_as_required("gallery_list")
flags.mark_flag_as_required("probe_list")


# Canonical implementation lives flag-free in data/format.py (shared
# with cli.search); re-exported here for existing importers.
from tf_face_toolbox_tpu.data.format import load_labels  # noqa: E402,F401


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import json_sanitize, setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.ops.verification import cmc_curve
    from tf_face_toolbox_tpu.train.checkpoint import load_embeddings

    gallery, _ = load_embeddings(FLAGS.gallery)
    probe, _ = load_embeddings(FLAGS.probe)
    glabels = load_labels(FLAGS.gallery_list)
    plabels = load_labels(FLAGS.probe_list)
    for name, emb, lab in (("gallery", gallery, glabels),
                           ("probe", probe, plabels)):
        if len(emb) != len(lab):
            raise SystemExit(
                f"{name}: {len(emb)} embeddings vs {len(lab)} labels — "
                "list file must be the one the extraction consumed")
    from tf_face_toolbox_tpu.ops.verification import identification_stats

    # One similarity sweep feeds both protocols.
    stats = identification_stats(gallery, glabels, probe, plabels,
                                 batch=FLAGS.probe_batch)
    report = cmc_curve(gallery, glabels, probe, plabels,
                       ranks=[int(k) for k in FLAGS.ranks],
                       stats=stats)
    if report["skipped"]:
        # cmc's "skipped" probes are exactly the open-set non-mated
        # set: score them as impostors instead of dropping them.
        from tf_face_toolbox_tpu.ops.verification import dir_at_far
        report["open_set"] = dir_at_far(
            gallery, glabels, probe, plabels,
            fars=[float(f) for f in FLAGS.far], rank=FLAGS.dir_rank,
            stats=stats)
    else:
        # A user who passed --far with an all-mated probe set would
        # otherwise get no open_set key and no diagnostic (the warning
        # inside dir_at_far is unreachable from here).
        report["open_set_note"] = (
            "DIR@FAR skipped: every probe identity is enrolled in the "
            "gallery, so there are no non-mated probes to set FAR "
            "thresholds (add distractor probes for the open-set "
            "protocol)")
    print(json.dumps(json_sanitize(report), indent=2,
                 allow_nan=False))


if __name__ == "__main__":
    app.run(main)
