"""LFW-style verification CLI.

Rebuild of the reference's offline eval (SURVEY.md §3.3): pairs file +
embeddings → 10-fold cross-validated accuracy.

Pairs file format: one pair per line, ``idx1 idx2 label`` where idx are
row indices into the embeddings array and label is 1 (same) / 0 (diff).

    python -m tf_face_toolbox_tpu.cli.eval_lfw \
        --embeddings=/tmp/lfw_embeddings.npy --pairs=/data/pairs.txt
"""

from __future__ import annotations

import json

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_string("embeddings", None, ".npy from cli.extract")
flags.DEFINE_string("pairs", None, "pairs file: 'idx1 idx2 label' lines")
flags.DEFINE_integer("folds", 10, "cross-validation folds")
flags.mark_flag_as_required("embeddings")
flags.mark_flag_as_required("pairs")


def load_pairs(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    i1, i2, lab = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 3:
                continue
            i1.append(int(parts[0]))
            i2.append(int(parts[1]))
            lab.append(int(parts[2]))
    return np.asarray(i1), np.asarray(i2), np.asarray(lab)


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.train.checkpoint import load_embeddings
    from tf_face_toolbox_tpu.ops.verification import verify_pairs

    emb, _ = load_embeddings(FLAGS.embeddings)
    i1, i2, labels = load_pairs(FLAGS.pairs)
    report = verify_pairs(emb[i1], emb[i2], labels, n_folds=FLAGS.folds)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    app.run(main)
