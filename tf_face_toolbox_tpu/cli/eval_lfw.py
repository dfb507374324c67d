"""LFW-style verification CLI.

Rebuild of the reference's offline eval (SURVEY.md §3.3): pairs file +
embeddings → 10-fold cross-validated accuracy.

Two pairs-file formats are accepted (auto-detected):

1. Index format: ``idx1 idx2 label`` per line, idx = row indices into
   the embeddings array, label 1 (same) / 0 (diff).
2. The OFFICIAL LFW ``pairs.txt`` (view 2) the reference era consumed
   [TF1-IDIOM]: an optional ``<folds>\t<per_fold>`` header, then
   ``name  n1  n2`` lines for matched pairs and
   ``name1  n1  name2  n2`` for mismatched ones. This format needs
   ``--names`` — the pack list file (image paths in shard order) — to
   resolve ``Name_0001``-style identifiers to embedding rows.

    python -m tf_face_toolbox_tpu.cli.eval_lfw \
        --embeddings=/tmp/lfw_embeddings.npy --pairs=/data/pairs.txt \
        --names=/data/lfw_list.txt
"""

from __future__ import annotations

import json
import os

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_string("embeddings", None, ".npy from cli.extract")
flags.DEFINE_string("pairs", None,
                    "pairs file ('idx1 idx2 label' or official LFW)")
flags.DEFINE_string("names", "",
                    "pack list file mapping embedding rows to image "
                    "paths (needed for official-LFW pairs format)")
flags.DEFINE_integer("folds", 10, "cross-validation folds")
flags.DEFINE_string("roc_out", "",
                    "write the full ROC curve (thresholds/far/tar "
                    "arrays at every distinct score, plot-ready) to "
                    "this .npz; the JSON report always includes "
                    "auc/eer")
flags.mark_flag_as_required("embeddings")
flags.mark_flag_as_required("pairs")


def load_pairs(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Index-format pairs: 'idx1 idx2 label' lines."""
    i1, i2, lab = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 3 or not all(map(_isint, parts)):
                continue  # comment / annotation / header line
            i1.append(int(parts[0]))
            i2.append(int(parts[1]))
            lab.append(int(parts[2]))
    return np.asarray(i1), np.asarray(i2), np.asarray(lab)


def _name_index(names_path: str) -> dict[tuple[str, int], int]:
    """(person name, photo number) → embedding row, from the pack list
    file (one image path per line, optionally followed by a label, in
    shard order). Accepts LFW's ``.../Name/Name_0001.jpg`` layout or
    any path whose basename ends in ``_<number>``."""
    index: dict[tuple[str, int], int] = {}
    with open(names_path) as f:
        row = 0
        for line in f:
            parts = line.split()
            if not parts:
                continue
            stem = os.path.splitext(os.path.basename(parts[0]))[0]
            name, _, num = stem.rpartition("_")
            if name and num.isdigit():
                index[(name, int(num))] = row
            row += 1
    return index


def _isint(tok: str) -> bool:
    return tok.lstrip("-").isdigit()


def _is_official_lfw(path: str) -> bool:
    """Official format detector. The first line that parses as either
    format decides; lines that parse as neither (comments, annotations,
    headers) are ignored — mirroring ``load_pairs``, which skips
    non-pair lines, so a ``# idx1 idx2 label`` comment can't flip an
    index-format file into the official branch."""
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 3 and all(map(_isint, parts)):
                return False  # index-format data line
            if ((len(parts) == 3 and not _isint(parts[0])
                 and _isint(parts[1]) and _isint(parts[2]))
                    or (len(parts) == 4 and not _isint(parts[0])
                        and _isint(parts[1]) and not _isint(parts[2])
                        and _isint(parts[3]))):
                return True  # official matched/mismatched data line
    return False


def load_lfw_pairs(path: str, names_path: str):
    """Official LFW pairs.txt → (i1, i2, labels) row indices.

    Matched line: ``name n1 n2``; mismatched: ``name1 n1 name2 n2``.
    The header line(s) of ints are skipped. Raises KeyError naming the
    missing photo if the embeddings don't cover a referenced image.
    """
    index = _name_index(names_path)

    def lookup(name: str, num: str) -> int:
        key = (name, int(num))
        if key not in index:
            raise KeyError(
                f"pairs file references {name}_{int(num):04d} but it is "
                f"not in --names ({names_path})")
        return index[key]

    i1, i2, lab = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if (len(parts) == 3 and not _isint(parts[0])
                    and _isint(parts[1]) and _isint(parts[2])):
                i1.append(lookup(parts[0], parts[1]))
                i2.append(lookup(parts[0], parts[2]))
                lab.append(1)
            elif (len(parts) == 4 and not _isint(parts[0])
                    and _isint(parts[1]) and not _isint(parts[2])
                    and _isint(parts[3])):
                i1.append(lookup(parts[0], parts[1]))
                i2.append(lookup(parts[2], parts[3]))
                lab.append(0)
            # header / comment / blank lines fall through
    return np.asarray(i1), np.asarray(i2), np.asarray(lab)


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import json_sanitize, setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.train.checkpoint import load_embeddings
    from tf_face_toolbox_tpu.ops.verification import verify_pairs

    emb, _ = load_embeddings(FLAGS.embeddings)
    if _is_official_lfw(FLAGS.pairs):
        if not FLAGS.names:
            raise SystemExit(
                "official-LFW pairs format detected; pass --names="
                "<pack list file> to map names to embedding rows")
        i1, i2, labels = load_lfw_pairs(FLAGS.pairs, FLAGS.names)
    else:
        i1, i2, labels = load_pairs(FLAGS.pairs)
    report = verify_pairs(emb[i1], emb[i2], labels, n_folds=FLAGS.folds)
    if FLAGS.roc_out:
        import jax.numpy as jnp

        from tf_face_toolbox_tpu.ops.verification import (
            cosine_similarity, roc_curve)

        sims = np.asarray(cosine_similarity(jnp.asarray(emb[i1]),
                                            jnp.asarray(emb[i2])))
        thresholds, far, tar = roc_curve(sims, labels)
        np.savez(FLAGS.roc_out, thresholds=thresholds, far=far, tar=tar)
        report["roc_out"] = FLAGS.roc_out
    print(json.dumps(json_sanitize(report), indent=2,
                 allow_nan=False))


if __name__ == "__main__":
    app.run(main)
