"""IJB-style template (set-to-set) verification CLI.

Aggregates per-image embeddings into template embeddings (media-mean
then template-mean, ops/templates.py) and scores template pairs at
fixed-FAR operating points — the IJB-B/C 1:1 protocol. Beyond the
reference's LFW pair eval (SURVEY.md §1 L7); shares the extraction
output format, so the chain is:

    cli.extract  --data=ijbc.faceshard --output=emb.npy
    cli.eval_templates --embeddings=emb.npy --meta=meta.txt \
        --pairs=pairs.txt [--output_templates=tmpl.npy]

``--meta``: one line per embedding row (shard order):
``template_id media_id [subject_id]``. ``--pairs``: ``t1 t2 label``
lines, or ``t1 t2`` with labels derived from the meta subject ids.
``--output_templates`` saves the aggregated template embeddings (+ a
``.labels.npy`` of subject ids when available) for 1:N runs through
cli.eval_identification.
"""

from __future__ import annotations

import json

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_string("embeddings", None, ".npy from cli.extract")
flags.DEFINE_string("meta", None,
                    "per-row 'template_id media_id [subject_id]' file")
flags.DEFINE_string("pairs", None,
                    "'t1 t2 label' or 't1 t2' (labels from meta "
                    "subject ids) lines")
flags.DEFINE_list("fars", ["1e-1", "1e-2", "1e-3", "1e-4", "1e-5"],
                  "FAR operating points")
flags.DEFINE_string("output_templates", "",
                    "optional .npy for the aggregated template "
                    "embeddings (rows ordered by sorted template id; "
                    "subject labels land next to it as .labels.npy)")
flags.mark_flag_as_required("embeddings")
flags.mark_flag_as_required("meta")
flags.mark_flag_as_required("pairs")


def load_meta(path: str):
    """→ (template_ids, media_ids, subject_by_template | None)."""
    tids, mids, subs = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if len(parts) not in (2, 3):
                raise SystemExit(
                    f"--meta line needs 2-3 fields, got: {line!r}")
            tids.append(parts[0])
            mids.append(parts[1])
            subs.append(parts[2] if len(parts) == 3 else None)
    if not tids:
        raise SystemExit(f"--meta {path} has no data lines")
    subject = None
    if all(s is not None for s in subs):
        subject = {}
        for t, s in zip(tids, subs):
            if subject.setdefault(t, s) != s:
                raise SystemExit(
                    f"template {t} spans subjects {subject[t]} and {s}")
    return np.asarray(tids), np.asarray(mids), subject


def load_template_pairs(path: str, subject: dict | None):
    p1, p2, lab = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if len(parts) == 3:
                p1.append(parts[0])
                p2.append(parts[1])
                lab.append(int(parts[2]))
            elif len(parts) == 2:
                if subject is None:
                    raise SystemExit(
                        "pairs file has no labels and --meta has no "
                        "subject ids to derive them from")
                for t in parts:
                    if t not in subject:
                        raise SystemExit(
                            f"pair references template {t} absent "
                            f"from --meta")
                p1.append(parts[0])
                p2.append(parts[1])
                lab.append(int(subject[parts[0]] == subject[parts[1]]))
            else:
                raise SystemExit(
                    f"pairs line needs 2-3 fields, got: {line!r}")
    if not p1:
        raise SystemExit(f"--pairs {path} has no data lines")
    return (np.stack([np.asarray(p1), np.asarray(p2)], axis=1),
            np.asarray(lab))


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import json_sanitize, setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.ops.templates import (
        aggregate_templates, verify_templates)
    from tf_face_toolbox_tpu.train.checkpoint import load_embeddings

    emb, _ = load_embeddings(FLAGS.embeddings)
    tids, mids, subject = load_meta(FLAGS.meta)
    if len(tids) != len(emb):
        raise SystemExit(f"--meta rows ({len(tids)}) != embedding rows "
                         f"({len(emb)})")
    pairs, labels = load_template_pairs(FLAGS.pairs, subject)
    t_emb, t_keys = aggregate_templates(emb, tids, mids)
    if FLAGS.output_templates:
        np.save(FLAGS.output_templates, t_emb)
        if subject is not None:
            np.save(FLAGS.output_templates.removesuffix(".npy")
                    + ".labels.npy",
                    np.asarray([subject[k] for k in t_keys.tolist()]))
    report = {"templates": int(len(t_keys)),
              "images": int(len(emb))}
    report.update(verify_templates(
        t_emb, t_keys, pairs, labels,
        fars=tuple(float(f) for f in FLAGS.fars)))
    print(json.dumps(json_sanitize(report), indent=2, allow_nan=True))


if __name__ == "__main__":
    app.run(main)
