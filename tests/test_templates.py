"""Template (set-to-set) evaluation: aggregation oracle + CLI e2e."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tf_face_toolbox_tpu.ops.templates import (
    aggregate_templates, verify_templates)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_media_then_template_mean_oracle():
    """A 3-frame video must count as ONE look: media are averaged
    before the template mean (the IJB aggregation order)."""
    rng = np.random.default_rng(0)
    still = rng.standard_normal(4).astype(np.float32)
    frames = rng.standard_normal((3, 4)).astype(np.float32)
    emb = np.vstack([still, frames])
    t_emb, keys = aggregate_templates(
        emb, np.asarray(["t1"] * 4), np.asarray(["a", "b", "b", "b"]))
    assert keys.tolist() == ["t1"]
    expect = _norm((still + frames.mean(0)) / 2.0)
    np.testing.assert_allclose(t_emb[0], expect, rtol=1e-5, atol=1e-6)
    # naive all-frame mean would differ (the video would dominate)
    assert not np.allclose(t_emb[0], _norm(emb.mean(0)), atol=1e-3)


def test_media_ids_scoped_per_template():
    """Reusing a media id across templates (IJB metadata does) must
    not merge rows across templates."""
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((4, 8)).astype(np.float32)
    t_emb, keys = aggregate_templates(
        emb, np.asarray(["t1", "t1", "t2", "t2"]),
        np.asarray(["m", "m", "m", "m"]))
    np.testing.assert_allclose(t_emb[0], _norm(emb[:2].mean(0)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(t_emb[1], _norm(emb[2:].mean(0)),
                               rtol=1e-5, atol=1e-6)


def test_aggregate_validates():
    with pytest.raises(ValueError, match="mismatch"):
        aggregate_templates(np.zeros((2, 4)), np.asarray(["a"]),
                            np.asarray(["m", "m"]))
    with pytest.raises(ValueError, match="no rows"):
        aggregate_templates(np.zeros((0, 4)), np.asarray([]),
                            np.asarray([]))


def test_verify_templates_separates_subjects():
    """Well-separated synthetic subjects: TAR@FAR=0.1 == 1.0; unknown
    template ids are a loud error."""
    rng = np.random.default_rng(2)
    centers = _norm(rng.standard_normal((4, 16)).astype(np.float32)) * 4
    rows, tids, mids = [], [], []
    for s in range(4):
        for t in range(2):          # two templates per subject
            for m in range(3):      # three stills each
                rows.append(centers[s] + 0.05 * rng.standard_normal(16))
                tids.append(f"s{s}t{t}")
                mids.append(f"m{m}")
    t_emb, keys = aggregate_templates(
        np.asarray(rows, np.float32), np.asarray(tids), np.asarray(mids))
    pairs = [[f"s{s}t0", f"s{s}t1"] for s in range(4)]
    labels = [1] * 4
    for s in range(4):
        pairs.append([f"s{s}t0", f"s{(s + 1) % 4}t1"])
        labels.append(0)
    report = verify_templates(t_emb, keys, np.asarray(pairs),
                              np.asarray(labels), fars=(0.25,))
    assert report["tar@far=0.25"] == 1.0
    with pytest.raises(ValueError, match="unknown template"):
        verify_templates(t_emb, keys, np.asarray([["s0t0", "nope"]]),
                         np.asarray([1]))


@pytest.mark.slow
def test_eval_templates_cli_e2e(tmp_path):
    rng = np.random.default_rng(3)
    centers = _norm(rng.standard_normal((3, 8)).astype(np.float32)) * 4
    emb, meta = [], []
    for s in range(3):
        for t in range(2):
            for m in range(2):
                emb.append(centers[s] + 0.05 * rng.standard_normal(8))
                meta.append(f"s{s}t{t} m{m} subj{s}")
    np.save(tmp_path / "emb.npy", _norm(np.asarray(emb, np.float32)))
    (tmp_path / "meta.txt").write_text("\n".join(meta) + "\n")
    # unlabeled pairs: labels derived from meta subject ids
    pair_lines = [f"s{s}t0 s{s}t1" for s in range(3)]
    pair_lines += [f"s{s}t0 s{(s + 1) % 3}t1" for s in range(3)]
    (tmp_path / "pairs.txt").write_text("\n".join(pair_lines) + "\n")

    env = dict(os.environ)
    env["TFFT_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.eval_templates",
         f"--embeddings={tmp_path / 'emb.npy'}",
         f"--meta={tmp_path / 'meta.txt'}",
         f"--pairs={tmp_path / 'pairs.txt'}",
         "--fars=0.34",
         f"--output_templates={tmp_path / 'tmpl.npy'}"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.loads(r.stdout)
    assert report["templates"] == 6 and report["images"] == 12
    assert report["tar@far=0.34"] == 1.0
    tmpl = np.load(tmp_path / "tmpl.npy")
    labels = np.load(tmp_path / "tmpl.labels.npy")
    assert tmpl.shape == (6, 8) and len(labels) == 6
    assert sorted(set(labels.tolist())) == ["subj0", "subj1", "subj2"]
