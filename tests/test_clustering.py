"""Embedding clustering (ops/clustering.py + cli.cluster)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

DIM = 64
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_identities(rng, n_ids, per_id, spread=0.02):
    # spread is per-dim noise sigma: total perturbation norm is
    # spread*sqrt(DIM)=0.16, so within-identity cosines sit ~0.95 and
    # cross-identity ~|0.1| — cleanly split by thresholds near 0.8
    """Well-separated synthetic identity clusters on the unit sphere."""
    centers = rng.normal(size=(n_ids, DIM)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, truth = [], []
    for c in range(n_ids):
        e = centers[c] + spread * rng.normal(
            size=(per_id, DIM)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        rows.append(e)
        truth += [c] * per_id
    return np.concatenate(rows), np.asarray(truth)


def test_knn_graph_self_removed_and_sorted():
    from tf_face_toolbox_tpu.ops.clustering import knn_graph

    rng = np.random.default_rng(0)
    emb, _ = _make_identities(rng, 4, 6)
    idx, sims = knn_graph(emb, k=5, batch=7)
    assert idx.shape == (24, 5) and sims.shape == (24, 5)
    rows = np.arange(24)[:, None]
    assert not np.any(idx == rows)                    # no self-match
    assert np.all(np.diff(sims, axis=1) <= 1e-6)      # descending
    # exact duplicate row: the duplicate must be the top neighbor
    dup = np.concatenate([emb, emb[:1]])
    idx2, sims2 = knn_graph(dup, k=3)
    assert idx2[0, 0] == 24 and idx2[24, 0] == 0
    assert sims2[0, 0] == pytest.approx(1.0, abs=5e-3)

    with pytest.raises(ValueError, match=">= 2"):
        knn_graph(emb[:1], k=3)


def test_cluster_recovers_identities():
    from tf_face_toolbox_tpu.ops.clustering import cluster_embeddings

    rng = np.random.default_rng(1)
    emb, truth = _make_identities(rng, 5, 8)
    labels, n = cluster_embeddings(emb, threshold=0.8, k=4)
    assert n == 5
    # labels are a relabeling of truth (first-appearance order)
    for c in range(5):
        assert len(set(labels[truth == c])) == 1
    assert len(set(labels)) == 5
    # determinism
    labels2, n2 = cluster_embeddings(emb, threshold=0.8, k=4)
    np.testing.assert_array_equal(labels, labels2) and n == n2


def test_cluster_threshold_extremes_and_noise():
    from tf_face_toolbox_tpu.ops.clustering import cluster_embeddings

    rng = np.random.default_rng(2)
    emb, _ = _make_identities(rng, 3, 4)
    # impossible threshold: every row is its own cluster
    labels, n = cluster_embeddings(emb, threshold=1.5, k=3)
    assert n == 12 and len(set(labels)) == 12
    # accept-everything threshold with k >= n-1: one component
    labels, n = cluster_embeddings(emb, threshold=-1.0, k=11)
    assert n == 1 and set(labels) == {0}
    # min_size: lone outlier far from 2 tight clusters becomes noise
    a, _ = _make_identities(rng, 2, 5, spread=0.02)
    out = rng.normal(size=(1, DIM)).astype(np.float32)
    out /= np.linalg.norm(out)
    emb2 = np.concatenate([a, out])
    labels, n = cluster_embeddings(emb2, threshold=0.9, k=3,
                                   min_size=2)
    assert n == 2 and labels[-1] == -1


@pytest.mark.mid
def test_cli_cluster_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    emb, truth = _make_identities(rng, 3, 5)
    ep = tmp_path / "emb.npy"
    np.save(ep, emb)
    names = tmp_path / "list.txt"
    names.write_text("".join(f"img{i}.jpg {truth[i]}\n"
                             for i in range(len(truth))))
    out = tmp_path / "labels.npy"
    env = dict(os.environ, TFFT_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.cluster",
         f"--embeddings={ep}", f"--output={out}", "--threshold=0.8",
         "--k=4", f"--names={names}"],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["clusters"] == 3 and report["noise_rows"] == 0
    labels = np.load(out)
    assert labels.shape == (15,)
    lines = open(str(out) + ".clusters.txt").read().splitlines()
    assert len(lines) == 3 and lines[0].startswith("0 img")


def test_cluster_bench_generator_and_recovery():
    """tools/cluster_bench.py's synthetic set recovers exactly at a
    CPU-sized scale — the same generator/threshold/k the 10^6-10^7
    hardware proof runs (docs/design.md clustering paragraph)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import cluster_bench

    from tf_face_toolbox_tpu.ops.clustering import cluster_embeddings

    emb = cluster_bench.make_embeddings(300)     # 30 ids x 10
    assert emb.shape == (300, cluster_bench.DIM)
    assert np.allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    # same-id cosine high, cross-id low (the sigma=0.01 design point)
    assert float(emb[0] @ emb[1]) > 0.9
    assert abs(float(emb[0] @ emb[-1])) < 0.5
    labels, n = cluster_embeddings(emb, threshold=0.6, k=10)
    assert n == 30 and (labels >= 0).all()
    truth = np.repeat(np.arange(30), 10)
    # exact recovery: one cluster per identity
    for ident in range(30):
        assert len(np.unique(labels[truth == ident])) == 1
