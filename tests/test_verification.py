"""Verification: cosine math vs numpy oracle; fold logic vs hand-built data."""

import jax.numpy as jnp
import numpy as np

from tf_face_toolbox_tpu.ops.verification import (
    cosine_similarity,
    similarity_matrix,
    verify_folds,
    verify_pairs,
)


def _np_cosine(a, b):
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return (a * b).sum(-1)


def test_cosine_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(64, 128)).astype(np.float32)
    b = rng.normal(size=(64, 128)).astype(np.float32)
    got = np.asarray(cosine_similarity(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_cosine(a, b), atol=1e-5)


def test_similarity_matrix_matches_pairwise():
    rng = np.random.default_rng(1)
    g = rng.normal(size=(8, 32)).astype(np.float32)
    p = rng.normal(size=(5, 32)).astype(np.float32)
    mat = np.asarray(similarity_matrix(jnp.asarray(g), jnp.asarray(p)))
    for i in range(8):
        for j in range(5):
            np.testing.assert_allclose(
                mat[i, j], _np_cosine(g[i:i+1], p[j:j+1])[0], atol=1e-5)


def test_folds_perfectly_separable():
    # sims: positives at 0.9, negatives at 0.1 → accuracy must be 1.0.
    n = 100
    labels = np.tile([1, 0], n // 2)
    sims = np.where(labels, 0.9, 0.1)
    r = verify_folds(sims, labels, n_folds=10)
    assert r["accuracy_mean"] == 1.0
    assert r["accuracy_std"] == 0.0


def test_folds_hand_computed_threshold():
    # One overlapping negative at 0.8: best threshold on train folds sits
    # above 0.8; held-out accuracy computable by hand.
    sims = np.array([0.9, 0.1] * 10)
    labels = np.array([1, 0] * 10)
    sims[1] = 0.85  # a hard negative in fold 0
    r = verify_folds(sims, labels, n_folds=10)
    # Folds 1..9 are clean; threshold learned there misclassifies only
    # the hard negative in fold 0 → fold 0 acc 0.5, others 1.0.
    assert r["fold_accuracies"][0] == 0.5
    assert all(a == 1.0 for a in r["fold_accuracies"][1:])
    np.testing.assert_allclose(r["accuracy_mean"], 0.95)


def test_verify_pairs_end_to_end():
    rng = np.random.default_rng(2)
    # Same-identity pairs share a direction; diff pairs are random.
    d = 64
    base = rng.normal(size=(30, d))
    e1 = np.concatenate([base, rng.normal(size=(30, d))]).astype(np.float32)
    e2 = np.concatenate([base + 0.05 * rng.normal(size=(30, d)),
                         rng.normal(size=(30, d))]).astype(np.float32)
    labels = np.array([1] * 30 + [0] * 30)
    # Interleave so folds are label-balanced.
    order = np.argsort(np.tile(np.arange(30), 2), kind="stable")
    r = verify_pairs(e1[order], e2[order], labels[order], n_folds=10)
    assert r["accuracy_mean"] > 0.95


def test_folds_rejects_indivisible():
    import pytest
    with pytest.raises(ValueError):
        verify_folds(np.zeros(101), np.zeros(101), n_folds=10)


def test_identification_rank_k():
    from tf_face_toolbox_tpu.ops.verification import identification_rank_k
    rng = np.random.default_rng(7)
    gallery = np.eye(6, 16, dtype=np.float32)       # 6 identities
    g_labels = np.arange(6)
    probe = gallery + 0.05 * rng.normal(size=(6, 16)).astype(np.float32)
    p_labels = np.arange(6)
    assert identification_rank_k(gallery, g_labels, probe, p_labels) == 1.0
    # shuffle labels so rank-1 fails but rank-6 always hits
    wrong = (p_labels + 1) % 6
    assert identification_rank_k(gallery, g_labels, probe, wrong, k=1) == 0.0
    assert identification_rank_k(gallery, g_labels, probe, wrong, k=6) == 1.0
