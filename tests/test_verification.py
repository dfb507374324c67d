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


def test_tar_at_far_hand_oracle():
    from tf_face_toolbox_tpu.ops.verification import tar_at_far

    neg = np.array([.9, .8, .7, .6, .5, .4, .3, .2, .1, .0])
    pos = np.array([.95, .85, .75, .65, .55])
    sims = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones(5, int), np.zeros(10, int)])
    r = tar_at_far(sims, labels, fars=(0.1, 0.2, 0.01, 1.0))
    # far=0.1 → accept ≤1 impostor → thr = 2nd-highest neg (.8)
    assert r["tar@far=0.1"] == 2 / 5 and r["thr@far=0.1"] == .8
    assert r["tar@far=0.2"] == 3 / 5 and r["thr@far=0.2"] == .7
    # finer than 1/N_neg resolution → NaN, not extrapolation
    assert np.isnan(r["tar@far=0.01"])
    assert r["tar@far=1"] == 1.0


def test_tar_at_far_matches_threshold_sweep():
    """Random scores: picked threshold must satisfy FAR ≤ target and be
    the TIGHTEST such (any lower threshold overshoots the FAR)."""
    from tf_face_toolbox_tpu.ops.verification import tar_at_far

    rng = np.random.default_rng(0)
    pos = rng.normal(0.6, 0.2, 400)
    neg = rng.normal(0.0, 0.2, 2000)
    sims = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones(400, int), np.zeros(2000, int)])
    r = tar_at_far(sims, labels, fars=(1e-1, 1e-2, 1e-3))
    for far in (1e-1, 1e-2, 1e-3):
        thr = r[f"thr@far={far:g}"]
        achieved_far = (neg > thr).mean()
        assert achieved_far <= far + 1e-12
        assert r[f"tar@far={far:g}"] == (pos > thr).mean()
        # tightest: admitting one more negative overshoots the target
        lower = np.sort(neg)[::-1][int(np.floor(far * len(neg)))]
        one_more = np.nextafter(lower, -np.inf)
        assert (neg > one_more).mean() > far or lower == thr
    # monotone: looser FAR → TAR no smaller
    assert (r["tar@far=0.1"] >= r["tar@far=0.01"]
            >= r["tar@far=0.001"])


def test_verify_pairs_report_includes_tar(tmp_path):
    from tf_face_toolbox_tpu.ops.verification import verify_pairs

    rng = np.random.default_rng(1)
    proto = rng.normal(size=(20, 16)).astype(np.float32)
    e1 = proto + 0.05 * rng.normal(size=(20, 16)).astype(np.float32)
    e2 = np.concatenate([  # 10 same, 10 different
        proto[:10] + 0.05 * rng.normal(size=(10, 16)).astype(np.float32),
        rng.normal(size=(10, 16)).astype(np.float32)])
    labels = np.concatenate([np.ones(10, int), np.zeros(10, int)])
    order = np.arange(20).reshape(2, 10).T.ravel()  # interleave folds
    e1, e2, labels = e1[order], e2[order], labels[order]
    report = verify_pairs(e1, e2, labels, n_folds=5)
    assert "tar@far=0.1" in report and "accuracy_mean" in report
    assert report["tar@far=0.1"] > 0.5  # well-separated prototypes


def test_roc_curve_endpoints_and_consistency_with_tar_at_far():
    """The ROC passes exactly through tar_at_far's operating points
    (same strictly-above convention), ascends 0→1 on both axes, and
    every (far, tar) point is reproducible by a direct threshold sweep."""
    from tf_face_toolbox_tpu.ops.verification import roc_curve, tar_at_far

    rng = np.random.default_rng(2)
    pos = rng.normal(0.5, 0.25, 300)
    neg = rng.normal(0.0, 0.25, 1500)
    sims = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones(300, int), np.zeros(1500, int)])
    thr, far, tar = roc_curve(sims, labels)
    assert far[0] == tar[0] == 0.0 and far[-1] == tar[-1] == 1.0
    assert (np.diff(far) >= 0).all() and (np.diff(tar) >= 0).all()
    assert thr[-1] == -np.inf and (np.diff(thr[:-1]) < 0).all()
    for i in rng.integers(0, len(thr), 25):
        np.testing.assert_allclose(far[i], (neg > thr[i]).mean())
        np.testing.assert_allclose(tar[i], (pos > thr[i]).mean())
    r = tar_at_far(sims, labels, fars=(1e-1, 1e-2))
    for target in (1e-1, 1e-2):
        j = np.searchsorted(-thr, -r[f"thr@far={target:g}"])
        np.testing.assert_allclose(tar[j], r[f"tar@far={target:g}"])


def test_auc_eer_separable_and_random():
    from tf_face_toolbox_tpu.ops.verification import auc_eer, roc_curve

    # perfectly separable: AUC 1, EER 0
    sims = np.concatenate([np.linspace(0.6, 0.9, 50),
                           np.linspace(0.0, 0.4, 50)])
    labels = np.concatenate([np.ones(50, int), np.zeros(50, int)])
    _, far, tar = roc_curve(sims, labels)
    auc, eer = auc_eer(far, tar)
    assert auc == 1.0 and eer == 0.0
    # coin-flip scores: AUC ≈ 0.5, EER ≈ 0.5
    rng = np.random.default_rng(3)
    sims = rng.normal(size=4000)
    labels = (rng.random(4000) < 0.5).astype(int)
    _, far, tar = roc_curve(sims, labels)
    auc, eer = auc_eer(far, tar)
    assert 0.45 < auc < 0.55 and 0.45 < eer < 0.55


def test_roc_curve_refuses_single_class_but_report_degrades():
    import warnings

    from tf_face_toolbox_tpu.ops.verification import roc_curve, verify_pairs

    with np.testing.assert_raises(ValueError):
        roc_curve(np.r_[0.1, 0.2], np.r_[1, 1])
    e = np.random.default_rng(4).normal(size=(4, 8)).astype(np.float32)
    with warnings.catch_warnings():
        # all-positive pairs: the degenerate-fold warning is the point
        warnings.simplefilter("ignore", UserWarning)
        report = verify_pairs(e, e, np.ones(4, int), n_folds=2)
    assert np.isnan(report["auc"]) and np.isnan(report["eer"])
