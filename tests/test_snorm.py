"""Adaptive s-norm score normalization for 1:N search (cohort z/t-norm
statistics; ops/verification.cohort_stats + the normalized top-k)."""

import json
import subprocess
import sys
import os

import numpy as np
import pytest

from tf_face_toolbox_tpu.ops.verification import (
    cohort_stats,
    sharded_top_k_matches,
    top_k_matches,
)


def _unit(rng, n, d):
    e = rng.normal(size=(n, d)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def _np_stats(emb, cohort, top):
    sims = emb @ cohort.T
    if top:
        sims = np.sort(sims, axis=1)[:, -top:]
    return sims.mean(1), np.maximum(sims.std(1), 1e-6)


def _np_snorm(sims, ps, gs):
    return 0.5 * ((sims - ps[0][:, None]) / ps[1][:, None]
                  + (sims - gs[0][None, :]) / gs[1][None, :])


def test_cohort_stats_matches_numpy():
    rng = np.random.default_rng(0)
    emb, cohort = _unit(rng, 9, 16), _unit(rng, 30, 16)
    for top in (0, 7):
        mu, sd = cohort_stats(emb, cohort, top=top, batch=4)
        wmu, wsd = _np_stats(emb, cohort, top)
        np.testing.assert_allclose(mu, wmu, rtol=1e-5)
        np.testing.assert_allclose(sd, wsd, rtol=1e-4)


def test_snorm_search_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    gal, probe, cohort = (_unit(rng, 20, 16), _unit(rng, 7, 16),
                          _unit(rng, 25, 16))
    ps = cohort_stats(probe, cohort, top=10)
    gs = cohort_stats(gal, cohort, top=10)
    ix, sc = top_k_matches(gal, probe, k=4, probe_stats=ps,
                           gallery_stats=gs)
    want = _np_snorm(probe @ gal.T, ps, gs)
    worder = np.argsort(-want, axis=1)[:, :4]
    np.testing.assert_array_equal(ix, worder)
    np.testing.assert_allclose(
        sc, np.take_along_axis(want, worder, axis=1), rtol=1e-4)


def test_snorm_can_rerank_but_probe_term_cannot():
    """The gallery-side t-norm term reranks; with constant gallery
    stats the ranking must equal the raw cosine ranking (the probe-side
    z-norm is a per-row monotone affine)."""
    rng = np.random.default_rng(2)
    gal, probe, cohort = (_unit(rng, 30, 16), _unit(rng, 8, 16),
                          _unit(rng, 40, 16))
    raw_ix, _ = top_k_matches(gal, probe, k=5)
    ps = cohort_stats(probe, cohort, top=10)
    const_gs = (np.zeros(30, np.float32), np.ones(30, np.float32))
    ix, _ = top_k_matches(gal, probe, k=5, probe_stats=ps,
                          gallery_stats=const_gs)
    np.testing.assert_array_equal(ix, raw_ix)
    # real gallery stats rerank at least one probe on random data
    gs = cohort_stats(gal, cohort, top=10)
    ix2, _ = top_k_matches(gal, probe, k=5, probe_stats=ps,
                           gallery_stats=gs)
    assert (ix2 != raw_ix).any()


def test_sharded_snorm_matches_single_device():
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(3)
    gal, probe, cohort = (_unit(rng, 37, 16), _unit(rng, 9, 16),
                          _unit(rng, 20, 16))
    ps = cohort_stats(probe, cohort, top=8)
    gs = cohort_stats(gal, cohort, top=8)
    ix1, sc1 = top_k_matches(gal, probe, k=6, probe_stats=ps,
                             gallery_stats=gs)
    ix8, sc8 = sharded_top_k_matches(gal, probe, k=6,
                                     mesh=create_mesh(),
                                     probe_stats=ps, gallery_stats=gs)
    np.testing.assert_allclose(sc8, sc1, rtol=1e-4)
    np.testing.assert_array_equal(ix8, ix1)


def test_stats_must_come_in_pairs():
    rng = np.random.default_rng(4)
    gal, probe = _unit(rng, 10, 8), _unit(rng, 3, 8)
    with pytest.raises(ValueError, match="BOTH"):
        top_k_matches(gal, probe, k=2,
                      probe_stats=(np.zeros(3), np.ones(3)))


@pytest.mark.mid
def test_cli_search_with_cohort(tmp_path):
    rng = np.random.default_rng(5)
    np.save(tmp_path / "gal.npy", _unit(rng, 12, 8))
    np.save(tmp_path / "probe.npy", _unit(rng, 5, 8))
    np.save(tmp_path / "cohort.npy", _unit(rng, 15, 8))
    out = tmp_path / "matches.npz"
    env = dict(os.environ, TFFT_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.search",
         f"--gallery={tmp_path/'gal.npy'}",
         f"--probe={tmp_path/'probe.npy'}",
         f"--cohort={tmp_path/'cohort.npy'}", "--snorm_top=6",
         "--k=3", f"--output={out}"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["snorm"] == {"cohort": 15, "top": 6}
    data = np.load(out)
    assert data["indices"].shape == (5, 3)
