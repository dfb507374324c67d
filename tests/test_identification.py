"""CMC identification eval (ops/verification.cmc_curve + CLI)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_CPU_ENV = dict(os.environ, TFFT_PLATFORM="cpu")  # keep CLI subprocesses
# off the TPU tunnel (slow remote compiles; same recipe as test_cli)

from tf_face_toolbox_tpu.ops.verification import (
    cmc_curve,
    identification_rank_k,
)


def _reference_cmc(gallery, glabels, probe, plabels, ks):
    """Naive argsort oracle (what cmc_curve avoids doing on host)."""
    g = gallery / np.linalg.norm(gallery, axis=1, keepdims=True)
    p = probe / np.linalg.norm(probe, axis=1, keepdims=True)
    sims = p @ g.T
    ranks = []
    for i in range(len(p)):
        if plabels[i] not in glabels:
            continue
        order = np.argsort(-sims[i], kind="stable")
        hit = np.nonzero(glabels[order] == plabels[i])[0][0]
        ranks.append(hit + 1)
    ranks = np.asarray(ranks)
    return {k: float((ranks <= k).mean()) for k in ks}


def test_cmc_matches_argsort_oracle():
    rng = np.random.default_rng(0)
    gallery = rng.normal(size=(40, 16)).astype(np.float32)
    glabels = rng.integers(0, 12, 40)
    probe = rng.normal(size=(25, 16)).astype(np.float32)
    plabels = rng.integers(0, 15, 25)  # some identities not in gallery
    # make a few probes near their gallery identity so rank-1 is nonzero
    for i in range(8):
        j = rng.integers(0, 40)
        probe[i] = gallery[j] + 0.01 * rng.normal(size=16)
        plabels[i] = glabels[j]
    ks = (1, 3, 5, 40)
    report = cmc_curve(gallery, glabels, probe, plabels, ranks=ks,
                       batch=7)  # batch < P exercises streaming
    want = _reference_cmc(gallery, glabels, probe, plabels, ks)
    for k in ks:
        assert abs(report["cmc"][k] - want[k]) < 1e-6, k
    assert report["cmc"][40] == 1.0  # closed set: everyone ranks
    assert report["skipped"] == int(
        (~np.isin(plabels, glabels)).sum())
    assert report["probes"] + report["skipped"] == len(probe)
    # rank-1 agrees with the existing top-k hit-rate helper on the
    # rankable subset
    m = np.isin(plabels, glabels)
    r1 = identification_rank_k(gallery, glabels, probe[m], plabels[m], k=1)
    assert abs(report["cmc"][1] - r1) < 1e-6


def test_cmc_all_probes_absent():
    gallery = np.eye(4, dtype=np.float32)
    report = cmc_curve(gallery, np.arange(4), gallery, np.arange(4) + 10)
    assert report["probes"] == 0 and report["skipped"] == 4
    assert np.isnan(report["cmc"][1])


@pytest.mark.mid
def test_cli_eval_identification(tmp_path):
    rng = np.random.default_rng(1)
    ids = np.arange(6)
    proto = rng.normal(size=(6, 8)).astype(np.float32)
    gallery = proto + 0.01 * rng.normal(size=(6, 8)).astype(np.float32)
    probe = proto + 0.01 * rng.normal(size=(6, 8)).astype(np.float32)
    np.save(tmp_path / "gal.npy", gallery)
    np.save(tmp_path / "probe.npy", probe)
    for name, labs in (("gal_list.txt", ids), ("probe_list.txt", ids)):
        (tmp_path / name).write_text(
            "".join(f"img_{i}.jpg {l}\n" for i, l in enumerate(labs)))
    r = subprocess.run(
        [sys.executable, "-m",
         "tf_face_toolbox_tpu.cli.eval_identification",
         f"--gallery={tmp_path}/gal.npy",
         f"--gallery_list={tmp_path}/gal_list.txt",
         f"--probe={tmp_path}/probe.npy",
         f"--probe_list={tmp_path}/probe_list.txt",
         "--ranks=1,2"],
        capture_output=True, text=True, env=_CPU_ENV)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout)
    assert report["cmc"]["1"] == 1.0  # distinct prototypes: all hit
    assert report["probes"] == 6 and report["skipped"] == 0


@pytest.mark.mid
def test_cli_length_mismatch_exits(tmp_path):
    np.save(tmp_path / "gal.npy", np.eye(3, dtype=np.float32))
    np.save(tmp_path / "probe.npy", np.eye(3, dtype=np.float32))
    (tmp_path / "gal_list.txt").write_text("a.jpg 0\nb.jpg 1\n")  # 2 != 3
    (tmp_path / "probe_list.txt").write_text(
        "a.jpg 0\nb.jpg 1\nc.jpg 2\n")
    r = subprocess.run(
        [sys.executable, "-m",
         "tf_face_toolbox_tpu.cli.eval_identification",
         f"--gallery={tmp_path}/gal.npy",
         f"--gallery_list={tmp_path}/gal_list.txt",
         f"--probe={tmp_path}/probe.npy",
         f"--probe_list={tmp_path}/probe_list.txt"],
        capture_output=True, text=True, env=_CPU_ENV)
    assert r.returncode != 0
    assert "embeddings vs" in r.stderr


def test_load_labels_paths_with_spaces(tmp_path):
    """Label parse matches cli.pack (rsplit on the LAST space)."""
    from tf_face_toolbox_tpu.cli.eval_identification import load_labels

    p = tmp_path / "list.txt"
    p.write_text("my photos/img 12 a.jpg 7\nplain.jpg 3\n\n")
    np.testing.assert_array_equal(load_labels(str(p)), [7, 3])
    bad = tmp_path / "bad.txt"
    bad.write_text("img.jpg notanint\n")
    import pytest
    with pytest.raises(ValueError, match="trailing integer"):
        load_labels(str(bad))


def test_top_k_matches_oracle():
    """Device top-k equals a numpy cosine argsort, scores descending."""
    from tf_face_toolbox_tpu.ops.verification import top_k_matches

    rng = np.random.default_rng(0)
    g = rng.normal(size=(50, 16)).astype(np.float32)
    p = rng.normal(size=(11, 16)).astype(np.float32)
    idx, sc = top_k_matches(g, p, k=4, batch=4)  # multiple chunks
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    pn = p / np.linalg.norm(p, axis=1, keepdims=True)
    sims = pn @ gn.T
    want_idx = np.argsort(-sims, axis=1)[:, :4]
    np.testing.assert_array_equal(idx, want_idx)
    np.testing.assert_allclose(
        sc, np.take_along_axis(sims, want_idx, axis=1), atol=1e-5)
    assert (np.diff(sc, axis=1) <= 1e-7).all()
    with pytest.raises(ValueError, match="exceeds gallery"):
        top_k_matches(g, p, k=51)


@pytest.mark.mid
def test_cli_search_end_to_end(tmp_path):
    """Search CLI: top-1 label recovers the gallery identity for
    near-duplicate probes; below-threshold probes come back unknown."""
    import json
    import subprocess
    import sys

    rng = np.random.default_rng(1)
    proto = rng.normal(size=(6, 16)).astype(np.float32)
    gallery = proto + 0.01 * rng.normal(size=(6, 16)).astype(np.float32)
    probes = np.concatenate([
        proto[:4] + 0.01 * rng.normal(size=(4, 16)).astype(np.float32),
        rng.normal(size=(2, 16)).astype(np.float32)])  # impostors
    np.save(tmp_path / "gal.npy", gallery)
    np.save(tmp_path / "probe.npy", probes)
    (tmp_path / "gal_list.txt").write_text(
        "\n".join(f"img{i}.jpg {100 + i}" for i in range(6)) + "\n")

    env = dict(os.environ, TFFT_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.search",
         f"--gallery={tmp_path/'gal.npy'}",
         f"--probe={tmp_path/'probe.npy'}",
         f"--gallery_list={tmp_path/'gal_list.txt'}",
         "--k=3", "--threshold=0.8",
         f"--output={tmp_path/'m.npz'}"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["probes"] == 6 and summary["k"] == 3
    out = np.load(tmp_path / "m.npz")
    assert out["indices"].shape == (6, 3)
    np.testing.assert_array_equal(out["labels"][:4, 0],
                                  [100, 101, 102, 103])
    assert (out["labels"][4:, 0] == -1).all()  # impostors -> unknown


def test_sharded_top_k_matches_equals_single_device():
    """Gallery sharded over the 8-device mesh: scores exactly equal the
    single-device ranking, indices equal wherever scores are untied —
    including a ragged gallery (padding must never place) and
    k > shard size."""
    from tf_face_toolbox_tpu.ops.verification import (
        sharded_top_k_matches, top_k_matches)
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(2)
    g = rng.normal(size=(43, 16)).astype(np.float32)   # ragged over 8
    p = rng.normal(size=(9, 16)).astype(np.float32)
    mesh = create_mesh()
    for k in (3, 7):  # 7 > ceil(43/8) = 6: the cross-shard merge path
        idx1, sc1 = top_k_matches(g, p, k=k)
        idx8, sc8 = sharded_top_k_matches(g, p, k=k, mesh=mesh,
                                          batch=4)
        np.testing.assert_allclose(sc8, sc1, atol=1e-5)
        np.testing.assert_array_equal(idx8, idx1)  # continuous scores:
        # ties have measure zero with random gaussians
        assert (idx8 < 43).all()                   # padding never wins


def _reference_dir(gallery, glabels, probe, plabels, far, rank):
    """Naive host oracle for the open-set protocol."""
    g = gallery / np.linalg.norm(gallery, axis=1, keepdims=True)
    p = probe / np.linalg.norm(probe, axis=1, keepdims=True)
    sims = p @ g.T
    mated = np.isin(plabels, glabels)
    neg = np.sort(sims[~mated].max(axis=1))[::-1]
    k = int(np.floor(far * len(neg)))
    if k == 0 and far > 0 and 1 / len(neg) > far:
        return float("nan"), None
    thr = neg[k] if k < len(neg) else -np.inf
    hits = 0
    for i in np.nonzero(mated)[0]:
        order = np.argsort(-sims[i], kind="stable")
        pos = np.nonzero(glabels[order] == plabels[i])[0][0]
        best_correct = sims[i][glabels == plabels[i]].max()
        if pos + 1 <= rank and best_correct > thr:
            hits += 1
    return hits / mated.sum(), thr


@pytest.mark.mid
def test_dir_at_far_matches_oracle():
    from tf_face_toolbox_tpu.ops.verification import dir_at_far

    rng = np.random.default_rng(7)
    gallery = rng.normal(size=(30, 16)).astype(np.float32)
    glabels = np.arange(30) % 10          # 10 enrolled identities
    # mated probes near their identity (varying quality), plus
    # distractor probes with identities 100.. (never enrolled)
    probe = np.concatenate([
        gallery[rng.integers(0, 30, 20)] +
        0.3 * rng.normal(size=(20, 16)).astype(np.float32),
        rng.normal(size=(25, 16)).astype(np.float32)])
    plabels = np.concatenate([
        glabels[rng.integers(0, 30, 20)], 100 + np.arange(25)])
    # re-derive mated labels consistently with the drawn rows
    probe[:20] = gallery[:20] + 0.3 * rng.normal(
        size=(20, 16)).astype(np.float32)
    plabels[:20] = glabels[:20]

    for far, rank in ((0.2, 1), (0.04, 1), (0.2, 3)):
        out = dir_at_far(gallery, glabels, probe, plabels,
                         fars=(far,), rank=rank, batch=6)
        want, thr = _reference_dir(gallery, glabels, probe, plabels,
                                   far, rank)
        got = out[f"dir@far={far:g}"]
        assert abs(got - want) < 1e-9, (far, rank, got, want)
        if thr is not None:
            assert abs(out[f"thr@far={far:g}"] - thr) < 1e-6
    out = dir_at_far(gallery, glabels, probe, plabels,
                     fars=(1e-4,), rank=1)   # finer than 1/25
    assert np.isnan(out["dir@far=0.0001"])
    assert out["mated"] == 20 and out["nonmated"] == 25
    # FAR→1 limit equals the closed-set rank-1 hit rate over mated
    full = dir_at_far(gallery, glabels, probe, plabels, fars=(1.0,))
    assert abs(full["dir@far=1"] - full["dir_closed_set"]) < 1e-9


def test_dir_at_far_all_mated_warns_nan():
    from tf_face_toolbox_tpu.ops.verification import dir_at_far

    g = np.eye(4, dtype=np.float32)
    with pytest.warns(UserWarning, match="non-mated"):
        out = dir_at_far(g, np.arange(4), g, np.arange(4),
                         fars=(0.1,))
    assert np.isnan(out["dir@far=0.1"])
    assert out["dir_closed_set"] == 1.0


@pytest.mark.mid
def test_cli_open_set_report(tmp_path):
    rng = np.random.default_rng(3)
    proto = rng.normal(size=(6, 8)).astype(np.float32)
    gallery = proto + 0.01 * rng.normal(size=(6, 8)).astype(np.float32)
    # 6 mated probes + 4 distractors with un-enrolled identities
    probe = np.concatenate([
        proto + 0.01 * rng.normal(size=(6, 8)).astype(np.float32),
        rng.normal(size=(4, 8)).astype(np.float32)])
    np.save(tmp_path / "gal.npy", gallery)
    np.save(tmp_path / "probe.npy", probe)
    (tmp_path / "gal_list.txt").write_text(
        "".join(f"g{i}.jpg {i}\n" for i in range(6)))
    (tmp_path / "probe_list.txt").write_text(
        "".join(f"p{i}.jpg {l}\n"
                for i, l in enumerate(list(range(6)) + [90, 91, 92, 93])))
    r = subprocess.run(
        [sys.executable, "-m",
         "tf_face_toolbox_tpu.cli.eval_identification",
         f"--gallery={tmp_path}/gal.npy",
         f"--gallery_list={tmp_path}/gal_list.txt",
         f"--probe={tmp_path}/probe.npy",
         f"--probe_list={tmp_path}/probe_list.txt",
         "--ranks=1", "--far=0.5,0.25"],
        capture_output=True, text=True, env=_CPU_ENV)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout)
    assert report["skipped"] == 4
    os_rep = report["open_set"]
    assert os_rep["mated"] == 6 and os_rep["nonmated"] == 4
    # random distractors vs tight prototype matches: everyone clears
    # the 50%-FAR threshold
    assert os_rep["dir@far=0.5"] == 1.0
    assert os_rep["dir_closed_set"] == 1.0


def test_shared_stats_match_direct_calls():
    """identification_stats fed to both protocols reproduces each
    function's own sweep exactly (what cli.eval_identification does)."""
    from tf_face_toolbox_tpu.ops.verification import (
        cmc_curve,
        dir_at_far,
        identification_stats,
    )

    rng = np.random.default_rng(9)
    gallery = rng.normal(size=(20, 8)).astype(np.float32)
    glabels = np.arange(20) % 7
    probe = rng.normal(size=(15, 8)).astype(np.float32)
    plabels = np.concatenate([np.arange(10) % 7, 100 + np.arange(5)])
    stats = identification_stats(gallery, glabels, probe, plabels,
                                 batch=4)
    assert cmc_curve(gallery, glabels, probe, plabels, stats=stats) \
        == cmc_curve(gallery, glabels, probe, plabels, batch=4)
    assert dir_at_far(gallery, glabels, probe, plabels,
                      fars=(0.4,), stats=stats) \
        == dir_at_far(gallery, glabels, probe, plabels,
                      fars=(0.4,), batch=4)
