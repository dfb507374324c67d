"""The acceptance runbook (tools/acceptance.py) end-to-end on synthetic
stand-in fixtures (VERDICT r3 #1): every stage and every gate executes
TODAY, so the day real LFW data / the reference checkpoint land, the
BASELINE contract closes in one invocation with zero new code.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ACCEPT = os.path.join(REPO, "tools", "acceptance.py")


def _run(args, **env_extra):
    env = dict(os.environ)
    env["TFFT_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    env.update(env_extra)
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=env, cwd=REPO)


def _make_lfw_dir(root):
    """Six identities x 4 photos in the official LFW layout
    (Name/Name_0001.jpg) + a view-2-style pairs.txt."""
    from PIL import Image

    rng = np.random.default_rng(0)
    names = [f"Person_{chr(65 + i)}" for i in range(6)]
    for n in names:
        d = root / n
        d.mkdir(parents=True)
        # identity signal: a per-person mean color + noise, so even a
        # barely-trained tiny net orders same/diff pairs sensibly
        base = rng.integers(40, 215, (3,))
        for k in range(1, 5):
            arr = np.clip(base[None, None, :] +
                          rng.integers(-40, 40, (20, 20, 3)),
                          0, 255).astype(np.uint8)
            Image.fromarray(arr).save(
                str(d / f"{n}_{k:04d}.jpg"), "JPEG", quality=95)
    # two single-image identities: never in pairs.txt, but they give
    # the --identification stage its open-set non-mated probe set
    for n in ("Distractor_Y", "Distractor_Z"):
        d = root / n
        d.mkdir(parents=True)
        base = rng.integers(40, 215, (3,))
        arr = np.clip(base[None, None, :] +
                      rng.integers(-40, 40, (20, 20, 3)),
                      0, 255).astype(np.uint8)
        Image.fromarray(arr).save(
            str(d / f"{n}_0001.jpg"), "JPEG", quality=95)
    lines = ["10\t300"]  # official header line (skipped by the parser)
    for i, n in enumerate(names):
        lines.append(f"{n}\t1\t2")                       # matched
        m = names[(i + 1) % len(names)]
        lines.append(f"{n}\t3\t{m}\t4")                  # mismatched
    pairs = root.parent / "pairs.txt"   # NOT inside the image dir
    pairs.write_text("\n".join(lines) + "\n")
    return str(root), str(pairs)


MODEL = ["--network=resnet_tiny", "--embedding_dim=16",
         "--image_size=12", "--no-bf16", "--batch=8", "--folds=4"]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A 2-step resnet_tiny checkpoint + the LFW-layout fixture dir."""
    tmp = tmp_path_factory.mktemp("accept")
    data_dir, pairs = _make_lfw_dir(tmp / "lfw")
    # pack once just to train on (acceptance re-packs its own shard)
    r = _run(["-m", "tf_face_toolbox_tpu.cli.pack", "--root=" + data_dir,
              "--list=" + _write_list(tmp, data_dir),
              "--output=" + str(tmp / "train.faceshard")])
    assert r.returncode == 0, r.stderr
    run_dir = str(tmp / "run")
    r = _run(["-m", "tf_face_toolbox_tpu.cli.train",
              "--data=" + str(tmp / "train.faceshard"),
              "--train_dir=" + run_dir, "--network=resnet_tiny",
              "--embedding_dim=16", "--image_size=12", "--crop_from=16",
              "--global_batch=8", "--num_steps=2", "--save_every=2",
              "--log_every=1", "--nobf16"])
    assert r.returncode == 0, r.stdout + r.stderr
    return data_dir, pairs, run_dir, tmp


def _write_list(tmp, data_dir):
    lines = []
    people = sorted(os.listdir(data_dir))
    for label, person in enumerate(people):
        for f in sorted(os.listdir(os.path.join(data_dir, person))):
            lines.append(f"{person}/{f} {label}")
    p = tmp / "train_list.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


@pytest.mark.slow
def test_acceptance_no_reference_then_pass_then_fail(trained):
    data_dir, pairs, run_dir, tmp = trained

    # 1) no reference artifacts: pipeline must PASS end-to-end and exit
    #    2 (NO_REFERENCE), reporting the LFW accuracy.
    w1 = str(tmp / "w1")
    r = _run([ACCEPT, "--data=" + data_dir, "--pairs=" + pairs,
              "--checkpoint_dir=" + run_dir, "--workdir=" + w1] + MODEL)
    assert r.returncode == 2, r.stdout + r.stderr
    rep = json.load(open(os.path.join(w1, "acceptance_report.json")))
    assert rep["status"] == "NO_REFERENCE"
    assert 0.0 <= rep["lfw_accuracy"] <= 1.0
    emb = os.path.join(w1, "emb_primary.npy")
    assert os.path.exists(emb)

    # 2) golden reference embeddings = our own output (the stand-in for
    #    the real reference dump): both bars must PASS, exit 0.
    w2 = str(tmp / "w2")
    r = _run([ACCEPT, "--data=" + data_dir, "--pairs=" + pairs,
              "--checkpoint_dir=" + run_dir, "--workdir=" + w2,
              "--reference_embeddings=" + emb] + MODEL)
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.load(open(os.path.join(w2, "acceptance_report.json")))
    assert rep["status"] == "PASS"
    gates = {g["gate"]: g for g in rep["gates"]}
    assert gates["per_face_cosine_vs_reference"]["pass"]
    assert gates["per_face_cosine_vs_reference"]["value"] >= 0.9999
    assert gates["lfw_accuracy_vs_reference"]["pass"]

    # 3) a perturbed reference (what a genuinely different model would
    #    produce): the cosine gate must FAIL, exit 1.
    bad = str(tmp / "bad_ref.npy")
    e = np.load(emb)
    rng = np.random.default_rng(1)
    e = e + 0.3 * rng.standard_normal(e.shape).astype(e.dtype)
    np.save(bad, e / np.linalg.norm(e, axis=1, keepdims=True))
    w3 = str(tmp / "w3")
    r = _run([ACCEPT, "--data=" + data_dir, "--pairs=" + pairs,
              "--checkpoint_dir=" + run_dir, "--workdir=" + w3,
              "--reference_embeddings=" + bad] + MODEL)
    assert r.returncode == 1, r.stdout + r.stderr
    rep = json.load(open(os.path.join(w3, "acceptance_report.json")))
    assert rep["status"] == "FAIL"
    gates = {g["gate"]: g for g in rep["gates"]}
    assert not gates["per_face_cosine_vs_reference"]["pass"]


@pytest.mark.slow
def test_acceptance_int8_and_compare_gates(trained):
    """The serving-mode gates: static-int8 of the same weights and the
    CONFIG_6-style compare-model gate, one invocation, all evaluable."""
    data_dir, pairs, run_dir, tmp = trained
    w = str(tmp / "w_int8")
    # compare model = the same checkpoint (acc_compare == acc_primary:
    # the gate's arithmetic and plumbing are what's under test)
    r = _run([ACCEPT, "--data=" + data_dir, "--pairs=" + pairs,
              "--checkpoint_dir=" + run_dir, "--workdir=" + w,
              "--int8",
              "--compare_checkpoint_dir=" + run_dir,
              "--compare_network=resnet_tiny",
              "--compare_embedding_dim=16", "--compare_image_size=12",
              ] + MODEL)
    # no reference artifact given -> serving gates run but bars A/B stay
    # pending: exit 2 (NO_REFERENCE). Exit 1 allowed: the random tiny
    # net's int8 PTQ gate may legitimately fail.
    assert r.returncode in (1, 2), r.stdout + r.stderr
    rep = json.load(open(os.path.join(w, "acceptance_report.json")))
    gates = {g["gate"]: g for g in rep["gates"]}
    # compare == primary -> delta 0, must pass
    assert gates["compare_accuracy_vs_primary"]["pass"]
    assert abs(gates["compare_accuracy_vs_primary"]["value"]) < 1e-9
    # int8 gates ran and produced finite stats (pass/fail depends on
    # the random tiny net's PTQ behavior; evaluability is the contract)
    assert "int8_cosine_vs_fp" in gates
    assert np.isfinite(gates["int8_cosine_vs_fp"]["value"])
    assert "int8_accuracy_vs_fp" in gates
    assert "eval_int8" in rep and "eval_compare" in rep


@pytest.mark.slow
def test_acceptance_identification_gates(trained):
    """The 1:N stage (VERDICT r4 #7): split -> CMC@1 + DIR@FAR ->
    absolute bars without a reference, delta gates with one."""
    data_dir, pairs, run_dir, tmp = trained
    IDENT = ["--identification", "--identification_far=0.5"]

    # 1) absolute serving-mode bars, no reference artifact: the stage
    #    must run, the bars (set to 0.0) must pass, exit 2.
    w = str(tmp / "w_ident")
    r = _run([ACCEPT, "--data=" + data_dir, "--pairs=" + pairs,
              "--checkpoint_dir=" + run_dir, "--workdir=" + w,
              "--min_cmc1=0.0", "--min_dir=0.0"] + IDENT + MODEL)
    assert r.returncode == 2, r.stdout + r.stderr
    rep = json.load(open(os.path.join(w, "acceptance_report.json")))
    assert rep["status"] == "NO_REFERENCE"
    ev = rep["identification_primary"]
    # 6 multi-image identities enroll; their 18 other photos are mated
    # probes; the 2 single-image distractors are the non-mated set
    assert ev["gallery"] == 6
    assert ev["probes"] == 18
    assert ev["skipped"] == 2
    assert "dir@far=0.5" in ev["open_set"]
    gates = {g["gate"]: g for g in rep["gates"]}
    assert gates["identification_cmc@1"]["pass"]
    assert gates["identification_dir@far=0.5"]["pass"]

    # 2) reference = our own embeddings: the vs_reference deltas are
    #    exactly 0, every gate passes, exit 0.
    emb = os.path.join(w, "emb_primary.npy")
    w2 = str(tmp / "w_ident2")
    r = _run([ACCEPT, "--data=" + data_dir, "--pairs=" + pairs,
              "--checkpoint_dir=" + run_dir, "--workdir=" + w2,
              "--reference_embeddings=" + emb] + IDENT + MODEL)
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.load(open(os.path.join(w2, "acceptance_report.json")))
    assert rep["status"] == "PASS"
    gates = {g["gate"]: g for g in rep["gates"]}
    assert gates["identification_cmc1_vs_reference"]["pass"]
    assert gates["identification_cmc1_vs_reference"]["value"] == 0.0
    assert gates["identification_dir@far=0.5_vs_reference"]["pass"]
    assert gates["identification_dir@far=0.5_vs_reference"]["value"] == 0.0


def test_identification_split(tmp_path):
    """First image per multi-image identity -> gallery; the rest ->
    probes; single-image identities -> (non-mated) probes."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import acceptance

    lst = tmp_path / "list.txt"
    lst.write_text("a/1.jpg 0\na/2.jpg 0\nb/1.jpg 1\n"
                   "c/1.jpg 2\nc/2.jpg 2\nc/3.jpg 2\n")
    g, p = acceptance.identification_split(str(lst))
    assert g == [0, 3]
    assert p == [1, 2, 4, 5]

    solo = tmp_path / "solo.txt"
    solo.write_text("a/1.jpg 0\nb/1.jpg 1\n")
    with pytest.raises(SystemExit, match="single image"):
        acceptance.identification_split(str(solo))


def test_build_list_lfw_layout(tmp_path):
    """build_list: LFW layout -> 'relpath label' lines, identities
    labeled in sorted order; flat dirs fall back to stem grouping."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import acceptance

    from PIL import Image

    for person, k in (("B_Person", 2), ("A_Person", 1)):
        d = tmp_path / person
        d.mkdir()
        for i in range(1, k + 1):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
                str(d / f"{person}_{i:04d}.jpg"))
    lst = tmp_path / "list.txt"
    n = acceptance.build_list(str(tmp_path), str(lst))
    assert n == 3
    lines = lst.read_text().splitlines()
    assert lines[0] == "A_Person/A_Person_0001.jpg 0"
    assert lines[1] == "B_Person/B_Person_0001.jpg 1"
    assert lines[2] == "B_Person/B_Person_0002.jpg 1"


def test_cosine_stats_shape_mismatch(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import acceptance

    a, b = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    np.save(a, np.eye(4, 8, dtype=np.float32))
    np.save(b, np.eye(5, 8, dtype=np.float32))
    with pytest.raises(SystemExit, match="mismatch"):
        acceptance.cosine_stats(a, b)
    np.save(b, np.eye(4, 8, dtype=np.float32))
    s = acceptance.cosine_stats(a, b)
    assert s["min"] == pytest.approx(1.0)
