"""End-to-end CLI test: pack → train → extract → eval_lfw.

Drives the real command-line entry points as subprocesses (the flag
namespaces collide in-process by design — one binary per entry point,
like the reference's separate train.py / features.py).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _run(args, **env_extra):
    env = dict(os.environ)
    env["TFFT_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    env.update(env_extra)
    r = subprocess.run([sys.executable, "-m"] + args, capture_output=True,
                       text=True, env=env, cwd=os.path.dirname(
                           os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, f"{args} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@pytest.mark.slow
def test_cli_pipeline(tmp_path):
    from PIL import Image

    # --- build a tiny labeled image tree + list file ------------------
    rng = np.random.default_rng(0)
    lines = []
    for i in range(24):
        label = i % 6
        y, x = np.mgrid[0:24, 0:24]
        arr = ((y * (label + 1) * 3 + x * 2 + i) % 256).astype(np.uint8)
        arr = np.stack([arr, arr[::-1], arr.T], -1)
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(arr).save(str(p), "JPEG", quality=95)
        lines.append(f"img{i}.jpg {label}")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    shard = str(tmp_path / "data.faceshard")

    # --- pack ----------------------------------------------------------
    out = _run(["tf_face_toolbox_tpu.cli.pack",
                f"--list={tmp_path/'list.txt'}", f"--root={tmp_path}",
                f"--output={shard}"])
    assert "packed 24 records" in out

    # pairs over record indices for the in-training eval hook
    # (10 folds need a multiple of 10)
    pair_lines = [f"{i} {i} 1" for i in range(10)]
    pair_lines += [f"{i} {(i + 1) % 24} 0" for i in range(10)]
    eval_pairs = tmp_path / "train_eval_pairs.txt"
    eval_pairs.write_text("\n".join(pair_lines) + "\n")

    # --- train (tiny net, 3 steps, checkpointing, EMA, eval hook) ------
    train_dir = str(tmp_path / "run")
    out = _run(["tf_face_toolbox_tpu.cli.train",
                f"--data={shard}", f"--train_dir={train_dir}",
                "--network=resnet_tiny", "--embedding_dim=16",
                "--image_size=12", "--crop_from=16", "--global_batch=8",
                "--num_steps=3", "--save_every=3", "--log_every=1",
                "--nobf16", "--base_lr=0.01", "--ema_decay=0.9",
                f"--eval_data={shard}", f"--eval_pairs={eval_pairs}",
                "--eval_every=2"])
    assert "done: step=3" in out

    # --- resume: 2 more steps from the checkpoint ----------------------
    out = _run(["tf_face_toolbox_tpu.cli.train",
                f"--data={shard}", f"--train_dir={train_dir}",
                "--network=resnet_tiny", "--embedding_dim=16",
                "--image_size=12", "--crop_from=16", "--global_batch=8",
                "--num_steps=5", "--save_every=5", "--log_every=1",
                "--nobf16", "--base_lr=0.01", "--ema_decay=0.9"])
    assert "done: step=5" in out

    # --- extract --------------------------------------------------------
    emb_path = str(tmp_path / "emb.npy")
    out = _run(["tf_face_toolbox_tpu.cli.extract",
                f"--checkpoint_dir={train_dir}", f"--data={shard}",
                f"--output={emb_path}", "--network=resnet_tiny",
                "--embedding_dim=16", "--image_size=12", "--batch=8",
                "--nobf16"])
    assert "wrote (24, 16)" in out
    emb = np.load(emb_path)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)

    # --- resumable chunked extract (fingerprinted sidecar) ---------------
    embc_path = str(tmp_path / "embc.npy")
    out = _run(["tf_face_toolbox_tpu.cli.extract",
                f"--checkpoint_dir={train_dir}", f"--data={shard}",
                f"--output={embc_path}", "--network=resnet_tiny",
                "--embedding_dim=16", "--image_size=12", "--batch=8",
                "--nobf16", "--chunk_rows=16"])
    assert "wrote rows [0:24) of the (24, 16) output" in out
    np.testing.assert_allclose(np.load(embc_path), emb, rtol=1e-5)
    import json as _json
    side = _json.load(open(embc_path + ".progress.json"))
    assert "w=" in side["fingerprint"]  # weight digest recorded

    # --- extract through the BN-folded serving engine -------------------
    embf_path = str(tmp_path / "embf.npy")
    out = _run(["tf_face_toolbox_tpu.cli.extract",
                f"--checkpoint_dir={train_dir}", f"--data={shard}",
                f"--output={embf_path}", "--network=resnet_tiny",
                "--embedding_dim=16", "--image_size=12", "--batch=8",
                "--nobf16", "--engine=folded"])
    assert "wrote (24, 16)" in out
    embf = np.load(embf_path)
    cosf = (emb * embf).sum(1)
    assert cosf.min() >= 0.999, cosf  # fold is exact modulo f32 assoc

    # --- data-parallel extract over the 8-device CPU mesh ---------------
    # batch 10 over 24 records: the 4-row tail does not divide the mesh,
    # exercising make_extract_fn's ragged pad through the CLI
    embdp_path = str(tmp_path / "embdp.npy")
    out = _run(["tf_face_toolbox_tpu.cli.extract",
                f"--checkpoint_dir={train_dir}", f"--data={shard}",
                f"--output={embdp_path}", "--network=resnet_tiny",
                "--embedding_dim=16", "--image_size=12", "--batch=10",
                "--nobf16", "--data_parallel"])
    assert "wrote (24, 16)" in out
    np.testing.assert_allclose(np.load(embdp_path), emb, atol=1e-4)

    # --- extract, static-int8 serving mode ------------------------------
    emb8_path = str(tmp_path / "emb8.npy")
    out = _run(["tf_face_toolbox_tpu.cli.extract",
                f"--checkpoint_dir={train_dir}", f"--data={shard}",
                f"--output={emb8_path}", "--network=resnet_tiny",
                "--embedding_dim=16", "--image_size=12", "--batch=8",
                "--nobf16", "--quant_mode=static",
                "--calibrate_batches=2"])
    assert "wrote (24, 16)" in out
    emb8 = np.load(emb8_path)
    cos = (emb * emb8).sum(1)
    assert cos.min() >= 0.98, cos  # PTQ gate vs the fp extraction

    # --- eval_lfw --------------------------------------------------------
    # pairs: same-image pairs (sim == 1) vs cross-label pairs
    pair_lines = []
    for i in range(10):
        pair_lines.append(f"{i} {i} 1")
        pair_lines.append(f"{i} {(i + 1) % 24} 0")
    pairs = tmp_path / "pairs.txt"
    pairs.write_text("\n".join(pair_lines) + "\n")
    out = _run(["tf_face_toolbox_tpu.cli.eval_lfw",
                f"--embeddings={emb_path}", f"--pairs={pairs}",
                "--folds=10"])
    report = json.loads(out)
    assert 0.5 <= report["accuracy_mean"] <= 1.0


def test_convert_tfrecord_cli(tmp_path):
    """The migration CLI end-to-end (TFRecord → FaceShard)."""
    tf = pytest.importorskip("tensorflow")
    from PIL import Image
    import io as _io
    with tf.io.TFRecordWriter(str(tmp_path / "d.tfrecord")) as w:
        for i in range(3):
            arr = (np.mgrid[0:8, 0:8][0] * (i + 9) % 256).astype(np.uint8)
            arr = np.stack([arr] * 3, -1)
            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG")
            ex = tf.train.Example(features=tf.train.Features(feature={
                "image/encoded": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[buf.getvalue()])),
                "image/label": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[i])),
            }))
            w.write(ex.SerializeToString())
    out = _run(["tf_face_toolbox_tpu.cli.convert_tfrecord",
                f"--tfrecords={tmp_path/'d.tfrecord'}",
                f"--output={tmp_path/'d.faceshard'}"])
    assert "converted 3 records" in out


@pytest.mark.slow
def test_cli_train_dct_loader(tmp_path):
    """pack --recode_size → train --loader=native_dct: the
    entropy-decode-only input path through the real CLI."""
    from PIL import Image

    rng = np.random.default_rng(1)
    lines = []
    for i in range(16):
        arr = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"i{i}.jpg"),
                                  "JPEG", quality=95)
        lines.append(f"i{i}.jpg {i % 4}")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    shard = str(tmp_path / "recoded.faceshard")
    out = _run(["tf_face_toolbox_tpu.cli.pack",
                f"--list={tmp_path/'list.txt'}", f"--root={tmp_path}",
                f"--output={shard}", "--recode_size=16"])
    assert "packed 16 records" in out
    out = _run(["tf_face_toolbox_tpu.cli.train",
                f"--data={shard}", f"--train_dir={tmp_path/'run'}",
                "--network=resnet_tiny", "--embedding_dim=16",
                "--image_size=12", "--crop_from=16", "--global_batch=8",
                "--num_steps=2", "--save_every=2", "--log_every=1",
                "--nobf16", "--loader=native_dct"])
    assert "done: step=2" in out


@pytest.mark.slow
def test_cli_train_preemption_flush(tmp_path):
    """SIGTERM mid-training flushes a checkpoint at the CURRENT step
    (exit 0); resuming continues from it — the TPU-VM preemption flow."""
    import re
    import signal
    import threading
    import time

    from PIL import Image

    rng = np.random.default_rng(2)
    lines = []
    for i in range(16):
        arr = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"p{i}.jpg"),
                                  "JPEG", quality=95)
        lines.append(f"p{i}.jpg {i % 4}")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    shard = str(tmp_path / "p.faceshard")
    _run(["tf_face_toolbox_tpu.cli.pack",
          f"--list={tmp_path/'list.txt'}", f"--root={tmp_path}",
          f"--output={shard}"])

    import subprocess
    import sys
    env = dict(os.environ, TFFT_PLATFORM="cpu")
    args = [sys.executable, "-m", "tf_face_toolbox_tpu.cli.train",
            f"--data={shard}", f"--train_dir={tmp_path/'run'}",
            "--network=resnet_tiny", "--embedding_dim=16",
            "--image_size=12", "--crop_from=16", "--global_batch=8",
            "--num_steps=500", "--save_every=500", "--log_every=1",
            "--nobf16"]
    proc = subprocess.Popen(args, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    captured = []
    stepped = threading.Event()

    def reader():
        for line in proc.stdout:
            captured.append(line)
            if re.search(r"step (3|4|5):", line):
                stepped.set()

    threading.Thread(target=reader, daemon=True).start()
    try:
        assert stepped.wait(timeout=240), captured[-8:]
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=120) == 0
        deadline = time.time() + 5
        while time.time() < deadline and not any(
                "preempted: checkpoint flushed" in ln for ln in captured):
            time.sleep(0.1)
        flushed = [ln for ln in captured
                   if "preempted: checkpoint flushed" in ln]
        assert flushed, captured[-8:]
        step = int(re.search(r"step=(\d+)", flushed[0]).group(1))
        assert step >= 3
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)

    # resume continues PAST the flushed step to a nearby target
    out = _run(["tf_face_toolbox_tpu.cli.train",
                f"--data={shard}", f"--train_dir={tmp_path/'run'}",
                "--network=resnet_tiny", "--embedding_dim=16",
                "--image_size=12", "--crop_from=16", "--global_batch=8",
                f"--num_steps={step + 2}", f"--save_every={step + 2}",
                "--log_every=1", "--nobf16"])
    assert f"done: step={step + 2}" in out


@pytest.mark.slow
def test_cli_train_sampled_pfc(tmp_path):
    """--pfc_sample_rate exercises the sampled Partial-FC head through
    the real train CLI (r3)."""
    from PIL import Image

    rng = np.random.default_rng(3)
    lines = []
    for i in range(16):
        arr = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"p{i}.jpg"),
                                  "JPEG", quality=95)
        lines.append(f"p{i}.jpg {i % 8}")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    shard = str(tmp_path / "p.faceshard")
    _run(["tf_face_toolbox_tpu.cli.pack",
          f"--list={tmp_path/'list.txt'}", f"--root={tmp_path}",
          f"--output={shard}"])
    out = _run(["tf_face_toolbox_tpu.cli.train",
                f"--data={shard}", f"--train_dir={tmp_path/'run'}",
                "--network=resnet_tiny", "--embedding_dim=16",
                "--image_size=12", "--crop_from=16", "--global_batch=8",
                "--num_steps=2", "--save_every=2", "--log_every=1",
                "--nobf16", "--num_classes=64",
                "--pfc_sample_rate=0.5"])
    assert "done: step=2" in out


@pytest.mark.mid
def test_cli_train_adaptive_losses_balanced(tmp_path):
    """--margin=adaface + center/triplet aux losses + the P×K balanced
    sampler through the real train CLI (r3 adaptive-loss family)."""
    from PIL import Image

    rng = np.random.default_rng(4)
    lines = []
    for i in range(16):
        arr = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"a{i}.jpg"),
                                  "JPEG", quality=95)
        lines.append(f"a{i}.jpg {i % 8}")   # 8 ids × 2 images
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    shard = str(tmp_path / "a.faceshard")
    _run(["tf_face_toolbox_tpu.cli.pack",
          f"--list={tmp_path/'list.txt'}", f"--root={tmp_path}",
          f"--output={shard}"])
    out = _run(["tf_face_toolbox_tpu.cli.train",
                f"--data={shard}", f"--train_dir={tmp_path/'run'}",
                "--network=resnet_tiny", "--embedding_dim=16",
                "--image_size=12", "--crop_from=16", "--global_batch=8",
                "--num_steps=2", "--save_every=2", "--log_every=1",
                "--nobf16", "--num_classes=8",
                "--margin=adaface", "--center_loss=0.01",
                "--triplet_loss=0.3", "--balanced_pk=4,2"])
    assert "done: step=2" in out


@pytest.mark.mid
def test_cli_train_magface(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(5)
    lines = []
    for i in range(8):
        arr = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"m{i}.jpg"),
                                  "JPEG", quality=95)
        lines.append(f"m{i}.jpg {i % 4}")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    shard = str(tmp_path / "m.faceshard")
    _run(["tf_face_toolbox_tpu.cli.pack",
          f"--list={tmp_path/'list.txt'}", f"--root={tmp_path}",
          f"--output={shard}"])
    out = _run(["tf_face_toolbox_tpu.cli.train",
                f"--data={shard}", f"--train_dir={tmp_path/'run'}",
                "--network=resnet_tiny", "--embedding_dim=16",
                "--image_size=12", "--crop_from=16", "--global_batch=8",
                "--num_steps=2", "--save_every=2", "--log_every=1",
                "--nobf16", "--num_classes=4", "--margin=magface"])
    assert "done: step=2" in out
