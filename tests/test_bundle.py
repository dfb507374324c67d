"""Deployment bundles (serving/bundle.py + cli.export): the
freeze_graph-era one-file hand-off [TF1-IDIOM; SURVEY.md §2a
checkpoint row].

Contracts: lossless variables round-trip, meta validation (never a
silently wrong artifact), static-int8 scales baked in at export, and
the CLI chain train → export → extract --bundle producing embeddings
identical to the flag-driven extraction of the same checkpoint.
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_face_toolbox_tpu.models import create_network, init_variables
from tf_face_toolbox_tpu.serving.bundle import (
    FORMAT_VERSION,
    network_from_meta,
    read_bundle,
    write_bundle,
)

META = dict(network="resnet_tiny", embedding_dim=16, image_size=16,
            crop_from=0, input_norm="per_image", quant_mode="none",
            stem="face", head_variant="gap", step=7)


def _tiny_variables():
    net = create_network("resnet_tiny", embedding_dim=16)
    return net, init_variables(net, jax.random.key(0), (1, 16, 16, 3))


def test_round_trip_lossless(tmp_path):
    net, variables = _tiny_variables()
    path = str(tmp_path / "m.bundle.npz")
    write_bundle(path, variables, META)
    got_vars, got_meta = read_bundle(path)
    assert got_meta["network"] == "resnet_tiny"
    assert got_meta["step"] == 7
    assert got_meta["format_version"] == FORMAT_VERSION
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(got_vars)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # reconstruction serves identically to the original net
    rebuilt = network_from_meta(got_meta, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    np.testing.assert_allclose(
        np.asarray(net.apply(variables, x, train=False)),
        np.asarray(rebuilt.apply(got_vars, x, train=False)), atol=1e-6)


def test_meta_validation(tmp_path):
    _, variables = _tiny_variables()
    path = str(tmp_path / "m.bundle.npz")
    with pytest.raises(ValueError, match="missing"):
        write_bundle(path, variables, {"network": "resnet_tiny"})
    # a static bundle without calibrated stats is refused
    with pytest.raises(ValueError, match="quant_stats"):
        write_bundle(path, variables, dict(META, quant_mode="static"))
    # a plain variables npz is not a bundle
    from tf_face_toolbox_tpu.interop.port import save_variables_npz
    plain = str(tmp_path / "plain.npz")
    save_variables_npz(plain, variables)
    with pytest.raises(ValueError, match="not a deployment bundle"):
        read_bundle(plain)


def test_unknown_format_version_refused(tmp_path):
    _, variables = _tiny_variables()
    path = str(tmp_path / "m.bundle.npz")
    write_bundle(path, variables, META)
    import json

    data = dict(np.load(path))
    meta = json.loads(str(data["__bundle_meta__"]))
    meta["format_version"] = FORMAT_VERSION + 1
    data["__bundle_meta__"] = np.array(json.dumps(meta))
    np.savez(path, **data)
    with pytest.raises(ValueError, match="format_version"):
        read_bundle(path)


@pytest.mark.mid
def test_static_int8_bundle_serves_without_calibration(tmp_path):
    """Calibrate → export → read → quantized='static' apply works from
    the bundle alone (the frozen scales ride in it)."""
    from tf_face_toolbox_tpu.models import calibrate_quant_stats

    net, variables = _tiny_variables()
    batches = [np.asarray(jax.random.normal(jax.random.key(i),
                                            (2, 16, 16, 3)))
               for i in range(2)]
    calibrated = calibrate_quant_stats("resnet_tiny", variables, batches,
                                       embedding_dim=16)
    path = str(tmp_path / "q.bundle.npz")
    write_bundle(path, calibrated, dict(META, quant_mode="static"))
    got_vars, got_meta = read_bundle(path)
    served = network_from_meta(got_meta, dtype=jnp.float32)
    assert served.quantized == "static"
    out = served.apply(got_vars, jnp.asarray(batches[0]), train=False)
    assert out.shape == (2, 16) and np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_cli_export_extract_serve_chain(tmp_path):
    """train → export (EMA) → extract --bundle == extract --checkpoint_dir
    --use_ema, bit-for-bit; and export refuses a bad flag combo."""
    from tests.test_cli import _run  # shared CPU-pinned subprocess runner
    from PIL import Image

    rng = np.random.default_rng(0)
    lines = []
    for i in range(12):
        arr = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"i{i}.jpg"), "JPEG",
                                  quality=95)
        lines.append(f"i{i}.jpg {i % 3}")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    shard = str(tmp_path / "d.faceshard")
    _run(["tf_face_toolbox_tpu.cli.pack",
          f"--list={tmp_path/'list.txt'}", f"--root={tmp_path}",
          f"--output={shard}"])
    train_dir = str(tmp_path / "run")
    _run(["tf_face_toolbox_tpu.cli.train", f"--data={shard}",
          f"--train_dir={train_dir}", "--network=resnet_tiny",
          "--embedding_dim=16", "--image_size=12", "--crop_from=16",
          "--global_batch=8", "--num_steps=2", "--save_every=2",
          "--nobf16", "--ema_decay=0.9"])
    bundle = str(tmp_path / "m.bundle.npz")
    out = _run(["tf_face_toolbox_tpu.cli.export",
                f"--checkpoint_dir={train_dir}", "--network=resnet_tiny",
                "--embedding_dim=16", "--image_size=12", "--use_ema",
                f"--output={bundle}"])
    assert "exported resnet_tiny (step=2" in out
    _run(["tf_face_toolbox_tpu.cli.extract", f"--bundle={bundle}",
          f"--data={shard}", f"--output={tmp_path/'eb.npy'}", "--nobf16"])
    _run(["tf_face_toolbox_tpu.cli.extract",
          f"--checkpoint_dir={train_dir}", "--network=resnet_tiny",
          "--embedding_dim=16", "--image_size=12", "--use_ema",
          f"--data={shard}", f"--output={tmp_path/'ec.npy'}", "--nobf16"])
    np.testing.assert_array_equal(np.load(tmp_path / "eb.npy"),
                                  np.load(tmp_path / "ec.npy"))
    # bad combos refuse loudly
    import os
    env = dict(os.environ, TFFT_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.extract",
         f"--bundle={bundle}", f"--checkpoint_dir={train_dir}",
         f"--data={shard}", f"--output={tmp_path/'x.npy'}"],
        capture_output=True, text=True, env=env)
    assert r.returncode != 0 and "self-contained" in r.stderr


@pytest.mark.slow
def test_cli_export_step_and_average_last(tmp_path):
    """--step pins an older checkpoint; --average_last=2 writes exactly
    the leaf-wise mean of the two retained checkpoints' params."""
    from PIL import Image

    from tests.test_cli import _run

    rng = np.random.default_rng(1)
    lines = []
    for i in range(8):
        arr = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"i{i}.jpg"), "JPEG",
                                  quality=95)
        lines.append(f"i{i}.jpg {i % 2}")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    shard = str(tmp_path / "d.faceshard")
    _run(["tf_face_toolbox_tpu.cli.pack",
          f"--list={tmp_path/'list.txt'}", f"--root={tmp_path}",
          f"--output={shard}"])
    train_dir = str(tmp_path / "run")
    _run(["tf_face_toolbox_tpu.cli.train", f"--data={shard}",
          f"--train_dir={train_dir}", "--network=resnet_tiny",
          "--embedding_dim=16", "--image_size=12", "--crop_from=16",
          "--global_batch=8", "--num_steps=2", "--save_every=1",
          "--nobf16", "--base_lr=0.05"])

    def export(args, name):
        out = str(tmp_path / name)
        _run(["tf_face_toolbox_tpu.cli.export",
              f"--checkpoint_dir={train_dir}", "--network=resnet_tiny",
              "--embedding_dim=16", "--image_size=12",
              f"--output={out}"] + args)
        return read_bundle(out)

    v1, m1 = export(["--step=1"], "s1.npz")
    v2, m2 = export([], "s2.npz")            # latest = step 2
    va, ma = export(["--average_last=2"], "avg.npz")
    assert m1["step"] == 1 and m2["step"] == 2
    assert ma["averaged_steps"] == [1, 2]
    flat = jax.tree_util.tree_leaves
    one, two, avg = flat(v1["params"]), flat(v2["params"]), flat(
        va["params"])
    assert any(not np.allclose(a, b) for a, b in zip(one, two))
    for a, b, c in zip(one, two, avg):
        np.testing.assert_allclose(
            c, (np.asarray(a, np.float64) + np.asarray(b, np.float64))
            / 2, atol=1e-7)
    # BN running stats come from the newest checkpoint, not averaged
    np.testing.assert_array_equal(
        flat(va["batch_stats"])[0], flat(v2["batch_stats"])[0])
