"""TF1 Saver-checkpoint importer (interop/tf1.py, cli/import_tf1.py).

The fixtures are genuine Saver-V2 tensor bundles written through
tf.compat.v1.train.Saver — the byte format the reference's training
emits [TF1-IDIOM] — so the reader path under test is the real one, not
a mock. Canonical slim names are pinned literally so the mechanical
map can't drift from the era convention it claims to implement.
"""

import os

import numpy as np
import pytest

_CPU_ENV = dict(os.environ, TFFT_PLATFORM="cpu")  # CLI subprocesses off
# the TPU tunnel (slow remote compiles; same recipe as test_cli)

import jax
import jax.numpy as jnp

from tf_face_toolbox_tpu.interop.port import flatten_variables
from tf_face_toolbox_tpu.interop.tf1 import (
    _coerce,
    import_tf1_checkpoint,
    network_stage_sizes,
    slim_name_map,
)
from tf_face_toolbox_tpu.models import create_network, init_variables


def _template(network="resnet_tiny", **kw):
    kw.setdefault("embedding_dim", 8)
    net = create_network(network, dtype=jnp.float32, **kw)
    return init_variables(net, jax.random.key(0), (1, 16, 16, 3))


def _shape_template(network, **kw):
    """Structure-only template (no init compile) — enough for name
    mapping; big-net tests stay fast."""
    kw.setdefault("embedding_dim", 16)
    net = create_network(network, dtype=jnp.float32, **kw)
    return jax.eval_shape(
        lambda: net.init(jax.random.key(0),
                         jnp.zeros((1, 32, 32, 3)), train=False))


def _write_ckpt(prefix: str, tensors: dict) -> str:
    """Write a real TF1 Saver-V2 checkpoint holding `tensors` under
    their dict-key names (the Saver var_list-dict form controls the
    saved names exactly, slashes included)."""
    tf = pytest.importorskip("tensorflow")
    g = tf.Graph()
    with g.as_default():
        tfvars = {name: tf.compat.v1.get_variable(
            f"v{i}", initializer=tf.constant(val))
            for i, (name, val) in enumerate(tensors.items())}
        saver = tf.compat.v1.train.Saver(var_list=tfvars)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, prefix, write_meta_graph=False)
    return prefix


def test_slim_names_canonical():
    """The generated names ARE the slim-era convention — pinned
    literally for resnet_v1_50 so refactors can't silently drift."""
    template = _shape_template("resnet_v1_50")
    name_map = slim_name_map(
        template, stage_sizes=network_stage_sizes("resnet_v1_50"),
        scope="resnet_v1_50")
    expect = {
        "params/ConvBN_0/kernel":
            "resnet_v1_50/conv1/weights",
        "params/ConvBN_0/BatchNorm_0/scale":
            "resnet_v1_50/conv1/BatchNorm/gamma",
        "params/BottleneckBlock_0/ConvBN_0/kernel":
            "resnet_v1_50/block1/unit_1/bottleneck_v1/conv1/weights",
        "params/BottleneckBlock_0/ConvBN_3/kernel":
            "resnet_v1_50/block1/unit_1/bottleneck_v1/shortcut/weights",
        # flat block 3 = first unit of stage 2 (stages 3/4/6/3)
        "params/BottleneckBlock_3/ConvBN_1/BatchNorm_0/bias":
            "resnet_v1_50/block2/unit_1/bottleneck_v1/conv2/BatchNorm/beta",
        "batch_stats/BottleneckBlock_15/ConvBN_2/BatchNorm_0/var":
            "resnet_v1_50/block4/unit_3/bottleneck_v1/conv3/BatchNorm/"
            "moving_variance",
        "params/EmbeddingHead_0/Dense_0/kernel":
            "resnet_v1_50/embedding/weights",
        "params/EmbeddingHead_0/BatchNorm_0/bias":
            "resnet_v1_50/embedding/BatchNorm/beta",
    }
    for flax_key, tf1_name in expect.items():
        assert name_map[flax_key] == tf1_name, flax_key
    # total: every leaf got a name, uniquely
    assert len(name_map) == len(jax.tree.leaves(template))
    assert len(set(name_map.values())) == len(name_map)


def test_se_names():
    template = _shape_template("se_resnet_50")
    name_map = slim_name_map(
        template, stage_sizes=network_stage_sizes("se_resnet_50"),
        scope="se_resnet_50")
    assert name_map["params/BottleneckBlock_0/SqueezeExcite_0/Dense_0/"
                    "kernel"] == ("se_resnet_50/block1/unit_1/"
                                  "bottleneck_v1/se/fc1/weights")
    assert name_map["params/BottleneckBlock_0/SqueezeExcite_0/Dense_1/"
                    "bias"] == ("se_resnet_50/block1/unit_1/"
                                "bottleneck_v1/se/fc2/biases")


def test_saver_roundtrip_and_ema(tmp_path):
    template = _template()
    name_map = slim_name_map(
        template, stage_sizes=network_stage_sizes("resnet_tiny"),
        scope="resnet_tiny")
    rng = np.random.default_rng(0)
    flat = flatten_variables(template)
    base = {name_map[k]: rng.normal(size=np.shape(v)).astype(np.float32)
            for k, v in flat.items()}
    tensors = dict(base)
    # EMA shadows for params only, offset so the two reads differ
    for k in flat:
        if k.startswith("params/"):
            tensors[name_map[k] + "/ExponentialMovingAverage"] = (
                base[name_map[k]] + 1.0)
    # optimizer slots + bookkeeping must not pollute the unused report
    tensors["resnet_tiny/conv1/weights/Momentum"] = (
        np.zeros_like(base["resnet_tiny/conv1/weights"]))
    tensors["global_step"] = np.int64(90000)
    prefix = _write_ckpt(str(tmp_path / "model.ckpt-90000"), tensors)

    variables, report = import_tf1_checkpoint(prefix, template, name_map)
    assert report["missing"] == [] and report["unused"] == []
    assert report["ema_used"] == 0
    got = flatten_variables(variables)
    for k in flat:
        np.testing.assert_array_equal(got[k], base[name_map[k]], err_msg=k)

    ema_vars, report = import_tf1_checkpoint(
        prefix, template, name_map, use_ema=True)
    n_params = sum(1 for k in flat if k.startswith("params/"))
    assert report["ema_used"] == n_params
    got = flatten_variables(ema_vars)
    for k in flat:
        want = base[name_map[k]] + (1.0 if k.startswith("params/") else 0)
        np.testing.assert_array_equal(got[k], want, err_msg=k)


def test_missing_variable_raises_then_skips(tmp_path):
    template = _template()
    name_map = slim_name_map(
        template, stage_sizes=network_stage_sizes("resnet_tiny"),
        scope="resnet_tiny")
    rng = np.random.default_rng(1)
    flat = flatten_variables(template)
    tensors = {name_map[k]: rng.normal(size=np.shape(v)).astype(np.float32)
               for k, v in flat.items()}
    dropped = "params/EmbeddingHead_0/Dense_0/kernel"
    del tensors[name_map[dropped]]
    prefix = _write_ckpt(str(tmp_path / "partial.ckpt"), tensors)

    with pytest.raises(KeyError, match="absent"):
        import_tf1_checkpoint(prefix, template, name_map)
    variables, report = import_tf1_checkpoint(
        prefix, template, name_map, skip_missing=True)
    assert len(report["missing"]) == 1 and dropped in report["missing"][0]
    # untouched leaf keeps its template (init) value
    np.testing.assert_array_equal(
        flatten_variables(variables)[dropped], flat[dropped])


def test_unused_checkpoint_vars_reported(tmp_path):
    template = _template()
    name_map = slim_name_map(
        template, stage_sizes=network_stage_sizes("resnet_tiny"),
        scope="resnet_tiny")
    rng = np.random.default_rng(2)
    flat = flatten_variables(template)
    tensors = {name_map[k]: rng.normal(size=np.shape(v)).astype(np.float32)
               for k, v in flat.items()}
    tensors["resnet_tiny/logits/weights"] = np.zeros((8, 4), np.float32)
    prefix = _write_ckpt(str(tmp_path / "extra.ckpt"), tensors)
    _, report = import_tf1_checkpoint(prefix, template, name_map)
    assert report["unused"] == ["resnet_tiny/logits/weights"]


def test_dense_stored_as_1x1_conv_coerced():
    w = np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4)
    np.testing.assert_array_equal(_coerce(w, (3, 4)), w.reshape(3, 4))
    with pytest.raises(ValueError, match="shape mismatch"):
        _coerce(w, (4, 3))


@pytest.mark.mid
def test_cli_import_then_extract_serves(tmp_path):
    """e2e: Saver ckpt -> import_tf1 CLI -> npz -> extract serves it
    (embedding equality against direct apply of the imported tree)."""
    import subprocess
    import sys

    template = _template()
    name_map = slim_name_map(
        template, stage_sizes=network_stage_sizes("resnet_tiny"),
        scope="resnet_tiny")
    rng = np.random.default_rng(3)
    flat = flatten_variables(template)
    tensors = {name_map[k]:
               (0.1 * rng.normal(size=np.shape(v))).astype(np.float32)
               for k, v in flat.items()}
    # BN variances must be positive for a finite forward pass
    for k in flat:
        if k.endswith("/var"):
            tensors[name_map[k]] = np.abs(tensors[name_map[k]]) + 1.0
    prefix = _write_ckpt(str(tmp_path / "ref.ckpt-1"), tensors)
    npz = tmp_path / "imported.npz"
    r = subprocess.run(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.import_tf1",
         f"--checkpoint={prefix}", f"--output={npz}",
         "--network=resnet_tiny", "--stem=face", "--embedding_dim=8",
         "--image_size=16"],
        capture_output=True, text=True, env=_CPU_ENV)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "imported" in r.stdout

    from tf_face_toolbox_tpu.interop.port import load_variables_npz
    loaded = load_variables_npz(str(npz))
    net = create_network("resnet_tiny", dtype=jnp.float32,
                         embedding_dim=8)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    out = net.apply(jax.tree.map(jnp.asarray, loaded), x, train=False)
    want_vars, _ = import_tf1_checkpoint(prefix, template, name_map)
    want = net.apply(jax.tree.map(jnp.asarray, want_vars), x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-6)
