"""Cross-framework parity: flax model vs its TF/Keras twin.

The BASELINE north-star gate is "per-face embedding cosine >= 0.999 vs
reference". With the reference mount empty there is no upstream TF
checkpoint, so this is the honest two-framework instantiation: the same
architecture built in installed TF/Keras, weights ported both ways, and
embeddings compared on identical standardized inputs (VERDICT r1 item 2).

TensorFlow runs on CPU here; the flax side runs on the conftest CPU
backend, both in float32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from tf_face_toolbox_tpu.interop import (  # noqa: E402
    build_keras_resnet,
    jax_to_keras,
    keras_to_jax,
)
from tf_face_toolbox_tpu.models import create_network  # noqa: E402
from tf_face_toolbox_tpu.models.resnet import ResNet  # noqa: E402


def _cosine_rows(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-30)


def _warmed_variables(net, image_size, *, seed=0, steps=2, batch=4):
    """Init + a few train-mode applies so batch_stats hold *real*
    (non-default) moving statistics — the porting detail naive mirrors
    get wrong."""
    rng = jax.random.key(seed)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = jax.jit(lambda r: net.init(r, dummy, train=False))(rng)

    @jax.jit
    def train_apply(variables, x):
        _, updates = net.apply(variables, x, train=True,
                               mutable=["batch_stats"])
        return {"params": variables["params"], **updates}

    for i in range(steps):
        x = jax.random.normal(
            jax.random.key(100 + i),
            (batch, image_size, image_size, 3), jnp.float32)
        variables = train_apply(variables, x)
    return variables


def _assert_twin_parity(net, keras_kwargs, image_size, *, batch=6,
                        seed=0):
    variables = _warmed_variables(net, image_size, seed=seed)
    model = build_keras_resnet(image_size=image_size, **keras_kwargs)
    jax_to_keras(variables, model)

    x = np.asarray(jax.random.normal(
        jax.random.key(7), (batch, image_size, image_size, 3),
        jnp.float32))
    emb_jax = np.asarray(
        jax.jit(lambda v, t: net.apply(v, t, train=False))(variables, x))
    emb_tf = model.predict(x, verbose=0)

    cos = _cosine_rows(emb_jax, emb_tf)
    assert cos.min() >= 0.999, f"cosine per face: {cos}"
    np.testing.assert_allclose(emb_jax, emb_tf, rtol=2e-3, atol=2e-3)

    # reverse port is lossless: keras -> jax reproduces the original tree
    back = keras_to_jax(model, variables)
    for key in ("params", "batch_stats"):
        orig = jax.tree_util.tree_leaves(variables[key])
        rt = jax.tree_util.tree_leaves(back[key])
        assert len(orig) == len(rt)
        for o, r in zip(orig, rt):
            np.testing.assert_array_equal(np.asarray(o), np.asarray(r))
    return variables, model


@pytest.mark.mid
def test_small_resnet_face_stem_parity():
    net = ResNet(stage_sizes=(1, 1), width_per_group=16,
                 embedding_dim=24, stem="face")
    _assert_twin_parity(
        net, dict(stage_sizes=(1, 1), width_per_group=16,
                  embedding_dim=24, stem="face"), image_size=16)


def test_small_se_resnext_parity():
    """SE gate + grouped conv + expansion-2 all port and agree."""
    net = ResNet(stage_sizes=(1, 1), width_per_group=8, groups=4,
                 expansion=2, se_reduction=4, embedding_dim=16,
                 stem="face")
    _assert_twin_parity(
        net, dict(stage_sizes=(1, 1), width_per_group=8, groups=4,
                  expansion=2, se_reduction=4, embedding_dim=16,
                  stem="face"), image_size=16)


def test_small_space2depth_stem_parity():
    """flax's reshape/transpose s2d == tf.nn.space_to_depth ordering."""
    net = ResNet(stage_sizes=(1,), width_per_group=16, embedding_dim=16,
                 stem="space2depth")
    _assert_twin_parity(
        net, dict(stage_sizes=(1,), width_per_group=16, embedding_dim=16,
                  stem="space2depth"), image_size=16)


def test_keras_initialized_weights_load_into_jax():
    """TF -> JAX direction with TF-born weights (the future real-world
    path: upstream checkpoint -> our framework)."""
    net = ResNet(stage_sizes=(1, 1), width_per_group=16, embedding_dim=24,
                 stem="face")
    template = _warmed_variables(net, 16, seed=3)
    model = build_keras_resnet(stage_sizes=(1, 1), width_per_group=16,
                               embedding_dim=24, stem="face",
                               image_size=16)
    # give the TF side its own nontrivial statistics
    rng = np.random.default_rng(11)
    for layer in model.layers:
        if isinstance(layer, tf.keras.layers.BatchNormalization):
            gamma, beta, mean, var = layer.get_weights()
            layer.set_weights([
                gamma, beta,
                rng.normal(0, 0.5, mean.shape).astype(np.float32),
                rng.uniform(0.5, 2.0, var.shape).astype(np.float32)])

    ported = keras_to_jax(model, template)
    x = np.asarray(jax.random.normal(
        jax.random.key(5), (6, 16, 16, 3), jnp.float32))
    emb_jax = np.asarray(jax.jit(
        lambda v, t: net.apply(v, t, train=False))(ported, x))
    emb_tf = model.predict(x, verbose=0)
    cos = _cosine_rows(emb_jax, emb_tf)
    assert cos.min() >= 0.999, f"cosine per face: {cos}"


def test_port_rejects_architecture_drift():
    """A mismatched twin fails loudly, not silently."""
    net = ResNet(stage_sizes=(1,), width_per_group=16, embedding_dim=24,
                 stem="face")
    variables = _warmed_variables(net, 16, seed=1, steps=1)
    wrong = build_keras_resnet(stage_sizes=(1, 1), width_per_group=16,
                               embedding_dim=24, stem="face",
                               image_size=16)
    with pytest.raises((AssertionError, KeyError)):
        jax_to_keras(variables, wrong)


@pytest.mark.slow
def test_resnet50_face_stem_full_parity():
    """The flagship config: ResNet-50, face stem, 512-d gap head, 112px.

    This is the BASELINE configs[0]-shaped network; cosine >= 0.999 per
    face across frameworks, both with raw and flip-averaged embeddings.
    """
    from tf_face_toolbox_tpu.extract import flip_averaged_embeddings

    net = create_network("resnet_v1_50", dtype=jnp.float32, stem="face")
    variables = _warmed_variables(net, 112, steps=1, batch=2)
    model = build_keras_resnet(stage_sizes=(3, 4, 6, 3), stem="face",
                               embedding_dim=512, image_size=112)
    jax_to_keras(variables, model)

    x = np.asarray(jax.random.normal(
        jax.random.key(9), (4, 112, 112, 3), jnp.float32))
    emb_jax = np.asarray(jax.jit(
        lambda v, t: net.apply(v, t, train=False))(variables, x))
    emb_tf = model.predict(x, verbose=0)
    cos = _cosine_rows(emb_jax, emb_tf)
    assert cos.min() >= 0.999, f"cosine per face: {cos}"

    # flip-averaged extraction parity (the BASELINE L6 semantic):
    # f(x) + f(flip(x)), L2-normalized, must also agree across frameworks.
    feat_jax = np.asarray(flip_averaged_embeddings(
        lambda v, t: net.apply(v, t, train=False), variables,
        jnp.asarray(x)))
    emb_tf_flip = model.predict(x[:, :, ::-1, :], verbose=0)
    feat_tf = emb_tf + emb_tf_flip
    feat_tf /= np.linalg.norm(feat_tf, axis=-1, keepdims=True)
    cos2 = _cosine_rows(feat_jax, feat_tf)
    assert cos2.min() >= 0.999, f"flip-avg cosine per face: {cos2}"


def test_variables_npz_roundtrip(tmp_path):
    """flatten -> npz -> unflatten is lossless (the import_keras
    hand-off format)."""
    from tf_face_toolbox_tpu.interop.port import (
        load_variables_npz,
        save_variables_npz,
    )

    net = ResNet(stage_sizes=(1,), width_per_group=16, embedding_dim=8,
                 stem="face")
    variables = _warmed_variables(net, 16, seed=2, steps=1)
    p = str(tmp_path / "v.npz")
    save_variables_npz(p, variables)
    back = load_variables_npz(p)
    orig = jax.tree_util.tree_leaves_with_path(variables)
    rt_map = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(orig) == len(rt_map)
    for path, leaf in orig:
        np.testing.assert_array_equal(np.asarray(leaf), rt_map[path])


@pytest.mark.slow
def test_import_keras_cli_roundtrip(tmp_path):
    """Full migration path: Keras model file -> import_keras CLI ->
    extract CLI --variables_npz; embeddings match the in-process port."""
    import os
    import subprocess
    import sys

    from PIL import Image

    from tf_face_toolbox_tpu.data.format import PAYLOAD_JPEG, ShardWriter
    from tf_face_toolbox_tpu.extract import extract_shard

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run_cli(args):
        env = dict(os.environ, TFFT_PLATFORM="cpu")
        r = subprocess.run([sys.executable, "-m"] + args, env=env,
                           cwd=repo, capture_output=True, text=True)
        assert r.returncode == 0, f"{args}:\n{r.stdout}\n{r.stderr}"
        return r.stdout

    # a Keras twin of resnet_tiny with its own (TF-born) weights
    model = build_keras_resnet(stage_sizes=(1,), width_per_group=16,
                               embedding_dim=16, stem="face",
                               image_size=12)
    keras_path = str(tmp_path / "tiny.keras")
    model.save(keras_path)

    npz = str(tmp_path / "ported.npz")
    out = run_cli(["tf_face_toolbox_tpu.cli.import_keras",
                   f"--keras_model={keras_path}", f"--output={npz}",
                   "--network=resnet_tiny", "--embedding_dim=16",
                   "--image_size=12"])
    assert "imported" in out

    # tiny shard to extract from
    rng = np.random.default_rng(0)
    shard = str(tmp_path / "d.faceshard")
    with ShardWriter(shard, payload=PAYLOAD_JPEG) as w:
        for i in range(6):
            arr = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
            from io import BytesIO
            buf = BytesIO()
            Image.fromarray(arr).save(buf, "JPEG", quality=95)
            w.add(buf.getvalue(), i % 3)

    emb_path = str(tmp_path / "e.npy")
    out = run_cli(["tf_face_toolbox_tpu.cli.extract",
                   f"--variables_npz={npz}", f"--data={shard}",
                   f"--output={emb_path}", "--network=resnet_tiny",
                   "--embedding_dim=16", "--image_size=12", "--batch=6",
                   "--nobf16"])
    assert "wrote (6, 16)" in out
    emb_cli = np.load(emb_path)

    # in-process reference: port the same model, same extraction path
    from tf_face_toolbox_tpu.data.pipeline import FaceShardSource

    net = ResNet(stage_sizes=(1,), width_per_group=16, embedding_dim=16,
                 stem="face")
    template = _warmed_variables(net, 12, seed=0, steps=0)
    variables = keras_to_jax(model, template)
    emb_ref = extract_shard(net, variables, FaceShardSource(shard),
                            image_size=12, batch=6)
    np.testing.assert_allclose(emb_cli, emb_ref, rtol=1e-4, atol=1e-4)
