"""Extraction API: flip-averaging math, batching, e2e extract→verify.

Covers BASELINE configs 1-3: embeddings under the same extraction API
for every backbone, flip-averaged and L2-normalized.
"""

import pytest
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tf_face_toolbox_tpu.extract import (
    extract_dataset,
    flip_averaged_embeddings,
    make_extract_fn,
)
from tf_face_toolbox_tpu.models import create_network, init_variables
from tf_face_toolbox_tpu.models.resnet import ResNet
from tf_face_toolbox_tpu.ops.verification import verify_pairs

TINY = dict(stage_sizes=(1,), width_per_group=16, embedding_dim=32)


def _net_and_vars(seed=0, size=16):
    net = ResNet(**TINY)
    variables = init_variables(net, jax.random.key(seed), (1, size, size, 3))
    return net, variables


def test_unit_norm():
    net, variables = _net_and_vars()
    x = jax.random.normal(jax.random.key(1), (4, 16, 16, 3))
    emb = make_extract_fn(net, donate=False)(variables, x)
    norms = np.linalg.norm(np.asarray(emb), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_flip_invariance_property():
    """extract(x) == extract(flip(x)) BY CONSTRUCTION — the defining
    property of flip-averaged embeddings (f(x)+f(flip x) is symmetric)."""
    net, variables = _net_and_vars()
    x = jax.random.normal(jax.random.key(2), (4, 16, 16, 3))
    fn = make_extract_fn(net, donate=False)
    e1 = np.asarray(fn(variables, x))
    e2 = np.asarray(fn(variables, x[:, :, ::-1, :]))
    np.testing.assert_allclose(e1, e2, atol=1e-5)


@pytest.mark.mid
def test_equals_manual_two_pass():
    net, variables = _net_and_vars()
    x = jax.random.normal(jax.random.key(3), (3, 16, 16, 3))
    apply_fn = functools.partial(net.apply, train=False)
    got = np.asarray(flip_averaged_embeddings(apply_fn, variables, x))
    a = np.asarray(apply_fn(variables, x))
    b = np.asarray(apply_fn(variables, x[:, :, ::-1, :]))
    s = a + b
    want = s / np.linalg.norm(s, axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_extract_dataset_batching():
    net, variables = _net_and_vars()
    rng = np.random.default_rng(4)
    batches = [rng.normal(size=(5, 16, 16, 3)).astype(np.float32)
               for _ in range(3)]
    out = extract_dataset(net, variables, batches,
                          extract_fn=make_extract_fn(net, donate=False))
    assert out.shape == (15, 32)
    # matches per-batch extraction
    fn = make_extract_fn(net, donate=False)
    single = np.asarray(fn(variables, jnp.asarray(batches[1])))
    np.testing.assert_allclose(out[5:10], single, atol=1e-6)


def test_e2e_extract_then_verify_untrained_sanity():
    """Config-1 shaped round trip: images → embeddings → LFW folds.

    With an UNTRAINED net, same-image pairs must still verify perfectly
    against distinct-noise pairs whose similarity is below 1.
    """
    net, variables = _net_and_vars()
    rng = np.random.default_rng(5)
    base = rng.normal(size=(30, 16, 16, 3)).astype(np.float32)
    other = rng.normal(size=(30, 16, 16, 3)).astype(np.float32)
    fn = make_extract_fn(net, donate=False)
    e_base = np.asarray(fn(variables, jnp.asarray(base)))
    e_same = np.asarray(fn(variables, jnp.asarray(base)))  # identical
    e_other = np.asarray(fn(variables, jnp.asarray(other)))
    emb1 = np.concatenate([e_base, e_base])
    emb2 = np.concatenate([e_same, e_other])
    labels = np.array([1] * 30 + [0] * 30)
    order = np.argsort(np.tile(np.arange(30), 2), kind="stable")
    r = verify_pairs(emb1[order], emb2[order], labels[order])
    assert r["accuracy_mean"] > 0.9


@pytest.mark.mid
def test_all_backbones_share_extraction_api():
    """BASELINE config 3: every zoo entry works under the same API."""
    for name in ["resnet_v1_50", "se_resnet_50", "densenet_121"]:
        net = create_network(name, embedding_dim=32)
        variables = init_variables(net, jax.random.key(0), (1, 24, 24, 3))
        fn = make_extract_fn(net, donate=False)
        emb = fn(variables, jnp.ones((2, 24, 24, 3)))
        assert emb.shape == (2, 32)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-5)


def test_mesh_sharded_extraction_matches_single():
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    net, variables = _net_and_vars()
    x = jax.random.normal(jax.random.key(6), (8, 16, 16, 3))
    single = make_extract_fn(net, donate=False)(variables, x)
    mesh = create_mesh()
    sharded = make_extract_fn(net, donate=False, mesh=mesh)(variables, x)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=2e-5)


def test_mesh_sharded_extraction_pads_ragged_tail():
    """A batch that does not divide by the data-axis size (a shard's
    tail) is padded inside make_extract_fn and the pad rows dropped —
    the CLI's --data_parallel path must not crash on the last batch."""
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    net, variables = _net_and_vars()
    mesh = create_mesh()
    assert mesh.devices.size > 1  # conftest's 8-device CPU mesh
    x = jax.random.normal(jax.random.key(7), (5, 16, 16, 3))
    single = make_extract_fn(net, donate=False)(variables, x)
    sharded = make_extract_fn(net, donate=False, mesh=mesh)(variables, x)
    assert sharded.shape == single.shape
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=2e-5)


def test_embedding_file_formats_roundtrip(tmp_path):
    """save/load_embeddings route by extension: npy/npz/mat/bin — the
    reference-era feature-dump formats (SURVEY.md §3.2 '.npy/.mat/
    binary'). .mat must be MATLAB-v5 readable (scipy oracle)."""
    from tf_face_toolbox_tpu.train.checkpoint import (
        load_embeddings,
        save_embeddings,
    )

    emb = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)
    names = [f"img_{i}.jpg" for i in range(5)]

    p = tmp_path / "e.npy"
    save_embeddings(str(p), emb)
    out, n = load_embeddings(str(p))
    np.testing.assert_array_equal(out, emb)
    assert n is None

    p = tmp_path / "e.npz"
    save_embeddings(str(p), emb, names=names)
    out, n = load_embeddings(str(p))
    np.testing.assert_array_equal(out, emb)
    assert list(n) == names

    p = tmp_path / "e.mat"
    save_embeddings(str(p), emb, names=names)
    out, n = load_embeddings(str(p))
    np.testing.assert_allclose(out, emb)
    assert list(n) == names
    from scipy.io import loadmat
    assert "embeddings" in loadmat(str(p))  # plain-MATLAB readable

    p = tmp_path / "e.bin"
    save_embeddings(str(p), emb)
    out, n = load_embeddings(str(p))
    np.testing.assert_array_equal(out, emb)
    assert n is None
    # header sanity: magic + shape survive a fresh reader
    raw = p.read_bytes()
    assert raw[:4] == b"TFFB"
    assert np.frombuffer(raw[4:12], "<i4").tolist() == [5, 8]

    import pytest

    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"XXXX" + raw[4:])
    with pytest.raises(ValueError, match="magic"):
        load_embeddings(str(bad))
    trunc = tmp_path / "trunc.bin"
    trunc.write_bytes(raw[:-16])
    with pytest.raises(ValueError, match="truncated"):
        load_embeddings(str(trunc))


def test_embedding_npz_without_names_roundtrip(tmp_path):
    """--output=emb.npz with no names must write THAT file (np.save
    would silently append .npy — review regression)."""
    from tf_face_toolbox_tpu.train.checkpoint import (
        load_embeddings,
        save_embeddings,
    )
    emb = np.ones((3, 4), np.float32)
    p = tmp_path / "e.npz"
    save_embeddings(str(p), emb)
    assert p.exists() and not (tmp_path / "e.npz.npy").exists()
    out, names = load_embeddings(str(p))
    np.testing.assert_array_equal(out, emb)
    assert names is None


def test_float16_storage_cosine_budget(tmp_path):
    """f16 gallery dumps: round-trip keeps unit-vector cosine within
    ~1e-3 of the f32 embeddings (the --output_dtype=float16 contract)."""
    from tf_face_toolbox_tpu.train.checkpoint import (
        load_embeddings, save_embeddings)

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(32, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    path = str(tmp_path / "g16.npy")
    save_embeddings(path, emb.astype(np.float16))
    got, _ = load_embeddings(path)
    assert got.dtype == np.float16
    g = got.astype(np.float32)
    cos = np.sum(g * emb, axis=1) / np.linalg.norm(g, axis=1)
    assert cos.min() > 0.99999, cos.min()  # unit vectors: ~f16 eps


def test_quality_scores_match_manual_and_preserve_embeddings():
    """with_quality: embeddings identical to the plain path, quality ==
    pre-normalization magnitude of the flip-averaged feature (the
    MagFace quality signal)."""
    net, variables = _net_and_vars()
    x = jax.random.normal(jax.random.key(11), (5, 16, 16, 3))
    plain = np.asarray(make_extract_fn(net, donate=False)(variables, x))
    emb, q = make_extract_fn(net, donate=False,
                             with_quality=True)(variables, x)
    np.testing.assert_allclose(np.asarray(emb), plain, atol=1e-6)
    apply_fn = functools.partial(net.apply, train=False)
    a = np.asarray(apply_fn(variables, x))
    b = np.asarray(apply_fn(variables, x[:, :, ::-1, :]))
    want_q = np.linalg.norm((a + b) / 2.0, axis=1)
    np.testing.assert_allclose(np.asarray(q), want_q, rtol=1e-5)


def test_quality_scores_mesh_path_with_ragged_tail():
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    net, variables = _net_and_vars()
    mesh = create_mesh()
    x = jax.random.normal(jax.random.key(12), (5, 16, 16, 3))
    e1, q1 = make_extract_fn(net, donate=False,
                             with_quality=True)(variables, x)
    e2, q2 = make_extract_fn(net, donate=False, mesh=mesh,
                             with_quality=True)(variables, x)
    assert q2.shape == (5,)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-4)
