"""JPEG/DCT-domain backbone path (ops/dct.py + stem="dct").

Parity contracts (VERDICT r2 next-step #1):
- block_dct is an exact invertible re-layout (Parseval).
- coefficient-domain standardization == tf-semantics pixel
  standardization (ops/preprocess.per_image_standardization).
- prepare_coefficients (zero-decode: dequant + frequency-domain color
  conversion + Parseval standardize) matches the full pixel chain at
  cosine ≥0.999 — the budget is ONLY libjpeg's round/clip.
- flip_coefficients == pixel flip, exactly.
- the dct net accepts pixels and prepared coefficients
  interchangeably and trains end-to-end.
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tf_face_toolbox_tpu.models import create_network, init_variables
from tf_face_toolbox_tpu.ops import dct as dct_ops
from tf_face_toolbox_tpu.ops.preprocess import per_image_standardization

TINY_DCT = dict(stage_sizes=(1, 1, 1), stage_widths=(16, 32, 64),
                dct_stem_features=16)


def _pixels(n=2, size=112, seed=0):
    return jax.random.randint(jax.random.key(seed), (n, size, size, 3),
                              0, 256).astype(jnp.float32)


def test_block_dct_roundtrip_and_parseval():
    x = _pixels()
    z = dct_ops.block_dct(x)
    assert z.shape == (2, 14, 14, 192)
    np.testing.assert_allclose(np.asarray(dct_ops.block_idct(z)),
                               np.asarray(x), atol=2e-4)
    # Parseval: energy preserved per image
    np.testing.assert_allclose(
        np.sum(np.square(np.asarray(z)), axis=(1, 2, 3)),
        np.sum(np.square(np.asarray(x)), axis=(1, 2, 3)), rtol=1e-6)


def test_standardize_coefficients_matches_pixel_standardization():
    x = _pixels(3)
    zs = dct_ops.standardize_coefficients(dct_ops.block_dct(x))
    got = dct_ops.block_idct(zs)
    want = per_image_standardization(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


def test_standardize_coefficients_constant_image_floor():
    """rsqrt(N) stddev floor (SURVEY.md §8): constant image → all-zero
    output, not a divide-by-near-zero blowup."""
    x = jnp.full((1, 112, 112, 3), 77.0)
    zs = dct_ops.standardize_coefficients(dct_ops.block_dct(x))
    assert np.isfinite(np.asarray(zs)).all()
    np.testing.assert_allclose(np.asarray(dct_ops.block_idct(zs)),
                               0.0, atol=1e-3)


def test_flip_coefficients_exact():
    x = _pixels()
    zf = dct_ops.flip_coefficients(dct_ops.block_dct(x))
    got = dct_ops.block_idct(zf)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(x[:, :, ::-1]), atol=2e-4)


@pytest.mark.mid
def test_net_pixels_and_coefficients_agree():
    """The stem's two entry modes are the same computation."""
    net = create_network("dct_resnet_50", embedding_dim=32,
                         dtype=jnp.float32, **TINY_DCT)
    x = _pixels()
    v = init_variables(net, jax.random.key(0), (2, 112, 112, 3))
    e_pix = net.apply(v, x, train=False)
    e_coef = net.apply(v, dct_ops.block_dct(x), train=False)
    np.testing.assert_allclose(np.asarray(e_pix), np.asarray(e_coef),
                               atol=1e-5)


def test_net_rejects_bad_trailing_dim():
    net = create_network("dct_resnet_50", embedding_dim=32,
                         dtype=jnp.float32, **TINY_DCT)
    with pytest.raises(ValueError, match="dct stem"):
        net.init(jax.random.key(0), jnp.zeros((1, 14, 14, 64)),
                 train=False)


def test_factory_pins_dct_stem_over_cli_default():
    """CLIs pass --stem unconditionally; the registry pin must win."""
    net = create_network("dct_resnet_50", embedding_dim=32,
                         dtype=jnp.float32, stem="face", **TINY_DCT)
    assert net.stem == "dct"


def _jpeg_shard(tmp_path, img):
    from PIL import Image

    from tf_face_toolbox_tpu.data.format import PAYLOAD_JPEG, write_shard

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95, subsampling=0)
    path = str(tmp_path / "a.faceshard")
    write_shard(path, [buf.getvalue()], [0], payload=PAYLOAD_JPEG)
    return path


def test_prepare_coefficients_matches_pixel_chain(tmp_path):
    """Zero-decode path vs full decode + block_dct: cosine ≥0.999
    (difference = libjpeg's range-limit + round only)."""
    native = pytest.importorskip("tf_face_toolbox_tpu.data.native")
    if not native.native_available():
        pytest.skip("native loader unavailable")
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:112, 0:112]
    base = np.stack([yy * 255 / 112, xx * 255 / 112,
                     (yy + xx) * 255 / 224], -1)
    img = np.clip(base + rng.normal(0, 10, (112, 112, 3)),
                  0, 255).astype(np.uint8)
    path = _jpeg_shard(tmp_path, img)
    reader = native.NativeShardReader(path, num_threads=0)
    try:
        coef, qtab = reader.dct_batch([0], 112, 112)
        pix = reader.decode_batch([0], 112, 112)
    finally:
        reader.close()
    z_direct = np.asarray(dct_ops.prepare_coefficients(
        jnp.asarray(coef), jnp.asarray(qtab)))
    z_pixel = np.asarray(dct_ops.standardize_coefficients(
        dct_ops.block_dct(jnp.asarray(pix, jnp.float32))))
    a, b = z_direct.ravel(), z_pixel.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos >= 0.999, cos

    # and through the net: embedding cosine ≥0.999
    net = create_network("dct_resnet_50", embedding_dim=32,
                         dtype=jnp.float32, **TINY_DCT)
    v = init_variables(net, jax.random.key(0), (1, 112, 112, 3))
    e1 = np.asarray(net.apply(
        v, z_direct.reshape(1, 14, 14, 192), train=False))[0]
    e2 = np.asarray(net.apply(
        v, z_pixel.reshape(1, 14, 14, 192), train=False))[0]
    cos_e = e1 @ e2 / (np.linalg.norm(e1) * np.linalg.norm(e2))
    assert cos_e >= 0.999, cos_e


@pytest.mark.mid
def test_dct_net_trains():
    """End-to-end SPMD train step with the dct stem (augment chain on
    pixels → in-net DCT)."""
    import dataclasses

    from tests.test_train import CFG, _run_steps
    from tf_face_toolbox_tpu.models.resnet import ResNet
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh

    cfg = dataclasses.replace(CFG, image_size=16, augment=False)
    net = ResNet(stage_sizes=(1, 1), stage_widths=(16, 32), stem="dct",
                 dct_stem_features=16, embedding_dim=16)
    mesh = create_mesh()
    state, losses = _run_steps(mesh, 3, cfg=cfg, net=net)
    assert int(state.step) == 3
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.mid
def test_extract_shard_dct_domain_matches_pixel_loader(tmp_path):
    """Zero-decode extraction (loader='dct_domain') ≈ full-decode
    extraction of the same shard through the same dct net: embedding
    cosine ≥0.999 (budget: libjpeg round/clip only)."""
    native = pytest.importorskip("tf_face_toolbox_tpu.data.native")
    if not native.native_available():
        pytest.skip("native loader unavailable")
    from PIL import Image

    from tf_face_toolbox_tpu.data.format import pack_image_list
    from tf_face_toolbox_tpu.data.pipeline import FaceShardSource
    from tf_face_toolbox_tpu.extract import extract_shard

    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        arr = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"e{i}.jpg"),
                                  "JPEG", quality=95)
        lines.append(f"e{i}.jpg {i}\n")
    (tmp_path / "list.txt").write_text("".join(lines))
    shard = str(tmp_path / "e.faceshard")
    # recode at the model's input size: the dct-domain path cannot crop
    pack_image_list(str(tmp_path / "list.txt"), shard,
                    root=str(tmp_path), recode_size=32)

    net = create_network("dct_resnet_50", embedding_dim=32,
                         dtype=jnp.float32, **TINY_DCT)
    v = init_variables(net, jax.random.key(0), (1, 32, 32, 3))
    source = FaceShardSource(shard)
    kw = dict(image_size=32, crop_from=32, batch=4, num_threads=0)
    e_pix = extract_shard(net, v, source, loader="native", **kw)
    e_dct = extract_shard(net, v, source, loader="dct_domain", **kw)
    cos = np.sum(e_pix * e_dct, axis=1)  # rows are unit-norm
    assert cos.min() >= 0.999, cos

    # guard: non-dct nets must refuse the coefficient loader
    other = create_network("resnet_tiny", embedding_dim=16,
                           dtype=jnp.float32)
    with pytest.raises(ValueError, match="stem='dct'"):
        extract_shard(other, v, source, loader="dct_domain", **kw)
    # and crop_from != image_size is structurally impossible
    with pytest.raises(ValueError, match="crop_from == image_size"):
        extract_shard(net, v, source, loader="dct_domain",
                      image_size=32, crop_from=40, batch=4,
                      num_threads=0)


@pytest.mark.slow
def test_dct_stem_verification_parity_with_face_stem():
    """The accuracy gate for the JPEG-domain backbone (VERDICT r2 #1):
    on the synthetic-identity verification task, a tiny dct-stem net
    must reach the face-stem net's accuracy (±0.05). Both nets share
    widths/depths; only the entry differs."""
    import dataclasses

    from tests.test_train import CFG
    from tf_face_toolbox_tpu.extract import flip_averaged_embeddings
    from tf_face_toolbox_tpu.models.resnet import ResNet
    from tf_face_toolbox_tpu.ops.verification import verify_pairs
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    from tf_face_toolbox_tpu.train.trainer import (
        create_train_state, make_train_step)

    num_ids, size = 10, 16
    templates = jax.random.uniform(
        jax.random.key(0), (num_ids, size, size, 3)) * 2 - 1

    def sample(key, n):
        kl, kn = jax.random.split(key)
        labels = jax.random.randint(kl, (n,), 0, num_ids)
        noise = 0.3 * jax.random.normal(kn, (n, size, size, 3))
        return templates[labels] + noise, labels

    def train_and_verify(net):
        cfg = dataclasses.replace(
            CFG, num_classes=num_ids, base_lr=0.1, margin_scale=16.0,
            global_batch=32, image_size=size)
        mesh = create_mesh()
        state, net = create_train_state(cfg, jax.random.key(1), mesh,
                                        net=net)
        step_fn = make_train_step(net, cfg, mesh, state)
        for i in range(60):
            images, labels = sample(jax.random.key(1000 + i),
                                    cfg.global_batch)
            state, _ = step_fn(state, images.astype(jnp.float32),
                               labels.astype(jnp.int32))
        test_imgs, test_labels = sample(jax.random.key(9999), 60)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        emb = np.asarray(flip_averaged_embeddings(
            lambda v, x: net.apply(v, x, train=False), variables,
            test_imgs.astype(jnp.float32)))
        tl = np.asarray(test_labels)
        same = [(i, j) for i in range(60) for j in range(i + 1, 60)
                if tl[i] == tl[j]][:50]
        diff = [(i, j) for i in range(60) for j in range(i + 1, 60)
                if tl[i] != tl[j]][:50]
        i1 = np.array([p[0] for p in same + diff])
        i2 = np.array([p[1] for p in same + diff])
        labels01 = np.array([1] * len(same) + [0] * len(diff))
        order = np.argsort(np.tile(np.arange(len(same)), 2),
                           kind="stable")
        r = verify_pairs(emb[i1][order], emb[i2][order], labels01[order])
        return r["accuracy_mean"]

    acc_face = train_and_verify(
        ResNet(stage_sizes=(1, 1), width_per_group=16, stem="face",
               embedding_dim=16))
    acc_dct = train_and_verify(
        ResNet(stage_sizes=(1, 1), stage_widths=(16, 32), stem="dct",
               dct_stem_features=16, embedding_dim=16))
    assert acc_face > 0.8 and acc_dct > 0.8, (acc_face, acc_dct)
    assert acc_dct >= acc_face - 0.05, (acc_face, acc_dct)


@pytest.mark.mid
def test_dct_net_int8_static_and_qat_modes():
    """int8 serving modes compose with the dct stem: the stem itself
    stays fp (frequency BN + 1x1), the bottleneck stages run the
    calibrated static-int8 residual carry; QAT training mode runs."""
    from tf_face_toolbox_tpu.models import calibrate_quant_stats

    kw = dict(embedding_dim=32, **TINY_DCT)
    net32 = create_network("dct_resnet_50", **kw)
    v = init_variables(net32, jax.random.key(0), (1, 112, 112, 3))
    calib = [jax.random.normal(jax.random.key(40 + i), (2, 112, 112, 3))
             for i in range(2)]
    v_cal = calibrate_quant_stats("dct_resnet_50", v, calib, **kw)
    assert "quant_stats" in v_cal

    x = jax.random.normal(jax.random.key(9), (2, 112, 112, 3))
    e32 = np.asarray(net32.apply(v, x, train=False))
    net8 = create_network("dct_resnet_50", quantized="static", **kw)
    e8 = np.asarray(net8.apply(v_cal, x, train=False))
    cos = np.sum(e32 * e8, axis=1) / (
        np.linalg.norm(e32, axis=1) * np.linalg.norm(e8, axis=1))
    assert np.isfinite(e8).all()
    assert cos.min() >= 0.98, cos

    # QAT: train-mode forward fake-quantizes; gradients flow
    netq = create_network("dct_resnet_50", quantized="qat", **kw)

    def loss(params):
        out, _ = netq.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(g))
