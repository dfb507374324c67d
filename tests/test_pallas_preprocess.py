"""Fused Pallas input kernel vs the pure-XLA oracle chain.

Runs in Pallas interpreter mode on CPU (SURVEY.md §4); the same kernel
compiles for TPU (exercised by bench/serving paths on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_face_toolbox_tpu.ops import preprocess as pp
from tf_face_toolbox_tpu.ops.pallas_preprocess import (
    fused_eval_preprocess,
    fused_preprocess,
)


def _u8(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8))


def _oracle(images, flip_mask, out_h, out_w):
    x = pp.resize_bilinear(images, out_h, out_w)
    x = pp.apply_flip_mask(x, flip_mask)
    return pp.per_image_standardization(x)


def test_fused_matches_oracle_no_flip():
    imgs = _u8((4, 20, 16, 3))
    mask = jnp.zeros((4,), jnp.int32)
    got = fused_preprocess(imgs, mask, out_h=12, out_w=12, interpret=True)
    want = _oracle(imgs, mask, 12, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)


def test_fused_matches_oracle_mixed_flip():
    imgs = _u8((6, 14, 14, 3), seed=1)
    mask = jnp.asarray([1, 0, 1, 1, 0, 0], jnp.int32)
    got = fused_preprocess(imgs, mask, out_h=14, out_w=14, interpret=True)
    want = _oracle(imgs, mask, 14, 14)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)


def test_fused_upscale_and_rect():
    imgs = _u8((2, 10, 8, 3), seed=2)
    mask = jnp.asarray([0, 1], jnp.int32)
    got = fused_preprocess(imgs, mask, out_h=16, out_w=12, interpret=True)
    want = _oracle(imgs, mask, 16, 12)
    assert got.shape == (2, 16, 12, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)


def test_fused_eval_helper_and_bf16_out():
    imgs = _u8((3, 16, 16, 3), seed=3)
    got = fused_eval_preprocess(imgs, 12, 12, out_dtype=jnp.bfloat16,
                                interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _oracle(imgs, jnp.zeros((3,), jnp.int32), 12, 12)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.02)


def test_constant_image_rsqrt_floor():
    imgs = jnp.full((1, 12, 12, 3), 9, jnp.uint8)
    got = fused_eval_preprocess(imgs, 12, 12, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-5)


def test_large_frame_falls_back_to_xla():
    """Frames whose interpolation matrices exceed the VMEM budget route
    through the XLA chain — same semantics, no Mosaic OOM."""
    imgs = _u8((1, 512, 512, 3), seed=9)
    mask = jnp.asarray([1], jnp.int32)
    got = fused_preprocess(imgs, mask, out_h=112, out_w=112,
                           interpret=True)
    want = _oracle(imgs, mask, 112, 112)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)
