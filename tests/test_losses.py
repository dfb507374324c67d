"""Margin-softmax head math vs a numpy oracle (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_face_toolbox_tpu.ops.losses import (
    MarginConfig,
    apply_margin,
    cosine_logits,
    init_classifier_weights,
    margin_softmax_loss,
)


def _np_margin_loss(emb, w, labels, s, m1, m2, m3):
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    wn = w / np.linalg.norm(w, axis=1, keepdims=True)
    cos = e @ wn.T
    logits = s * cos.copy()
    for i, y in enumerate(labels):
        c = np.clip(cos[i, y], -1 + 1e-7, 1 - 1e-7)
        th = m1 * np.arccos(c) + m2
        t = np.cos(th) if th <= np.pi else -1.0 - (th - np.pi)
        logits[i, y] = s * (t - m3)
    logits -= logits.max(axis=1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return -logp[np.arange(len(labels)), labels].mean()


@pytest.mark.parametrize("cfg,margins", [
    (MarginConfig.softmax(), (1.0, 0.0, 0.0)),
    (MarginConfig.arcface(), (1.0, 0.5, 0.0)),
    (MarginConfig.cosface(), (1.0, 0.0, 0.35)),
    (MarginConfig.sphereface(), (1.35, 0.0, 0.0)),
])
def test_loss_matches_numpy_oracle(cfg, margins):
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(16, 32)).astype(np.float32)
    w = rng.normal(size=(10, 32)).astype(np.float32)
    labels = rng.integers(0, 10, 16)
    ours = float(margin_softmax_loss(
        jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels), cfg))
    ref = _np_margin_loss(emb, w, labels, cfg.scale, *margins)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_margin_only_hits_target_column():
    rng = np.random.default_rng(1)
    cos = rng.uniform(-0.9, 0.9, (8, 12)).astype(np.float32)
    labels = np.arange(8)
    cfg = MarginConfig.cosface(scale=30.0, margin=0.4)
    out = np.asarray(apply_margin(jnp.asarray(cos), jnp.asarray(labels), cfg))
    expected_other = 30.0 * cos
    mask = np.zeros_like(cos, bool)
    mask[np.arange(8), labels] = True
    np.testing.assert_allclose(out[~mask], expected_other[~mask], rtol=1e-6)
    np.testing.assert_allclose(out[mask], 30.0 * (cos[mask] - 0.4), rtol=1e-5)


def test_margin_decreases_target_logit():
    # Margins must make the task strictly harder: loss(arcface) > loss(softmax).
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    w = init_classifier_weights(jax.random.key(0), 20, 64)
    labels = jnp.asarray(rng.integers(0, 20, 32))
    l_soft = float(margin_softmax_loss(emb, w, labels, MarginConfig.softmax()))
    l_arc = float(margin_softmax_loss(emb, w, labels, MarginConfig.arcface()))
    l_cos = float(margin_softmax_loss(emb, w, labels, MarginConfig.cosface()))
    assert l_arc > l_soft
    assert l_cos > l_soft


@pytest.mark.mid
def test_gradients_finite_at_extreme_cosines():
    # Embedding aligned exactly with its class weight: cos=1 edge. The
    # clip keeps arccos' gradient finite.
    w = jnp.eye(4, 8, dtype=jnp.float32)
    emb = w * 5.0  # perfectly aligned, non-unit scale
    labels = jnp.arange(4)
    cfg = MarginConfig.arcface()
    g = jax.grad(margin_softmax_loss)(emb, w, labels, cfg)
    assert np.isfinite(np.asarray(g)).all()


def test_loss_under_jit_and_bf16_embeddings():
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    w = init_classifier_weights(jax.random.key(1), 10, 32)
    labels = jnp.asarray(rng.integers(0, 10, 16))
    cfg = MarginConfig.cosface()
    f = jax.jit(lambda e, w, l: margin_softmax_loss(e, w, l, cfg))
    l32 = float(f(emb, w, labels))
    l16 = float(f(emb.astype(jnp.bfloat16), w, labels))
    assert abs(l32 - l16) < 0.1
    assert np.isfinite(l16)


@pytest.mark.mid
def test_stability_at_large_class_count():
    """SURVEY §7 hard part: margin-softmax stability at big identity
    counts — f32 logits over a bf16 GEMM, 50k classes."""
    rng = np.random.default_rng(9)
    emb = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    emb = emb.astype(jnp.bfloat16)
    w = init_classifier_weights(jax.random.key(3), 50_000, 64)
    labels = jnp.asarray(rng.integers(0, 50_000, 8))
    cfg = MarginConfig.cosface()
    loss, grads = jax.value_and_grad(margin_softmax_loss, argnums=(0, 1))(
        emb.astype(jnp.float32), w, labels, cfg)
    assert np.isfinite(float(loss))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # loss ≈ log(C) + s*(margin-ish) ballpark, not exploded
    assert float(loss) < 100.0
