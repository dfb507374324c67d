"""CurricularFace (Huang et al. 2020): numpy oracle, sharded equality,
EMA curriculum state, trainer e2e (SURVEY.md §4 strategy)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tf_face_toolbox_tpu.ops.losses import (
    MarginConfig,
    curricular_loss,
    curricular_t_init,
    margin_softmax_loss,
)
from tf_face_toolbox_tpu.parallel.mesh import MODEL_AXIS, create_mesh
from tf_face_toolbox_tpu.parallel.sharded_softmax import (
    sharded_curricular_loss,
)
from tf_face_toolbox_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
)
from tests.test_train import _TinyNoBN, _synthetic_batch


def _data(n=16, d=32, c=8, seed=0):
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    return emb, w, labels


def _np_curricular(emb, w, labels, s, m, t):
    """Transcription of the official forward (update-then-use t)."""
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    wn = w / np.linalg.norm(w, axis=1, keepdims=True)
    cos = np.clip(e @ wn.T, -1 + 1e-7, 1 - 1e-7)
    n = len(labels)
    tgt = cos[np.arange(n), labels]
    t_new = 0.01 * tgt.mean() + 0.99 * t
    th = np.arccos(tgt) + m
    T = np.where(th <= np.pi, np.cos(th), -1.0 - (th - np.pi))
    logits = np.where(cos > T[:, None], cos * (t_new + cos), cos)
    logits[np.arange(n), labels] = T
    logits = s * logits
    logits -= logits.max(axis=1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return -logp[np.arange(n), labels].mean(), t_new


def test_curricular_matches_numpy_oracle():
    emb, w, labels = _data()
    cfg = MarginConfig(scale=32.0, m2=0.5)
    for t0 in (0.0, 0.3):
        got, t_new = curricular_loss(emb, w, labels, cfg,
                                     jnp.float32(t0))
        want, want_t = _np_curricular(np.asarray(emb), np.asarray(w),
                                      np.asarray(labels), 32.0, 0.5, t0)
        np.testing.assert_allclose(float(got), want, rtol=1e-5)
        np.testing.assert_allclose(float(t_new), want_t, rtol=1e-5)


def test_curricular_no_hard_negatives_reduces_to_arcface():
    """When every negative cosine is below the margined target, the
    modulation never fires and the loss IS ArcFace."""
    rng = np.random.default_rng(1)
    d, c, n = 16, 5, 10
    w = rng.normal(size=(c, d)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    # embeddings almost exactly on their class weight → target cos ≈ 1,
    # margined target cos(0+m) = cos(m) ≈ 0.88, negatives ~ random < that
    emb = w[labels] + 0.01 * rng.normal(size=(n, d)).astype(np.float32)
    cfg = MarginConfig(scale=24.0, m2=0.3)
    got, _ = curricular_loss(jnp.asarray(emb), jnp.asarray(w),
                             jnp.asarray(labels), cfg, jnp.float32(0.0))
    want = margin_softmax_loss(jnp.asarray(emb), jnp.asarray(w),
                               jnp.asarray(labels), cfg)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


@pytest.mark.mid
def test_sharded_curricular_matches_single_device():
    emb, w, labels = _data(c=16, seed=3)
    cfg = MarginConfig(scale=48.0, m2=0.5)
    mesh = create_mesh(data=1, model=8)
    t0 = jnp.float32(0.2)

    def sharded(e, W, l):
        loss, t_new = sharded_curricular_loss(
            e, W, l, cfg, t0, axis_name=MODEL_AXIS)
        return loss, t_new

    f = jax.jit(shard_map(sharded, mesh=mesh,
                          in_specs=(P(), P(MODEL_AXIS, None), P()),
                          out_specs=(P(), P())))
    got, got_t = f(emb, w, labels)
    want, want_t = curricular_loss(emb, w, labels, cfg, t0)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(got_t), float(want_t), rtol=1e-6)

    g_sh = jax.grad(lambda W: f(emb, W, labels)[0])(w)
    g_si = jax.grad(lambda W: curricular_loss(emb, W, labels, cfg,
                                              t0)[0])(w)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_si),
                               atol=1e-5)


def test_sharded_curricular_padded_classes():
    emb, w, labels = _data(n=8, c=16, seed=4)
    labels = jnp.clip(labels, 0, 12)          # 13 true classes of 16
    cfg = MarginConfig(scale=24.0, m2=0.4)
    mesh = create_mesh(data=1, model=8)
    f = jax.jit(shard_map(
        lambda e, W, l: sharded_curricular_loss(
            e, W, l, cfg, jnp.float32(0.1), axis_name=MODEL_AXIS,
            total_classes=13)[0],
        mesh=mesh, in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=P()))
    got = float(f(emb, w, labels))
    want = float(curricular_loss(emb, w[:13], labels, cfg,
                                 jnp.float32(0.1))[0])
    np.testing.assert_allclose(got, want, rtol=1e-5)


_CFG = TrainConfig(
    num_classes=12, embedding_dim=16, image_size=16, global_batch=16,
    base_lr=0.05, warmup_steps=0, margin_m2=0.3, margin_m3=0.0,
    margin_scale=16.0, weight_decay=0.0, augment=False,
    margin_mode="curricular",
)


def _steps(mesh, n=3, seed=5, cfg=_CFG):
    state, net = create_train_state(cfg, jax.random.key(seed), mesh,
                                    net=_TinyNoBN())
    step_fn = make_train_step(net, cfg, mesh, state)
    losses, last = [], None
    for i in range(n):
        images, labels = _synthetic_batch(jax.random.key(100 + i),
                                          16, 16, 12)
        state, last = step_fn(state, images, labels)
        losses.append(float(last["loss"]))
    return state, losses, last


def test_trainer_curricular_mesh_invariance_and_t_ema():
    s24, l24, m24 = _steps(create_mesh(data=2, model=4))
    s1, l1, m1 = _steps(create_mesh(data=1, devices=jax.devices()[:1]))
    np.testing.assert_allclose(l24, l1, rtol=3e-4)
    t24 = float(jax.device_get(s24.head_state["curricular"]["t"]))
    t1 = float(jax.device_get(s1.head_state["curricular"]["t"]))
    np.testing.assert_allclose(t24, t1, rtol=1e-4)
    assert t24 != 0.0                      # EMA actually moved
    assert "curricular_t" in m24


def test_curricular_refuses_sampled_pfc():
    cfg = dataclasses.replace(_CFG, pfc_sample_rate=0.5)
    mesh = create_mesh(data=1, devices=jax.devices()[:1])
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=_TinyNoBN())
    with pytest.raises(ValueError, match="curricular"):
        make_train_step(net, cfg, mesh, state)
