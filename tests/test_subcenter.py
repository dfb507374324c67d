"""Sub-center ArcFace (Deng et al. 2020): K weight vectors per class,
per-class cosine = max over K. Oracle, sharded-equality, and trainer
coverage per SURVEY.md §4."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tf_face_toolbox_tpu.ops.losses import (
    MarginConfig,
    margin_softmax_loss,
    subcenter_pool,
)
from tf_face_toolbox_tpu.parallel.mesh import MODEL_AXIS, create_mesh
from tf_face_toolbox_tpu.parallel.sharded_softmax import (
    sharded_margin_softmax_loss,
)
from tf_face_toolbox_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
)
from tests.test_train import _TinyNoBN, _synthetic_batch


def _data(n=16, d=32, c=8, k=3, seed=0):
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(c * k, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    return emb, w, labels


def test_subcenter_pool_oracle():
    rng = np.random.default_rng(1)
    cos = rng.normal(size=(5, 12)).astype(np.float32)
    got = subcenter_pool(jnp.asarray(cos), 3)
    want = cos.reshape(5, 4, 3).max(-1)
    np.testing.assert_allclose(np.asarray(got), want)
    # K=1 is the identity
    same = subcenter_pool(jnp.asarray(cos), 1)
    np.testing.assert_array_equal(np.asarray(same), cos)
    with pytest.raises(ValueError, match="not divisible"):
        subcenter_pool(jnp.asarray(cos), 5)


def test_subcenter_loss_matches_numpy_oracle():
    """margin_softmax_loss(K=3) vs a from-scratch numpy sub-center
    ArcFace transcription."""
    emb, w, labels = _data()
    cfg = MarginConfig(scale=32.0, m2=0.4)
    got = float(margin_softmax_loss(emb, w, labels, cfg, subcenters=3))

    e = np.asarray(emb)
    e = e / np.linalg.norm(e, axis=1, keepdims=True)
    wn = np.asarray(w)
    wn = wn / np.linalg.norm(wn, axis=1, keepdims=True)
    cos = (e @ wn.T).reshape(len(e), 8, 3).max(-1)
    logits = 32.0 * cos.copy()
    for i, y in enumerate(np.asarray(labels)):
        c = np.clip(cos[i, y], -1 + 1e-7, 1 - 1e-7)
        th = np.arccos(c) + 0.4
        t = np.cos(th) if th <= np.pi else -1.0 - (th - np.pi)
        logits[i, y] = 32.0 * t
    logits -= logits.max(axis=1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    want = -logp[np.arange(len(labels)), np.asarray(labels)].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_subcenter_gradient_routes_to_winner_only():
    """The max routes each (sample, class) gradient to exactly the
    winning sub-center — the pool's VJP is one-hot over argmax."""
    rng = np.random.default_rng(2)
    cos = jnp.asarray(rng.normal(size=(6, 4 * 3)).astype(np.float32))
    g = jax.grad(lambda c: jnp.sum(subcenter_pool(c, 3)))(cos)
    g = np.asarray(g).reshape(6, 4, 3)
    # exactly one sub-center per (sample, class) gets cotangent 1
    np.testing.assert_array_equal(g.sum(-1), 1.0)
    assert set(np.unique(g)) == {0.0, 1.0}
    winners = np.asarray(cos).reshape(6, 4, 3).argmax(-1)
    np.testing.assert_array_equal(g.argmax(-1), winners)


@pytest.mark.mid
def test_sharded_subcenter_matches_single_device():
    emb, w, labels = _data(c=16, k=2, seed=3)   # 16 classes / 8 shards
    cfg = MarginConfig(scale=48.0, m3=0.2)
    mesh = create_mesh(data=1, model=8)

    f = jax.jit(shard_map(
        lambda e, W, l: sharded_margin_softmax_loss(
            e, W, l, cfg, axis_name=MODEL_AXIS, subcenters=2),
        mesh=mesh, in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=P()))
    got = f(emb, w, labels)
    want = margin_softmax_loss(emb, w, labels, cfg, subcenters=2)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    g_sh = jax.grad(lambda W: f(emb, W, labels))(w)
    g_si = jax.grad(lambda W: margin_softmax_loss(
        emb, W, labels, cfg, subcenters=2))(w)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_si),
                               atol=1e-5)


def test_sharded_subcenter_padded_classes():
    """Padded classes (total_classes mask) stay exact with pooling."""
    emb, w, labels = _data(n=8, c=16, k=2, seed=4)
    labels = jnp.clip(labels, 0, 12)     # true classes: 13, padded to 16
    cfg = MarginConfig(scale=24.0)
    mesh = create_mesh(data=1, model=8)
    f = jax.jit(shard_map(
        lambda e, W, l: sharded_margin_softmax_loss(
            e, W, l, cfg, axis_name=MODEL_AXIS, subcenters=2,
            total_classes=13),
        mesh=mesh, in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=P()))
    got = float(f(emb, w, labels))
    # single-device oracle over the first 13 classes' rows only
    want = float(margin_softmax_loss(emb, w[:13 * 2], labels, cfg,
                                     subcenters=2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


_CFG = TrainConfig(
    num_classes=12, embedding_dim=16, image_size=16, global_batch=16,
    base_lr=0.05, warmup_steps=0, margin_m3=0.0, margin_scale=16.0,
    weight_decay=0.0, augment=False, subcenters=3,
)


def test_trainer_subcenter_mesh_invariance():
    def steps(mesh, seed=5):
        state, net = create_train_state(_CFG, jax.random.key(seed), mesh,
                                        net=_TinyNoBN())
        assert state.classifier.shape[0] == 12 * 3
        step_fn = make_train_step(net, _CFG, mesh, state)
        losses = []
        for i in range(2):
            images, labels = _synthetic_batch(jax.random.key(100 + i),
                                              16, 16, 12)
            state, metrics = step_fn(state, images, labels)
            losses.append(float(metrics["loss"]))
        return state, losses

    s24, l24 = steps(create_mesh(data=2, model=4))
    s1, l1 = steps(create_mesh(data=1, devices=jax.devices()[:1]))
    np.testing.assert_allclose(l24, l1, rtol=3e-4)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(s24.classifier)),
        np.asarray(jax.device_get(s1.classifier)), atol=2e-4)


def test_subcenter_refuses_sampled_pfc():
    cfg = dataclasses.replace(_CFG, pfc_sample_rate=0.5)
    mesh = create_mesh(data=1, devices=jax.devices()[:1])
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=_TinyNoBN())
    with pytest.raises(ValueError, match="sub-centers"):
        make_train_step(net, cfg, mesh, state)
