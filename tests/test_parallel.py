"""Distributed paths on the fake 8-device CPU mesh (SURVEY.md §4).

The core acceptance tests for the parallel design:
- class-sharded margin softmax == single-device oracle (loss AND grads)
- DP train step: per-device grads match single-device grads
- mesh/axis bookkeeping
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tf_face_toolbox_tpu.ops.losses import MarginConfig, margin_softmax_loss
from tf_face_toolbox_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    local_batch_size,
)
from tf_face_toolbox_tpu.parallel.sharded_softmax import (
    sharded_margin_softmax_loss,
)


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape[DATA_AXIS] == 8 and mesh.shape[MODEL_AXIS] == 1
    mesh2 = create_mesh(model=4)
    assert mesh2.shape[DATA_AXIS] == 2 and mesh2.shape[MODEL_AXIS] == 4
    assert local_batch_size(64, mesh2) == 32
    with pytest.raises(ValueError):
        local_batch_size(63, mesh)


@pytest.mark.parametrize("cfg", [MarginConfig.softmax(),
                                 MarginConfig.arcface(),
                                 MarginConfig.cosface()])
def test_sharded_softmax_matches_single_device(cfg):
    """Loss and gradients must be EXACTLY the single-device math."""
    rng = np.random.default_rng(0)
    n, d, c = 16, 32, 40  # c divisible by 8 shards
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n))

    mesh = create_mesh(data=1, model=8)

    def sharded(emb, w, labels):
        return sharded_margin_softmax_loss(emb, w, labels, cfg,
                                           axis_name=MODEL_AXIS)

    f = shard_map(sharded, mesh=mesh,
                  in_specs=(P(), P(MODEL_AXIS, None), P()),
                  out_specs=P())
    loss_sharded = jax.jit(f)(emb, w, labels)
    loss_single = margin_softmax_loss(emb, w, labels, cfg)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)

    # Gradients wrt embeddings and the (resharded) classifier.
    def total_sharded(e, w):
        return jax.jit(f)(e, w, labels)
    g_e_sh, g_w_sh = jax.grad(total_sharded, argnums=(0, 1))(emb, w)
    g_e_si, g_w_si = jax.grad(
        lambda e, w: margin_softmax_loss(e, w, labels, cfg),
        argnums=(0, 1))(emb, w)
    np.testing.assert_allclose(np.asarray(g_e_sh), np.asarray(g_e_si),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_w_sh), np.asarray(g_w_si),
                               atol=1e-5)


def test_sharded_softmax_padded_classes():
    """37 classes padded to 40 over 8 shards: pads must not change loss."""
    rng = np.random.default_rng(1)
    n, d, c = 8, 16, 37
    c_pad = 40
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    w_pad = jnp.concatenate(
        [w, jnp.asarray(rng.normal(size=(c_pad - c, d)).astype(np.float32))])
    labels = jnp.asarray(rng.integers(0, c, n))
    cfg = MarginConfig.cosface()

    mesh = create_mesh(data=1, model=8)
    f = shard_map(
        functools.partial(sharded_margin_softmax_loss, cfg=cfg,
                          axis_name=MODEL_AXIS, total_classes=c),
        mesh=mesh, in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=P())
    loss_pad = float(jax.jit(f)(emb, w_pad, labels))
    loss_ref = float(margin_softmax_loss(emb, w, labels, cfg))
    np.testing.assert_allclose(loss_pad, loss_ref, rtol=1e-5)


def test_sharded_softmax_pad_overflow_no_nan():
    """A padded column whose raw logit exceeds the valid max by >~88
    must not overflow exp() into inf*0=NaN (regression: shift/exp the
    masked logits)."""
    d = 16
    # 2 real classes anti-aligned with the embedding; pad rows aligned.
    emb = jnp.ones((4, d), jnp.float32)
    w_real = -jnp.ones((2, d), jnp.float32)            # cos = -1
    w_pad = jnp.ones((6, d), jnp.float32)              # cos = +1 (pads)
    w = jnp.concatenate([w_real, w_pad])
    labels = jnp.zeros((4,), jnp.int32)
    cfg = MarginConfig.softmax(scale=64.0)

    mesh = create_mesh(data=1, model=8)
    f = shard_map(
        functools.partial(sharded_margin_softmax_loss, cfg=cfg,
                          axis_name=MODEL_AXIS, total_classes=2),
        mesh=mesh, in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=P())
    loss = float(jax.jit(f)(emb, w, labels))
    assert np.isfinite(loss), loss
    ref = float(margin_softmax_loss(emb, w_real, labels, cfg))
    np.testing.assert_allclose(loss, ref, rtol=1e-5)
