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


# ---------------------------------------------------------------------------
# Sampled Partial-FC (VERDICT r2 next-step #2)

def _sampled_f(mesh, cfg, budget, total_classes=None):
    from tf_face_toolbox_tpu.parallel.sharded_softmax import (
        sampled_sharded_margin_softmax_loss,
    )

    def fn(emb, w, labels, key):
        return sampled_sharded_margin_softmax_loss(
            emb, w, labels, cfg, key, budget, axis_name=MODEL_AXIS,
            total_classes=total_classes)

    return jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P(), P()),
        out_specs=P()))


@pytest.mark.mid
def test_sampled_pfc_full_budget_is_exact():
    """budget == C_local ⇒ identical to the exact sharded softmax
    (q == 1): loss AND gradients."""
    rng = np.random.default_rng(2)
    n, d, c = 16, 32, 64
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n))
    cfg = MarginConfig.cosface()
    mesh = create_mesh(data=1, model=8)
    f = _sampled_f(mesh, cfg, budget=c // 8)
    key = jax.random.key(7)
    loss = float(f(emb, w, labels, key))
    loss_exact = float(margin_softmax_loss(emb, w, labels, cfg))
    np.testing.assert_allclose(loss, loss_exact, rtol=1e-5)
    g_e, g_w = jax.grad(lambda e, w: f(e, w, labels, key),
                        argnums=(0, 1))(emb, w)
    ge_x, gw_x = jax.grad(
        lambda e, w: margin_softmax_loss(e, w, labels, cfg),
        argnums=(0, 1))(emb, w)
    np.testing.assert_allclose(np.asarray(g_e), np.asarray(ge_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(gw_x),
                               atol=1e-5)


@pytest.mark.mid
def test_sampled_pfc_gradient_expectation_matches_exact():
    """Unbiasedness: the importance-corrected sampled loss's gradient,
    averaged over sampling draws, converges to the exact gradient."""
    rng = np.random.default_rng(3)
    n, d, c = 8, 16, 256         # 8 shards x 32 classes
    emb = jnp.asarray(0.5 * rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(0.5 * rng.normal(size=(c, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n))
    cfg = MarginConfig.softmax(scale=8.0)
    mesh = create_mesh(data=1, model=8)
    f = _sampled_f(mesh, cfg, budget=16)  # 16 of 32 columns per shard
    grad_fn = jax.jit(jax.grad(lambda e, w, k: f(e, w, labels, k),
                               argnums=(0, 1)))
    draws = 600
    keys = jax.random.split(jax.random.key(0), draws)
    acc_e = np.zeros((n, d)); acc_w = np.zeros((c, d))
    for k in keys:
        ge, gw = grad_fn(emb, w, k)
        acc_e += np.asarray(ge); acc_w += np.asarray(gw)
    acc_e /= draws; acc_w /= draws
    ge_x, gw_x = jax.grad(
        lambda e, w: margin_softmax_loss(e, w, labels, cfg),
        argnums=(0, 1))(emb, w)
    ge_x, gw_x = np.asarray(ge_x), np.asarray(gw_x)

    def rel(a, b):
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)

    # Monte-Carlo noise at 600 draws: a few percent
    assert rel(acc_e, ge_x) < 0.08, rel(acc_e, ge_x)
    assert rel(acc_w, gw_x) < 0.08, rel(acc_w, gw_x)


def test_sampled_pfc_padded_classes_masked():
    """Padding must never be sampled into the denominator."""
    rng = np.random.default_rng(4)
    n, d, c, c_pad = 8, 16, 37, 40
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    # pad rows get HUGE weights: any denominator leak is loud
    w_pad = jnp.concatenate(
        [w, 100.0 * jnp.ones((c_pad - c, d), jnp.float32)])
    labels = jnp.asarray(rng.integers(0, c, n))
    cfg = MarginConfig.cosface()
    mesh = create_mesh(data=1, model=8)
    f = _sampled_f(mesh, cfg, budget=c_pad // 8, total_classes=c)
    loss = float(f(emb, w_pad, labels, jax.random.key(1)))
    loss_ref = float(margin_softmax_loss(emb, w, labels, cfg))
    np.testing.assert_allclose(loss, loss_ref, rtol=1e-5)


def test_sampled_pfc_budget_validation():
    from tf_face_toolbox_tpu.parallel.sharded_softmax import (
        sampled_sharded_margin_softmax_loss,
    )
    cfg = MarginConfig.cosface()
    mesh = create_mesh(data=1, model=8)
    with pytest.raises(ValueError, match="overflow"):
        _sampled_f(mesh, cfg, budget=4)(   # budget < n=8
            jnp.zeros((8, 16)), jnp.zeros((64, 16)),
            jnp.zeros((8,), jnp.int32), jax.random.key(0))


def test_sampled_pfc_million_id_step():
    """Memory proof (VERDICT r2): one SPMD train step with a 10^6-class
    head at pfc_sample_rate=0.01 on the 8-device CPU mesh — the
    (N, 125k) per-shard logit block never materializes."""
    import dataclasses

    from tests.test_train import CFG, _TinyNoBN, _synthetic_batch
    from tf_face_toolbox_tpu.train.trainer import (
        create_train_state, make_train_step)

    cfg = dataclasses.replace(
        CFG, num_classes=1_000_000, pfc_sample_rate=0.01,
        global_batch=16, embedding_dim=16)
    mesh = create_mesh(data=1, model=8)
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=_TinyNoBN())
    step_fn = make_train_step(net, cfg, mesh, state)
    images, labels = _synthetic_batch(jax.random.key(5), 16,
                                      cfg.image_size, cfg.num_classes)
    state, metrics = step_fn(state, images, labels)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # plausible NLL scale for 10^6 classes: ~log(1e6) ≈ 13.8
    assert 5.0 < float(metrics["loss"]) < 40.0, metrics


# ---------------------------------------------------------------------------
# r5: compact classifier-gradient exchange (VERDICT r4 #2)

def _sampled_dp(mesh, cfg, budget, data_axis):
    """Sampled PFC over a (data, model) mesh, trainer-style: grad of
    the LOCAL per-rank loss taken inside shard_map (cotangent 1 per
    rank), classifier grad data-combined INSIDE the loss's VJP when
    data_axis is given. Returns (global mean loss, classifier grad)."""
    from tf_face_toolbox_tpu.parallel.sharded_softmax import (
        sampled_sharded_margin_softmax_loss,
    )

    def local(emb, w, labels, key):
        def loss_fn(w_):
            # ÷ model size: model replicas compute the same loss, and
            # the psum collectives inside it accumulate each replica's
            # cotangent — the trainer's normalization (trainer.py)
            return sampled_sharded_margin_softmax_loss(
                emb, w_, labels, cfg, key, budget,
                axis_name=MODEL_AXIS, data_axis=data_axis) / (
                    jax.lax.axis_size(MODEL_AXIS))

        l, g = jax.value_and_grad(loss_fn)(w)
        l = l * jax.lax.axis_size(MODEL_AXIS)
        if data_axis is None:
            g = jax.lax.pmean(g, DATA_AXIS)     # the trainer's old sync
        return jax.lax.pmean(l, DATA_AXIS), g

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(MODEL_AXIS, None), P(DATA_AXIS),
                  P()),
        out_specs=(P(), P(MODEL_AXIS, None)), check_vma=False))


@pytest.mark.mid
def test_sampled_pfc_compact_full_budget_matches_exact_dp():
    """On a (4, 2) mesh at budget == C_local the compact-sync sampled
    head must equal the exact sharded softmax: loss AND the (already
    data-combined) classifier gradient."""
    rng = np.random.default_rng(8)
    n, d, c = 16, 16, 64
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n))
    cfg = MarginConfig.cosface()
    mesh = create_mesh(data=4, model=2)
    loss, g = _sampled_dp(mesh, cfg, budget=c // 2, data_axis=DATA_AXIS)(
        emb, w, labels, jax.random.key(3))
    loss_x = float(margin_softmax_loss(emb, w, labels, cfg))
    np.testing.assert_allclose(float(loss), loss_x, rtol=1e-5)
    gw_x = jax.grad(
        lambda w_: margin_softmax_loss(emb, w_, labels, cfg))(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gw_x),
                               atol=1e-5)


def test_sampled_pfc_compact_is_data_mesh_invariant():
    """Global positives + a data-replicated key make the sampled set a
    function of the GLOBAL batch only: the same batch on (1, 2) and
    (4, 2) meshes must produce the same loss and classifier gradient
    at a PARTIAL budget. (The r4 per-rank-positives path sampled
    differently at every data width.)"""
    rng = np.random.default_rng(9)
    n, d, c = 16, 16, 128
    emb = jnp.asarray(0.5 * rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(0.5 * rng.normal(size=(c, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n))
    cfg = MarginConfig.softmax(scale=8.0)
    key = jax.random.key(11)
    budget = 32                             # half of each 64-col shard
    out = {}
    for data in (1, 4):
        mesh = create_mesh(data=data, model=2)
        loss, g = _sampled_dp(mesh, cfg, budget,
                              data_axis=DATA_AXIS)(emb, w, labels, key)
        out[data] = (float(loss), np.asarray(g))
    np.testing.assert_allclose(out[1][0], out[4][0], rtol=1e-5)
    np.testing.assert_allclose(out[1][1], out[4][1], atol=1e-5)


def test_sampled_pfc_compact_degenerates_to_r4_path_at_data1():
    """data axis of size 1: all_gather/pmean are identities, so
    data_axis=DATA_AXIS and data_axis=None are the same estimator."""
    rng = np.random.default_rng(10)
    n, d, c = 8, 16, 128                    # 16-col shards, budget 8
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n))
    cfg = MarginConfig.cosface()
    key = jax.random.key(5)
    mesh = create_mesh(data=1, model=8)
    l_new, g_new = _sampled_dp(mesh, cfg, 8, DATA_AXIS)(
        emb, w, labels, key)
    l_old, g_old = _sampled_dp(mesh, cfg, 8, None)(emb, w, labels, key)
    np.testing.assert_allclose(float(l_new), float(l_old), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                               atol=1e-6)
