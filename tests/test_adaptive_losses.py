"""Adaptive-margin (MagFace/AdaFace) + metric-loss (center/triplet) tests.

Coverage, per the SURVEY.md §4 strategy (numpy oracles + fake-device
mesh equality):
- per-sample margins reduce exactly to the fixed-margin math
- MagFace margin linearity / regularizer oracle
- AdaFace margins + EMA stats vs a numpy transcription of the official
  formulas (Kim et al. 2022)
- center loss/update oracles and the class-sharded equivalents
- batch-hard triplet vs a naive O(N²) loop
- trainer e2e: every mode trains on the (2,4) mesh and matches the
  single-device step (BN-free net) — the tower-equivalence contract
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tf_face_toolbox_tpu.ops.losses import (
    AdaFaceConfig,
    MagFaceConfig,
    MarginConfig,
    adaface_margins,
    adaface_stats_init,
    batch_hard_triplet_loss,
    center_loss,
    center_update,
    magface_margins,
    margin_softmax_loss,
)
from tf_face_toolbox_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
)
from tf_face_toolbox_tpu.parallel.sharded_softmax import (
    sharded_center_loss,
    sharded_center_update,
    sharded_margin_softmax_loss,
)


def _rand(n=16, d=32, c=40, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    emb = (scale * rng.normal(size=(n, d))).astype(np.float32)
    w = rng.normal(size=(c, d)).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    return jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels)


# --------------------------------------------------------------- margins

def test_constant_per_sample_margin_equals_fixed():
    """extra_m2/extra_m3 filled with a constant == the static config."""
    emb, w, labels = _rand()
    n = emb.shape[0]
    fixed = margin_softmax_loss(
        emb, w, labels, MarginConfig(scale=32.0, m2=0.3, m3=0.1))
    per_sample = margin_softmax_loss(
        emb, w, labels, MarginConfig(scale=32.0),
        extra_m2=jnp.full((n,), 0.3), extra_m3=jnp.full((n,), 0.1))
    np.testing.assert_allclose(float(per_sample), float(fixed), rtol=1e-6)


def test_magface_margin_is_linear_in_norm():
    cfg = MagFaceConfig()
    # construct embeddings with exact norms: l_a, midpoint, u_a, beyond
    norms = np.array([10.0, 60.0, 110.0, 200.0, 3.0], np.float32)
    emb = np.zeros((5, 8), np.float32)
    emb[:, 0] = norms
    m, g = magface_margins(jnp.asarray(emb), cfg)
    m = np.asarray(m)
    assert m[0] == pytest.approx(cfg.l_m)
    assert m[1] == pytest.approx(0.5 * (cfg.l_m + cfg.u_m))
    assert m[2] == pytest.approx(cfg.u_m)
    assert m[3] == pytest.approx(cfg.u_m)    # clipped at u_a
    assert m[4] == pytest.approx(cfg.l_m)    # clipped at l_a
    # regularizer oracle: mean(1/a + a/u_a²) over CLIPPED norms
    a = np.clip(norms, cfg.l_a, cfg.u_a)
    np.testing.assert_allclose(
        float(g), np.mean(1.0 / a + a / cfg.u_a**2), rtol=1e-6)


@pytest.mark.mid
def test_magface_gradient_flows_through_norm():
    """MagFace's defining property: d loss/d emb includes the margin's
    dependence on ‖emb‖ (no stop_gradient)."""
    emb, w, labels = _rand(n=8, scale=8.0)
    cfg = MagFaceConfig()

    def loss(e):
        m2, g = magface_margins(e, cfg)
        return margin_softmax_loss(e, w, labels,
                                   MarginConfig(scale=32.0),
                                   extra_m2=m2) + cfg.lambda_g * g
    grad = jax.grad(loss)(emb)
    assert np.all(np.isfinite(np.asarray(grad)))
    # the radial component of the gradient must be nonzero for at least
    # most samples (pure softmax on normalized features has ~zero
    # radial gradient; the magnitude terms create one)
    radial = np.abs(np.sum(np.asarray(grad) * np.asarray(emb), axis=1))
    assert np.median(radial) > 1e-6


def test_adaface_margins_match_official_formulas():
    """Numpy transcription of the official AdaFace margin computation
    (update-then-use EMA, ddof=1 std, h-scaled clip)."""
    cfg = AdaFaceConfig()
    rng = np.random.default_rng(3)
    norms = np.abs(rng.normal(20.0, 5.0, size=(32,))).astype(np.float32)
    stats = adaface_stats_init()
    m2, m3, new_stats = adaface_margins(jnp.asarray(norms), stats, cfg)

    safe = np.clip(norms, 1e-3, 100.0)
    mean, std = safe.mean(), safe.std(ddof=1)
    exp_mean = cfg.t_alpha * mean + (1 - cfg.t_alpha) * 20.0
    exp_std = cfg.t_alpha * std + (1 - cfg.t_alpha) * 100.0
    np.testing.assert_allclose(float(new_stats["norm_mean"]), exp_mean,
                               rtol=1e-5)
    np.testing.assert_allclose(float(new_stats["norm_std"]), exp_std,
                               rtol=1e-5)
    scaler = np.clip((safe - exp_mean) / (exp_std + cfg.eps) * cfg.h,
                     -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(m2), -cfg.m * scaler,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m3), cfg.m * scaler + cfg.m,
                               rtol=1e-4, atol=1e-6)


def test_adaface_scaler_saturates():
    """Extreme norms pin the scaler at ±1 → margins at the CosFace-like
    (scaler=+1: m2=-m, m3=2m) and ArcFace-like ends."""
    cfg = AdaFaceConfig()
    stats = {"norm_mean": jnp.float32(20.0), "norm_std": jnp.float32(1.0)}
    norms = jnp.asarray([90.0, 1e-2], jnp.float32)
    m2, m3, _ = adaface_margins(norms, stats, cfg)
    np.testing.assert_allclose(np.asarray(m2), [-cfg.m, cfg.m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(m3), [2 * cfg.m, 0.0],
                               atol=1e-5)


def test_sharded_adaptive_margins_match_single_device():
    """Class-sharded head with per-sample margins == single-device."""
    emb, w, labels = _rand(seed=7)
    n = emb.shape[0]
    rng = np.random.default_rng(8)
    m2 = jnp.asarray(rng.uniform(-0.3, 0.3, n).astype(np.float32))
    m3 = jnp.asarray(rng.uniform(0.0, 0.4, n).astype(np.float32))
    cfg = MarginConfig(scale=48.0)
    mesh = create_mesh(data=1, model=8)

    def sharded(emb, w, labels, m2, m3):
        return sharded_margin_softmax_loss(
            emb, w, labels, cfg, axis_name=MODEL_AXIS,
            extra_m2=m2, extra_m3=m3)

    f = jax.jit(shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P(), P(), P()),
        out_specs=P()))
    got = f(emb, w, labels, m2, m3)
    want = margin_softmax_loss(emb, w, labels, cfg,
                               extra_m2=m2, extra_m3=m3)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


# ---------------------------------------------------------- center loss

def test_center_loss_oracle():
    emb, _, labels = _rand(n=12, d=8, c=5, seed=1)
    centers = jnp.asarray(
        np.random.default_rng(2).normal(size=(5, 8)).astype(np.float32))
    got = center_loss(emb, centers, labels)
    e, c = np.asarray(emb), np.asarray(centers)
    want = 0.5 * np.mean(
        [np.sum((e[i] - c[y]) ** 2) for i, y in enumerate(labels)])
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    # centers are detached: grad wrt centers through the loss is zero
    gc = jax.grad(lambda c: center_loss(emb, c, labels))(centers)
    assert float(jnp.abs(gc).max()) == 0.0


def test_center_update_converges_to_class_mean():
    """Repeated delta-rule application on a fixed batch drives each
    center to its class mean (the rule's fixed point)."""
    emb, _, labels = _rand(n=24, d=8, c=4, seed=4)
    centers = jnp.zeros((4, 8), jnp.float32)
    for _ in range(60):
        centers = center_update(emb, centers, labels, alpha=0.5)
    e, lab = np.asarray(emb), np.asarray(labels)
    for j in range(4):
        if (lab == j).any():
            np.testing.assert_allclose(np.asarray(centers)[j],
                                       e[lab == j].mean(0), atol=1e-3)
        else:
            assert np.all(np.asarray(centers)[j] == 0.0)


def test_sharded_center_matches_single_device():
    emb, _, labels = _rand(n=16, d=8, c=40, seed=5)
    centers = jnp.asarray(
        np.random.default_rng(6).normal(size=(40, 8)).astype(np.float32))
    mesh = create_mesh(data=1, model=8)

    f_loss = jax.jit(shard_map(
        lambda e, c, l: sharded_center_loss(e, c, l, MODEL_AXIS),
        mesh=mesh, in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=P()))
    np.testing.assert_allclose(
        float(f_loss(emb, centers, labels)),
        float(center_loss(emb, centers, labels)), rtol=1e-5)

    f_upd = jax.jit(shard_map(
        lambda e, c, l: sharded_center_update(
            e, c, l, data_axis=DATA_AXIS, model_axis=MODEL_AXIS,
            alpha=0.5),
        mesh=mesh, in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=P(MODEL_AXIS, None)))
    got = np.asarray(jax.device_get(f_upd(emb, centers, labels)))
    want = np.asarray(center_update(emb, centers, labels, alpha=0.5))
    np.testing.assert_allclose(got, want, atol=1e-5)


# -------------------------------------------------------------- triplet

def _np_batch_hard(e, labels, margin):
    e = e / np.linalg.norm(e, axis=1, keepdims=True)
    n = len(labels)
    d = np.sqrt(np.maximum(
        ((e[:, None] - e[None, :]) ** 2).sum(-1), 1e-12))
    terms, count = 0.0, 0
    for i in range(n):
        pos = [j for j in range(n) if labels[j] == labels[i] and j != i]
        neg = [j for j in range(n) if labels[j] != labels[i]]
        if not pos or not neg:
            continue
        terms += max(margin + d[i, pos].max() - d[i, neg].min(), 0.0)
        count += 1
    return terms / max(count, 1)


def test_batch_hard_triplet_matches_naive_loop():
    rng = np.random.default_rng(9)
    e = rng.normal(size=(20, 16)).astype(np.float32)
    labels = rng.integers(0, 5, 20).astype(np.int32)
    got = batch_hard_triplet_loss(jnp.asarray(e), jnp.asarray(labels),
                                  margin=0.3)
    np.testing.assert_allclose(float(got),
                               _np_batch_hard(e, labels, 0.3), rtol=1e-4)


def test_triplet_masks_singleton_anchors():
    """Anchors whose identity appears once have no positive — they must
    not contribute (and all-singleton batches give 0, not NaN)."""
    rng = np.random.default_rng(10)
    e = rng.normal(size=(6, 8)).astype(np.float32)
    labels = np.arange(6).astype(np.int32)   # all singletons
    got = batch_hard_triplet_loss(jnp.asarray(e), jnp.asarray(labels))
    assert float(got) == 0.0


def test_triplet_zero_when_margin_satisfied():
    """Tight clusters far apart → every anchor satisfied → loss 0."""
    base = np.eye(3, 8, dtype=np.float32) * 10
    e = np.repeat(base, 4, axis=0) + 0.01 * np.random.default_rng(
        11).normal(size=(12, 8)).astype(np.float32)
    labels = np.repeat(np.arange(3), 4).astype(np.int32)
    got = batch_hard_triplet_loss(jnp.asarray(e), jnp.asarray(labels),
                                  margin=0.1)
    assert float(got) == 0.0


# ----------------------------------------------------------- trainer e2e

from tf_face_toolbox_tpu.train.trainer import (  # noqa: E402
    TrainConfig,
    create_train_state,
    make_train_step,
)
from tests.test_train import _TinyNoBN, _synthetic_batch  # noqa: E402

_BASE = TrainConfig(
    num_classes=12, embedding_dim=16, image_size=16, global_batch=16,
    base_lr=0.05, warmup_steps=0, margin_m3=0.0, margin_scale=16.0,
    weight_decay=0.0, augment=False,
)


def _steps(mesh, cfg, n=2, seed=0):
    state, net = create_train_state(cfg, jax.random.key(seed), mesh,
                                    net=_TinyNoBN())
    step_fn = make_train_step(net, cfg, mesh, state)
    losses = []
    for i in range(n):
        images, labels = _synthetic_batch(
            jax.random.key(100 + i), cfg.global_batch, cfg.image_size,
            cfg.num_classes)
        state, metrics = step_fn(state, images, labels)
        losses.append(float(metrics["loss"]))
    return state, losses, metrics


@pytest.mark.parametrize("kw", [
    dict(margin_mode="magface"),
    dict(margin_mode="adaface"),
    dict(center_weight=0.01),
    dict(triplet_weight=0.5),
])
@pytest.mark.mid
def test_mesh_invariance_of_new_losses(kw):
    """(data × 4 model) == single device for every new mode (the
    tower-equivalence contract; BN-free net so equality is numeric).

    Triplet uses a model-only mesh: its mining pool is the data ROW's
    batch by design (per-tower mining), so splitting the data axis
    legitimately changes which triplets are hardest — exactly like BN
    batch statistics, documented in TrainConfig. All other modes use
    GLOBAL statistics and must be invariant across the data axis too.
    """
    data = 1 if "triplet_weight" in kw else 2
    cfg = dataclasses.replace(_BASE, **kw)
    s24, l24, m24 = _steps(create_mesh(data=data, model=4), cfg, seed=5)
    s1, l1, m1 = _steps(
        create_mesh(data=1, devices=jax.devices()[:1]), cfg, seed=5)
    np.testing.assert_allclose(l24, l1, rtol=3e-4)
    for k in m24:
        np.testing.assert_allclose(float(m24[k]), float(m1[k]),
                                   rtol=3e-4, atol=1e-6)
    if "center_weight" in kw:
        c24 = np.asarray(jax.device_get(s24.head_state["centers"]))
        c1 = np.asarray(jax.device_get(s1.head_state["centers"]))
        np.testing.assert_allclose(c24, c1, atol=2e-4)
        assert np.abs(c24).max() > 0  # centers actually moved
    if kw.get("margin_mode") == "adaface":
        for k in ("norm_mean", "norm_std"):
            np.testing.assert_allclose(
                float(s24.head_state["adaface"][k]),
                float(s1.head_state["adaface"][k]), rtol=1e-5)


def test_adaptive_losses_train_to_lower_loss():
    """Sanity: magface + center + triplet jointly still optimize."""
    cfg = dataclasses.replace(_BASE, margin_mode="magface",
                              center_weight=0.003, triplet_weight=0.1)
    _, losses, _ = _steps(create_mesh(), cfg, n=8, seed=2)
    assert all(np.isfinite(losses))
    assert np.mean(losses[-2:]) < np.mean(losses[:2])


def test_pure_distill_refuses_dead_aux_losses():
    cfg = dataclasses.replace(_BASE, center_weight=0.01)
    mesh = create_mesh()
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=_TinyNoBN())
    with pytest.raises(ValueError, match="silently dead"):
        make_train_step(net, cfg, mesh, state,
                        teacher=(net, {"params": state.params}))


def test_head_state_checkpoint_roundtrip(tmp_path):
    """head_state (AdaFace stats + centers) persists through orbax and
    is discoverable from metadata — the restore-template contract that
    cli.extract/serve rely on (pretrained.load_variables)."""
    from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

    cfg = dataclasses.replace(_BASE, margin_mode="adaface",
                              center_weight=0.01)
    mesh = create_mesh(data=1, devices=jax.devices()[:1])
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=_TinyNoBN())
    step_fn = make_train_step(net, cfg, mesh, state)
    images, labels = _synthetic_batch(jax.random.key(1), 16, 16, 12)
    state, _ = step_fn(state, images, labels)

    mgr = CheckpointManager(str(tmp_path / "ck"), save_every=1)
    assert mgr.maybe_save(state, force=True)
    mgr.wait()
    assert mgr.head_state_children() == {"adaface", "centers"}

    fresh, _ = create_train_state(cfg, jax.random.key(9), mesh,
                                  net=_TinyNoBN())
    restored = mgr.restore(fresh)
    np.testing.assert_allclose(
        np.asarray(restored.head_state["centers"]),
        np.asarray(jax.device_get(state.head_state["centers"])))
    np.testing.assert_allclose(
        float(restored.head_state["adaface"]["norm_mean"]),
        float(jax.device_get(state.head_state["adaface"]["norm_mean"])))
    mgr.close()


def test_resume_guard_on_head_state_mismatch(tmp_path):
    """Resuming with different loss flags must fail loudly, not with an
    orbax structure error (train/loop.py guard)."""
    from tf_face_toolbox_tpu.train.loop import train_loop

    mesh = create_mesh(data=1, devices=jax.devices()[:1])
    cfg = dataclasses.replace(_BASE, center_weight=0.01)

    def batches():
        i = 0
        while True:
            images, labels = _synthetic_batch(jax.random.key(i), 16, 16, 12)
            yield {"image": images, "label": labels}
            i += 1

    train_loop(cfg, mesh, batches(), num_steps=1,
               train_dir=str(tmp_path / "run"), save_every=1,
               log_every=0, net=_TinyNoBN())
    cfg2 = dataclasses.replace(_BASE, margin_mode="adaface")
    with pytest.raises(ValueError, match="loss-head state"):
        train_loop(cfg2, mesh, batches(), num_steps=2,
                   train_dir=str(tmp_path / "run"), save_every=1,
                   log_every=0, net=_TinyNoBN())


def test_restore_checkpoint_predating_head_state(tmp_path):
    """A checkpoint saved before TrainState grew head_state (r2-era)
    must still restore: the template drops fields the checkpoint never
    saved and fills them back with None (CheckpointManager.restore)."""
    import dataclasses as _dc

    import orbax.checkpoint as ocp

    from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

    mesh = create_mesh(data=1, devices=jax.devices()[:1])
    state, net = create_train_state(_BASE, jax.random.key(0), mesh,
                                    net=_TinyNoBN())
    # simulate the OLD on-disk structure: same fields minus head_state
    old_style = {f.name: getattr(state, f.name)
                 for f in _dc.fields(state) if f.name != "head_state"}
    mgr = CheckpointManager(str(tmp_path / "ck"), save_every=1)
    mgr._mgr.save(0, args=ocp.args.StandardSave(old_style))
    mgr.wait()

    fresh, _ = create_train_state(_BASE, jax.random.key(9), mesh,
                                  net=_TinyNoBN())
    assert fresh.head_state is None
    restored = mgr.restore(fresh)
    assert restored.head_state is None
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_load_variables_subcenter_center_checkpoint(tmp_path):
    """pretrained.load_variables rebuilds the right template for a
    checkpoint trained with BOTH subcenters>1 and center loss (their
    row counts differ: classifier C·K vs centers C)."""
    import dataclasses as _dc

    from tf_face_toolbox_tpu.models import create_network
    from tf_face_toolbox_tpu.pretrained import load_variables
    from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

    cfg = _dc.replace(_BASE, network="resnet_tiny", subcenters=2,
                      center_weight=0.01, image_size=16)
    mesh = create_mesh(data=1, devices=jax.devices()[:1])
    net = create_network("resnet_tiny", embedding_dim=16)
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=net)
    assert state.classifier.shape[0] == 2 * state.head_state[
        "centers"].shape[0]
    mgr = CheckpointManager(str(tmp_path / "ck"), save_every=1)
    assert mgr.maybe_save(state, force=True)
    mgr.wait()
    mgr.close()

    _, variables = load_variables(str(tmp_path / "ck"), "resnet_tiny",
                                  16, 16, jnp.float32)
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
