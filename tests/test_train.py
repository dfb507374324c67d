"""Trainer integration tests on the fake 8-device CPU mesh (SURVEY.md §4).

- tiny-config end-to-end: loss decreases over N steps on synthetic ids
- DP invariance: 8-device mesh step == 1-device step (same global batch)
- dp×tp (2×4) mesh runs and matches too
- checkpoint save/restore round-trips the full state bit-exactly
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_face_toolbox_tpu.models.resnet import ResNet
from tf_face_toolbox_tpu.parallel.mesh import create_mesh
from tf_face_toolbox_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
)

# Tiny everything: 16x16 inputs, 1-block ResNet, 12 identities.
CFG = TrainConfig(
    num_classes=12,
    embedding_dim=16,
    image_size=16,
    global_batch=16,
    base_lr=0.05,
    warmup_steps=0,
    margin_m3=0.0,        # plain softmax: easiest to optimize on noise
    margin_scale=16.0,
    weight_decay=0.0,
    augment=False,
)

TINY = dict(stage_sizes=(1,), width_per_group=16, embedding_dim=16)


def _tiny_net():
    return ResNet(**TINY)


class _TinyNoBN(__import__("flax").linen.Module):
    """BN-free convnet: DP must equal single-device EXACTLY with this
    (per-replica BatchNorm legitimately breaks that equality — the
    documented per-tower behavior, SURVEY.md §7)."""
    import flax.linen as nn

    @nn.compact
    def __call__(self, x, train=False):
        nn = _TinyNoBN.nn
        x = nn.Conv(8, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(16)(x)


def _synthetic_batch(key, n, size, num_classes):
    """Identity k = gaussian blob with mean k-dependent: learnable."""
    kl, kx = jax.random.split(key)
    labels = jax.random.randint(kl, (n,), 0, num_classes)
    base = jax.nn.one_hot(labels % 3, 3) * 2.0 - 1.0  # per-id channel bias
    noise = 0.1 * jax.random.normal(kx, (n, size, size, 3))
    images = noise + base[:, None, None, :] * (
        labels[:, None, None, None] / num_classes)
    return images.astype(jnp.float32), labels.astype(jnp.int32)


def _run_steps(mesh, n_steps, cfg=CFG, seed=0, net=None):
    state, net = create_train_state(cfg, jax.random.key(seed), mesh,
                                    net=net or _tiny_net())
    step_fn = make_train_step(net, cfg, mesh, state)
    losses = []
    for i in range(n_steps):
        images, labels = _synthetic_batch(
            jax.random.key(100 + i), cfg.global_batch, cfg.image_size,
            cfg.num_classes)
        state, metrics = step_fn(state, images, labels)
        losses.append(float(metrics["loss"]))
    return state, losses


def test_train_step_runs_and_counts():
    mesh = create_mesh()  # 8x1
    state, losses = _run_steps(mesh, 3)
    assert int(state.step) == 3
    assert all(np.isfinite(l) for l in losses)


def test_loss_decreases_on_learnable_synthetic_data():
    mesh = create_mesh()
    _, losses = _run_steps(mesh, 12)
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_dp_matches_single_device():
    """The psum gradient exchange must reproduce single-device training
    (BN-free net: per-replica BatchNorm legitimately differs across DP
    widths, which is the documented tower-equivalent behavior)."""
    mesh8 = create_mesh()                        # 8 data shards
    mesh1 = create_mesh(data=1, devices=jax.devices()[:1])
    s8, l8 = _run_steps(mesh8, 2, seed=3, net=_TinyNoBN())
    s1, l1 = _run_steps(mesh1, 2, seed=3, net=_TinyNoBN())
    np.testing.assert_allclose(l8, l1, rtol=2e-4)
    p8 = jax.tree.leaves(s8.params)
    p1 = jax.tree.leaves(s1.params)
    for a, b in zip(p8, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dp_tp_mesh_matches_single_device():
    """2 data x 4 model (class-sharded head) == single device."""
    mesh24 = create_mesh(data=2, model=4)
    mesh1 = create_mesh(data=1, devices=jax.devices()[:1])
    s24, l24 = _run_steps(mesh24, 2, seed=5, net=_TinyNoBN())
    s1, l1 = _run_steps(mesh1, 2, seed=5, net=_TinyNoBN())
    np.testing.assert_allclose(l24, l1, rtol=2e-4)
    # classifier is sharded on mesh24; compare materialized values
    c24 = np.asarray(jax.device_get(s24.classifier))
    c1 = np.asarray(jax.device_get(s1.classifier))
    np.testing.assert_allclose(c24, c1, atol=2e-4)


@pytest.mark.mid
def test_qat_trains_and_serves_static_int8():
    """QAT fake-quant training: loss decreases, eval forward is fp, and
    the checkpoint serves through calibrate -> static int8 with HIGHER
    fp-vs-int8 embedding cosine than an identically-trained fp model."""
    import dataclasses as _dc

    from tf_face_toolbox_tpu.models import (
        calibrate_quant_stats, create_network)
    from tests.util import jit_apply

    mesh = create_mesh()
    cfg_qat = _dc.replace(CFG, quantized="qat")
    net_kw = dict(stage_sizes=(1, 1), width_per_group=16,
                  embedding_dim=16)
    qat_net = ResNet(**net_kw, quantized="qat")
    fp_net = ResNet(**net_kw)
    s_qat, l_qat = _run_steps(mesh, 10, cfg=cfg_qat, seed=11, net=qat_net)
    s_fp, _ = _run_steps(mesh, 10, cfg=CFG, seed=11, net=fp_net)
    assert np.mean(l_qat[-3:]) < np.mean(l_qat[:3]), l_qat

    x = jax.random.normal(jax.random.key(2), (8, 16, 16, 3))

    def int8_cosine(state, name_kw):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        eval_net = ResNet(**name_kw)          # fp eval twin
        fp_emb = np.asarray(jit_apply(eval_net, variables, x))
        calib = dict(variables)
        # calibrate_quant_stats drives the registry; build variables
        # directly against the module instead (custom tiny net):
        cal_net = ResNet(**name_kw, quantized="calibrate")
        _, mut = jax.jit(functools.partial(
            cal_net.apply, train=False,
            mutable=["quant_stats"]))(calib, x)
        calib["quant_stats"] = mut["quant_stats"]
        q_net = ResNet(**name_kw, quantized="static")
        q_emb = np.asarray(jit_apply(q_net, calib, x))
        num = (fp_emb * q_emb).sum(1)
        den = (np.linalg.norm(fp_emb, axis=1)
               * np.linalg.norm(q_emb, axis=1) + 1e-30)
        return num / den

    cos_qat = int8_cosine(s_qat, net_kw)
    cos_fp = int8_cosine(s_fp, net_kw)
    assert np.isfinite(cos_qat).all()
    # QAT's whole point: the int8 grid error is trained against.
    assert cos_qat.mean() >= cos_fp.mean() - 0.02, (cos_qat, cos_fp)
    assert cos_qat.min() > 0.9, cos_qat


def test_multislice_mesh_matches_single_device():
    """2-slice hybrid mesh (slice-major data axis over 2x4 virtual
    slices) trains identically to single-device — the collectives are
    the same logical pmean; only the device order changes."""
    from tf_face_toolbox_tpu.parallel.mesh import create_multislice_mesh

    mesh2s = create_multislice_mesh(slices=2)        # 8 devs -> 2x4
    assert mesh2s.shape == {"data": 8, "model": 1}
    mesh1 = create_mesh(data=1, devices=jax.devices()[:1])
    s2s, l2s = _run_steps(mesh2s, 2, seed=7, net=_TinyNoBN())
    s1, l1 = _run_steps(mesh1, 2, seed=7, net=_TinyNoBN())
    np.testing.assert_allclose(l2s, l1, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s2s.params),
                    jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)


def test_multislice_mesh_grouping():
    """Devices listed interleaved across slices come out slice-major on
    the data axis, and the model axis must stay inside one slice."""
    from tf_face_toolbox_tpu.parallel.mesh import create_multislice_mesh

    devs = jax.devices()
    interleaved = [devs[i % 2 * 4 + i // 2] for i in range(8)]
    ids = [0, 1] * 4
    mesh = create_multislice_mesh(devices=interleaved, slice_ids=ids)
    # slice 0 = devs[0:4], slice 1 = devs[4:8], each contiguous
    flat = list(mesh.devices.flat)
    assert flat == devs[:8]
    mesh_tp = create_multislice_mesh(model=2, devices=interleaved,
                                     slice_ids=ids)
    # each model pair must be two devices of the SAME slice
    for row in mesh_tp.devices:
        slices = {devs.index(d) // 4 for d in row}
        assert len(slices) == 1, mesh_tp.devices
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not divisible"):
        create_multislice_mesh(model=8, devices=interleaved,
                               slice_ids=ids)
    # virtual split must not silently drop devices (8 % 3 != 0)
    with _pytest.raises(ValueError, match="not divisible"):
        create_multislice_mesh(slices=3)


@pytest.mark.mid
def test_augment_path_runs():
    cfg = TrainConfig(
        num_classes=12, embedding_dim=16, image_size=12, global_batch=8,
        augment=True, crop_from=16, weight_decay=0.0,
    )
    mesh = create_mesh()
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=_tiny_net())
    step_fn = make_train_step(net, cfg, mesh, state)
    images = jax.random.randint(
        jax.random.key(1), (8, 16, 16, 3), 0, 256, dtype=jnp.int32
    ).astype(jnp.uint8)
    labels = jnp.arange(8, dtype=jnp.int32) % 12
    state, metrics = step_fn(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.mid
def test_checkpoint_roundtrip(tmp_path):
    from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager
    mesh = create_mesh()
    state, losses = _run_steps(mesh, 2)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_every=1)
    assert mgr.maybe_save(state, force=True)
    mgr.wait()

    fresh, _ = create_train_state(CFG, jax.random.key(42), mesh,
                                  net=_tiny_net())
    restored = mgr.restore(fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # no-EMA checkpoint must report has_ema()==False (orbax metadata
    # still contains the ema_params key with value_type "None")
    assert mgr.has_ema() is False
    mgr.close()


def test_ema_params_track_weights():
    import dataclasses
    cfg = dataclasses.replace(CFG, ema_decay=0.5)
    mesh = create_mesh()
    state, losses = _run_steps(mesh, 3, cfg=cfg)
    assert state.ema_params is not None
    p = jax.tree.leaves(state.params)
    e = jax.tree.leaves(state.ema_params)
    # EMA lags the live params but is no longer the init values.
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(p, e)]
    assert any(d > 0 for d in diffs)
    # and it stays finite
    assert all(np.isfinite(np.asarray(x)).all() for x in e)


def test_no_ema_by_default():
    mesh = create_mesh()
    state, _ = _run_steps(mesh, 1)
    assert state.ema_params is None


def test_pallas_input_path_runs():
    import dataclasses
    cfg = dataclasses.replace(
        CFG, augment=True, crop_from=20, image_size=16, pallas_input=True,
        global_batch=8)
    mesh = create_mesh()
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=_tiny_net())
    step_fn = make_train_step(net, cfg, mesh, state)
    images = jax.random.randint(
        jax.random.key(1), (8, 20, 20, 3), 0, 256, dtype=jnp.int32
    ).astype(jnp.uint8)
    labels = jnp.arange(8, dtype=jnp.int32) % 12
    state, metrics = step_fn(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_learning_end_to_end_verification_improves():
    """Train on structured synthetic identities, then verify held-out
    image pairs: accuracy must be far above chance (the BASELINE
    config-4 integration proof without real CASIA data)."""
    import dataclasses
    from tf_face_toolbox_tpu.extract import flip_averaged_embeddings
    from tf_face_toolbox_tpu.ops.verification import verify_pairs

    num_ids, size = 10, 16
    key = jax.random.key(0)
    # identity templates: fixed random images; samples = template + noise
    templates = jax.random.uniform(key, (num_ids, size, size, 3)) * 2 - 1

    def sample(key, n):
        kl, kn = jax.random.split(key)
        labels = jax.random.randint(kl, (n,), 0, num_ids)
        noise = 0.3 * jax.random.normal(kn, (n, size, size, 3))
        return templates[labels] + noise, labels

    cfg = dataclasses.replace(
        CFG, num_classes=num_ids, base_lr=0.1, margin_scale=16.0,
        global_batch=32, image_size=size)
    mesh = create_mesh()
    state, net = create_train_state(cfg, jax.random.key(1), mesh,
                                    net=_tiny_net())
    step_fn = make_train_step(net, cfg, mesh, state)
    for i in range(60):
        images, labels = sample(jax.random.key(1000 + i), cfg.global_batch)
        state, metrics = step_fn(state, images.astype(jnp.float32),
                                 labels.astype(jnp.int32))
    assert np.isfinite(float(metrics["loss"]))

    # held-out pairs: same-id vs diff-id, fresh noise
    test_imgs, test_labels = sample(jax.random.key(9999), 60)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
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
    order = np.argsort(np.tile(np.arange(len(same)), 2), kind="stable")
    r = verify_pairs(emb[i1][order], emb[i2][order], labels01[order])
    assert r["accuracy_mean"] > 0.8, r


def test_staircase_boundaries_absolute_with_warmup():
    from tf_face_toolbox_tpu.train.schedule import staircase
    sched = staircase(0.1, (100, 200), decay=0.1, warmup_steps=10)
    assert abs(float(sched(0)) - 0.01) < 1e-6      # ramp start
    assert abs(float(sched(9)) - 0.1) < 1e-6       # ramp done
    assert abs(float(sched(99)) - 0.1) < 1e-6
    assert abs(float(sched(100)) - 0.01) < 1e-7    # decay AT 100, not 110
    assert abs(float(sched(200)) - 0.001) < 1e-8


def test_resnext_output_channels_match_paper():
    from tf_face_toolbox_tpu.models import create_network, init_variables
    net = create_network("resnext_50", embedding_dim=16)
    v = init_variables(net, jax.random.key(0), (1, 32, 32, 3))
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    shapes = {tuple(l.shape) for _, l in flat if hasattr(l, "shape")}
    # stage-0 projection 1x1: 128 -> 256 (expansion 2), and the last
    # stage emits 2048 channels like the paper
    assert (1, 1, 128, 256) in shapes
    assert any(s[-1] == 2048 for s in shapes if len(s) == 4)
    assert not any(s[-1] == 4096 for s in shapes if len(s) == 4)


@pytest.mark.mid
def test_remat_blocks_train_and_match():
    """remat=True must be numerically identical forward (same params)."""
    from tf_face_toolbox_tpu.models.resnet import ResNet
    net = ResNet(**TINY)
    net_r = ResNet(**TINY, remat=True)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    v = create_train_state(CFG, jax.random.key(1), create_mesh(),
                           net=net)[0]
    variables = {"params": v.params, "batch_stats": v.batch_stats}
    a = net.apply(variables, x, train=False)
    b = net_r.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # and a train step runs
    cfg = CFG
    state, nr = create_train_state(cfg, jax.random.key(1), create_mesh(),
                                   net=net_r)
    fn = make_train_step(nr, cfg, create_mesh(), state)
    imgs, labels = _synthetic_batch(jax.random.key(2), cfg.global_batch,
                                    cfg.image_size, cfg.num_classes)
    state, m = fn(state, imgs, labels)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.mid
def test_flatten_head_dropout_trains_and_is_deterministic_at_eval():
    """VERDICT r2 weak #1: a flatten head with dropout_rate>0 must
    actually train (needs the 'dropout' PRNG stream wired through
    trainer.py's net.apply) — and stay deterministic in eval mode."""
    import dataclasses

    cfg = dataclasses.replace(CFG, head_variant="flatten",
                              dropout_rate=0.5)
    net = ResNet(**TINY, head_variant="flatten", dropout_rate=0.5)
    mesh = create_mesh()
    state, net = create_train_state(cfg, jax.random.key(0), mesh, net=net)
    step_fn = make_train_step(net, cfg, mesh, state)
    images, labels = _synthetic_batch(jax.random.key(1), cfg.global_batch,
                                      cfg.image_size, cfg.num_classes)
    state, m1 = step_fn(state, images, labels)
    state, m2 = step_fn(state, images, labels)
    assert int(state.step) == 2
    assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])

    # train-mode stochasticity: different dropout keys -> different
    # embeddings; same key -> identical
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = images[:4].astype(jnp.float32)
    e_a = net.apply(variables, x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.key(7)})[0]
    e_b = net.apply(variables, x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.key(8)})[0]
    e_a2 = net.apply(variables, x, train=True, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.key(7)})[0]
    assert not np.allclose(np.asarray(e_a), np.asarray(e_b))
    np.testing.assert_array_equal(np.asarray(e_a), np.asarray(e_a2))

    # eval mode: no rngs needed, bit-deterministic
    y1 = net.apply(variables, x, train=False)
    y2 = net.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


@pytest.mark.parametrize("opt", ["adam", "adamw", "lars"])
def test_optimizer_variants_train(opt):
    """Non-SGD optimizers (r3 knob): one SPMD step runs, loss finite,
    params move."""
    import dataclasses

    cfg = dataclasses.replace(CFG, optimizer=opt, base_lr=1e-3)
    mesh = create_mesh()
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=_tiny_net())
    p0 = jax.tree.map(np.asarray, state.params)
    step_fn = make_train_step(net, cfg, mesh, state)
    images, labels = _synthetic_batch(jax.random.key(1),
                                      cfg.global_batch, cfg.image_size,
                                      cfg.num_classes)
    state, metrics = step_fn(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.params, p0)
    assert max(jax.tree.leaves(moved)) > 0.0


def test_unknown_optimizer_raises():
    import dataclasses

    from tf_face_toolbox_tpu.train.trainer import make_optimizer
    with pytest.raises(ValueError, match="unknown optimizer"):
        make_optimizer(dataclasses.replace(CFG, optimizer="rmsprop"))


def test_fixed_norm_training_runs_and_differs():
    """input_norm='fixed' (fine-tuning imported checkpoints) trains,
    and produces different params than per_image on the same data."""
    import dataclasses as _dc

    mesh = create_mesh()
    cfg_fx = _dc.replace(CFG, augment=True, crop_from=CFG.image_size + 4,
                         input_norm="fixed")
    cfg_pi = _dc.replace(cfg_fx, input_norm="per_image")

    def run(cfg):
        state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                        net=_tiny_net())
        step_fn = make_train_step(net, cfg, mesh, state)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.integers(
            0, 256, (cfg.global_batch, cfg.crop_from, cfg.crop_from, 3),
            dtype=np.uint8))
        labels = jnp.asarray(rng.integers(
            0, cfg.num_classes, cfg.global_batch).astype(np.int32))
        state, m = step_fn(state, imgs, labels)
        return state, float(m["loss"])

    s_fx, l_fx = run(cfg_fx)
    s_pi, l_pi = run(cfg_pi)
    assert np.isfinite(l_fx) and np.isfinite(l_pi)
    diffs = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(s_fx.params),
                             jax.tree.leaves(s_pi.params))]
    assert any(diffs)


def test_cosine_schedule_shape_and_training():
    from tf_face_toolbox_tpu.train.schedule import cosine

    sched = cosine(0.1, 100, warmup_steps=10)
    np.testing.assert_allclose(float(sched(9)), 0.1 * np.cos(
        np.pi * 9 / 100 / 2) ** 2 * 1.0, rtol=1e-5)  # end of warmup ramp
    assert float(sched(0)) == pytest.approx(0.1 * 0.1 * 0.5 * (
        1 + np.cos(0)), rel=1e-5)          # ramp (1/10) x cos(0)=1
    assert float(sched(50)) == pytest.approx(0.05, rel=1e-4)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-8)
    assert float(sched(250)) == pytest.approx(0.0, abs=1e-8)  # holds
    with pytest.raises(ValueError, match="total_steps"):
        cosine(0.1, 0)

    # trains through the step: lr metric follows the cosine
    import dataclasses as _dc
    mesh = create_mesh()
    cfg = _dc.replace(CFG, lr_schedule="cosine", lr_total_steps=4)
    state, losses = _run_steps(mesh, 2, cfg=cfg)
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.mid
def test_grad_clip_bounds_update_and_is_exact():
    """grad_clip_norm caps the global update: with wd=0, momentum=0
    SGD, the first step's param+classifier delta norm is exactly
    lr·min(clip, grad_norm); a huge clip is a no-op vs no clip. The
    norm combines the model-sharded classifier's shards (psum), so
    this runs on the full (data×model) mesh."""
    import dataclasses

    def snapshot(state):
        return [np.asarray(x, np.float64) for x in
                jax.tree.leaves((state.params, state.classifier))]

    def delta_norm(before, state1):
        after = snapshot(state1)
        return np.sqrt(sum(float(np.sum((b - a) ** 2))
                           for a, b in zip(before, after)))

    def one_step(clip):
        cfg = dataclasses.replace(
            CFG, momentum=0.0, weight_decay=0.0, base_lr=0.05,
            grad_clip_norm=clip)
        mesh = create_mesh(data=4, model=2)
        state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                        net=_tiny_net())
        step_fn = make_train_step(net, cfg, mesh, state)
        images, labels = _synthetic_batch(jax.random.key(100),
                                          cfg.global_batch,
                                          cfg.image_size,
                                          cfg.num_classes)
        before = snapshot(state)  # the step donates its input state
        new_state, metrics = step_fn(state, images, labels)
        return before, new_state, float(metrics["grad_norm"])

    b0, s1, gnorm = one_step(0.0)          # no clipping: baseline
    np.testing.assert_allclose(delta_norm(b0, s1), 0.05 * gnorm,
                               rtol=1e-5)
    clip = gnorm / 3
    bc, s1c, gnorm_c = one_step(clip)      # active clipping
    assert np.isclose(gnorm_c, gnorm, rtol=1e-5)  # metric is pre-clip
    np.testing.assert_allclose(delta_norm(bc, s1c), 0.05 * clip,
                               rtol=1e-5)
    _, s1h, _ = one_step(gnorm * 100)      # inactive clip == no clip
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(s1h.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradient_accumulation_equals_full_batch():
    """accum_steps=K averages micro-batch grads to EXACTLY the
    full-batch gradient (BN-free net), so losses, grad norms, and
    updated params match accum_steps=1 bit-comparably."""
    import dataclasses

    mesh = create_mesh(data=2, model=2)

    def run(accum):
        cfg = dataclasses.replace(CFG, accum_steps=accum)
        state, net = create_train_state(cfg, jax.random.key(3), mesh,
                                        net=_TinyNoBN())
        step_fn = make_train_step(net, cfg, mesh, state)
        metrics = None
        for i in range(2):
            images, labels = _synthetic_batch(jax.random.key(50 + i),
                                              16, 16, 12)
            state, metrics = step_fn(state, images, labels)
        return state, metrics

    s1, m1 = run(1)
    s4, m4 = run(4)
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m4["grad_norm"]),
                               float(m1["grad_norm"]), rtol=2e-3)
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)


def test_gradient_accumulation_refusals():
    import dataclasses

    mesh = create_mesh(data=1, devices=jax.devices()[:1])
    for kw in (dict(margin_mode="adaface"), dict(center_weight=0.01)):
        cfg = dataclasses.replace(CFG, accum_steps=2, **kw)
        state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                        net=_TinyNoBN())
        with pytest.raises(ValueError, match="stateless"):
            make_train_step(net, cfg, mesh, state)
    # indivisible per-device batch
    cfg = dataclasses.replace(CFG, accum_steps=3)   # 16 % 3 != 0
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=_TinyNoBN())
    with pytest.raises(ValueError, match="divisible"):
        make_train_step(net, cfg, mesh, state)


def test_skip_nonfinite_holds_state_and_recovers():
    """A poisoned (NaN) batch with skip_nonfinite: every state leaf
    holds bit-exactly, the step counter advances, the skip is counted;
    the next clean batch trains normally. Without the guard the same
    batch corrupts the params (the failure mode being defended)."""
    import dataclasses

    mesh = create_mesh()
    cfg = dataclasses.replace(CFG, skip_nonfinite=True, ema_decay=0.9)
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=_tiny_net())
    step_fn = make_train_step(net, cfg, mesh, state)

    images, labels = _synthetic_batch(jax.random.key(100), 16, 16, 12)
    state, m = step_fn(state, images, labels)
    assert float(m["skipped_nonfinite"]) == 0.0
    before = jax.tree.map(np.asarray, (
        state.params, state.classifier, state.opt_state,
        state.batch_stats, state.ema_params))

    poisoned = images.at[0, 0, 0, 0].set(jnp.nan)
    state, m = step_fn(state, poisoned, labels)
    assert float(m["skipped_nonfinite"]) == 1.0
    assert not np.isfinite(float(m["loss"]))
    assert int(state.step) == 2    # counter still advances
    after = jax.tree.map(np.asarray, (
        state.params, state.classifier, state.opt_state,
        state.batch_stats, state.ema_params))
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)

    state, m = step_fn(state, images, labels)   # clean batch recovers
    assert float(m["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(m["loss"]))
    assert any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(before[0]),
                        jax.tree.leaves(state.params)))


@pytest.mark.mid
def test_skip_nonfinite_counter_and_divergence_abort(tmp_path):
    """train_loop with skip_nonfinite: the cumulative skip count is
    logged (skipped_nonfinite_total), and a run of max_consecutive_skips
    consecutive skips raises instead of skipping forever (the ADVICE r3
    failure mode: a diverged run that appears to train)."""
    import dataclasses

    from tf_face_toolbox_tpu.train.loop import train_loop

    mesh = create_mesh()
    cfg = dataclasses.replace(CFG, skip_nonfinite=True)

    def batches(poison_from, poison_to=10**9):
        step = 0
        while True:
            img = np.zeros((16, 16, 16, 3), np.float32)
            if poison_from <= step < poison_to:
                img[0, 0, 0, 0] = np.nan
            yield {"image": img,
                   "label": (np.arange(16) % 12).astype(np.int32)}
            step += 1

    # Transient spikes (2 poisoned steps out of 6): counted, no abort.
    res = train_loop(cfg, mesh, batches(2, 4), num_steps=6,
                     log_every=3, net=_tiny_net(),
                     max_consecutive_skips=3)
    assert res.last_metrics["skipped_nonfinite_total"] == 2.0
    assert int(jax.device_get(res.state.step)) == 6

    # Persistent divergence: every step from 1 on is poisoned → abort
    # after 3 consecutive skips, even mid-run between log points.
    with pytest.raises(FloatingPointError, match="consecutive"):
        train_loop(cfg, mesh, batches(1), num_steps=50,
                   log_every=2, net=_tiny_net(),
                   max_consecutive_skips=3)

    # max_consecutive_skips=0 disables the abort (counting still works).
    res = train_loop(cfg, mesh, batches(1), num_steps=5,
                     log_every=5, net=_tiny_net(),
                     max_consecutive_skips=0)
    assert res.last_metrics["skipped_nonfinite_total"] == 4.0

    # log_every=0 (logging disabled) must STILL abort: skips settle on
    # their own fixed cadence, not only at log points (ADVICE r4).
    with pytest.raises(FloatingPointError, match="consecutive"):
        train_loop(cfg, mesh, batches(0), num_steps=10,
                   log_every=0, net=_tiny_net(),
                   max_consecutive_skips=3)


def test_nonfinite_unguarded_corrupts_params():
    """Control for the guard test: the same poisoned batch WITHOUT
    skip_nonfinite propagates NaN into the weights."""
    mesh = create_mesh()
    state, net = create_train_state(CFG, jax.random.key(0), mesh,
                                    net=_tiny_net())
    step_fn = make_train_step(net, CFG, mesh, state)
    images, labels = _synthetic_batch(jax.random.key(100), 16, 16, 12)
    poisoned = images.at[0, 0, 0, 0].set(jnp.nan)
    state, m = step_fn(state, poisoned, labels)
    assert "skipped_nonfinite" not in m
    leaves = [np.asarray(l) for l in jax.tree.leaves(state.params)]
    assert any(not np.isfinite(l).all() for l in leaves)


@pytest.mark.mid
def test_keep_best_checkpoint(tmp_path):
    """--keep_best: the best-eval checkpoint survives in
    <train_dir>/best with its bar recorded, GC-immune, and the bar
    persists across a resumed run (a later worse eval never demotes)."""
    from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager
    from tf_face_toolbox_tpu.train.loop import train_loop

    mesh = create_mesh()
    train_dir = str(tmp_path / "run")

    def batches():
        while True:
            yield {"image": np.zeros((16, 16, 16, 3), np.float32),
                   "label": (np.arange(16) % 12).astype(np.int32)}

    scripted = iter([0.5, 0.9, 0.7])

    def eval_fn(state):
        return {"lfw_accuracy": next(scripted)}

    train_loop(CFG, mesh, batches(), num_steps=3, train_dir=train_dir,
               save_every=1, log_every=1, eval_fn=eval_fn,
               eval_every=1, keep_best="lfw_accuracy",
               net=_tiny_net())

    mgr = CheckpointManager(train_dir)
    info = mgr.best_info()
    assert info == {"step": 2, "metric": 0.9, "name": "lfw_accuracy"}
    best = CheckpointManager(str(tmp_path / "run" / "best"))
    assert best.latest_step() == 2          # downstream CLIs read this
    best.close()

    # resumed run with a WORSE eval: the bar holds, no new best save
    scripted = iter([0.6])
    train_loop(CFG, mesh, batches(), num_steps=4, train_dir=train_dir,
               save_every=1, log_every=1, eval_fn=eval_fn,
               eval_every=1, keep_best="lfw_accuracy",
               net=_tiny_net())
    mgr2 = CheckpointManager(train_dir)
    assert mgr2.best_info()["step"] == 2
    mgr2.close()
    mgr.close()


def test_save_best_bar_logic(tmp_path):
    """save_best only fires on strict improvement."""
    from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

    mesh = create_mesh()
    state, _ = create_train_state(CFG, jax.random.key(0), mesh,
                                  net=_tiny_net())
    mgr = CheckpointManager(str(tmp_path / "d"))
    assert mgr.save_best(state, step=1, metric=0.5, name="m") is True
    assert mgr.save_best(state, step=2, metric=0.5, name="m") is False
    assert mgr.save_best(state, step=3, metric=0.6, name="m") is True
    mgr.wait()
    assert mgr.best_info() == {"step": 3, "metric": 0.6, "name": "m"}
    mgr.close()


def test_load_variables_sharded_classifier(tmp_path):
    """Serving-time restore of a checkpoint whose num_classes divides
    the device count (regression): the class-sharded classifier's
    _METADATA write_shape is PER-SHARD (rows/N), and load_variables
    used it as num_classes — rebuilding a 1/N-width template that
    orbax refused ("(1, D) is not compatible with the stored (N, D)").
    global_shapes() must report the full width and the restore work."""
    import dataclasses

    from tf_face_toolbox_tpu.pretrained import load_variables
    from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

    n_dev = jax.device_count()
    cfg = dataclasses.replace(CFG, network="resnet_tiny",
                              num_classes=n_dev)
    mesh = create_mesh()
    state, net = create_train_state(cfg, jax.random.key(0), mesh)
    # one real step: the classifier only picks up its class-sharded
    # layout from the step fn's out_shardings (a fresh state is
    # replicated, which would save full-width chunks and miss the bug)
    step_fn = make_train_step(net, cfg, mesh, state)
    images, labels = _synthetic_batch(jax.random.key(1), 16, 16, n_dev)
    state, _ = step_fn(state, images, labels)
    mgr = CheckpointManager(str(tmp_path / "c"), save_every=1)
    assert mgr.maybe_save(state, force=True)
    mgr.wait()
    mgr.close()

    mgr2 = CheckpointManager(str(tmp_path / "c"))
    shapes = mgr2.global_shapes()
    assert shapes["('classifier',)"] == (n_dev, CFG.embedding_dim)
    # the premise: the saved write chunk really is per-shard (else this
    # test no longer guards anything — update it alongside the pspecs)
    ws = mgr2.tree_metadata()["('classifier',)"][
        "value_metadata"]["write_shape"]
    assert ws[0] < n_dev, ws
    mgr2.close()

    net, variables = load_variables(
        str(tmp_path / "c"), "resnet_tiny", CFG.embedding_dim,
        CFG.image_size, jnp.float32)
    emb = net.apply(variables,
                    jnp.zeros((1, CFG.image_size, CFG.image_size, 3)),
                    train=False)
    assert emb.shape == (1, CFG.embedding_dim)
