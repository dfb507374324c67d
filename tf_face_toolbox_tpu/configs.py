"""Named presets for the five BASELINE.json milestone configs.

Each entry is runnable as-is (synthetic data where the real dataset
isn't bundled) and doubles as executable documentation of the intended
production settings. ``get_config(name)`` returns a TrainConfig (train
configs) or a dict (eval-only configs).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from tf_face_toolbox_tpu.train.trainer import TrainConfig

# BASELINE.json configs[0]: "ResNet-50 single-image embedding + LFW pair
# verification, batch 32, CPU" — an extraction/eval recipe, not training.
CONFIG_1_EXTRACT_VERIFY_CPU: dict[str, Any] = dict(
    network="resnet_v1_50",
    embedding_dim=512,
    image_size=112,
    batch=32,
    platform="cpu",
    flip_average=True,
    verification="lfw_10fold",
)

# configs[1]: "SE-ResNet-50 backbone with flip-averaged 512-d embeddings"
CONFIG_2_SE_RESNET_EXTRACT: dict[str, Any] = dict(
    network="se_resnet_50",
    embedding_dim=512,
    image_size=112,
    batch=256,
    flip_average=True,
)

# configs[2]: "DenseNet / ResNeXt backbone variants under the same
# extraction API"
CONFIG_3_VARIANT_BACKBONES: dict[str, Any] = dict(
    networks=("densenet_121", "resnext_50"),
    embedding_dim=512,
    image_size=112,
    batch=256,
    flip_average=True,
)

# configs[3]: "Margin-softmax (CosFace/ArcFace-style) training on
# CASIA-WebFace, single chip"
CONFIG_4_CASIA_SINGLE_CHIP = TrainConfig(
    network="resnet_v1_50",
    embedding_dim=512,
    num_classes=10_572,            # CASIA-WebFace identities
    image_size=112,
    crop_from=120,
    global_batch=256,
    base_lr=0.1,
    lr_boundaries=(100_000, 160_000, 220_000),
    warmup_steps=2_000,
    weight_decay=5e-4,
    margin_scale=64.0,
    margin_m3=0.35,                # CosFace
    dtype=jnp.bfloat16,
    augment=True,
)

# configs[4]: "Data-parallel large-batch training on a v5e-8 mesh with
# psum gradient exchange"
CONFIG_5_V5E8_DATA_PARALLEL = TrainConfig(
    network="resnet_v1_50",
    embedding_dim=512,
    num_classes=10_572,
    image_size=112,
    crop_from=120,
    global_batch=2048,             # 256/chip on v5e-8
    base_lr=0.4,                   # linear-scaled with batch
    lr_boundaries=(60_000, 100_000, 140_000),
    warmup_steps=5_000,
    weight_decay=5e-4,
    margin_scale=64.0,
    margin_m3=0.35,
    dtype=jnp.bfloat16,
    augment=True,
)
# mesh for config 5: parallel.mesh.create_mesh()  → all 8 chips on `data`
# (add model=N for Partial-FC class sharding at larger identity counts)

# r3 additions beyond the five BASELINE milestones ----------------------

# The bf16-only accuracy-class serving recommendation (docs/design.md):
# JPEG-domain backbone, zero-decode input, no quantization. 11.9k
# faces/sec/chip measured (min 11.4k, b256 v5e-1) — over the 10k
# north-star with no int8 anywhere.
#
# ACCURACY RISK (open until real data lands): dct_resnet_50's
# "accuracy-class" label rests on 1k-identity synthetic parity with
# the face stem (preflight verification 0.9983 vs 0.9967; design.md)
# plus literature (Gueguen 2018) — NOT on a real-pair benchmark.
# tools/acceptance.py gates this net against the face stem on real
# pairs the day a dataset is available; until it passes, risk-averse
# deployments should use the space2depth static-int8 preset (11.0k
# faces/sec, pixel-domain, PTQ-gated on trained checkpoints).
CONFIG_6_ACCURACY_SERVING_BF16: dict[str, Any] = dict(
    network="dct_resnet_50",
    embedding_dim=512,
    image_size=112,
    batch=256,
    flip_average=True,
    loader="dct_domain",        # cli.pack --recode_size=112 shards
    bf16=True,
)

# Large-identity-count training: class-sharded head over `model` with
# sampled Partial-FC (An et al. 2021; parallel/sharded_softmax.py).
# Shaped for MS1M-class datasets (~10^5 ids); at 10^6-10^7 raise
# mesh model-axis and keep pfc_sample_rate ~0.1.
CONFIG_7_LARGE_ID_PFC_V5E8 = TrainConfig(
    network="resnet_v1_50",
    embedding_dim=512,
    num_classes=93_431,            # MS1MV3 identity count
    image_size=112,
    crop_from=120,
    global_batch=2048,
    base_lr=0.4,
    lr_boundaries=(60_000, 100_000, 140_000),
    warmup_steps=5_000,
    weight_decay=5e-4,
    margin_scale=64.0,
    margin_m3=0.35,
    dtype=jnp.bfloat16,
    augment=True,
    pfc_sample_rate=0.1,
)
# mesh for config 7: create_mesh(data=2, model=4) (or data=1, model=8
# at 10^6+ ids) — the classifier shards over `model`.

# Modern-recipe training: AdaFace margins (quality-adaptive — the
# robust choice on web-scraped data), sub-centers for label noise,
# random erasing for occlusion robustness, cosine LR. The r3
# adaptive-loss family at CONFIG_4's scale (docs/design.md margin
# study: adaface 0.995 on the hardware harness).
CONFIG_8_ADAFACE_NOISY_DATA = TrainConfig(
    network="resnet_v1_50",
    embedding_dim=512,
    num_classes=10_572,
    image_size=112,
    crop_from=120,
    global_batch=256,
    base_lr=0.1,
    lr_schedule="cosine",
    lr_total_steps=220_000,
    warmup_steps=2_000,
    weight_decay=5e-4,
    margin_scale=64.0,
    margin_mode="adaface",
    subcenters=3,
    random_erase=0.25,
    dtype=jnp.bfloat16,
    augment=True,
)

_REGISTRY = {
    "extract_verify_cpu": CONFIG_1_EXTRACT_VERIFY_CPU,
    "se_resnet_extract": CONFIG_2_SE_RESNET_EXTRACT,
    "variant_backbones": CONFIG_3_VARIANT_BACKBONES,
    "casia_single_chip": CONFIG_4_CASIA_SINGLE_CHIP,
    "v5e8_data_parallel": CONFIG_5_V5E8_DATA_PARALLEL,
    "accuracy_serving_bf16": CONFIG_6_ACCURACY_SERVING_BF16,
    "large_id_pfc_v5e8": CONFIG_7_LARGE_ID_PFC_V5E8,
    "adaface_noisy_data": CONFIG_8_ADAFACE_NOISY_DATA,
}


def get_config(name: str):
    if name not in _REGISTRY:
        raise ValueError(f"unknown config '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_configs() -> list[str]:
    return sorted(_REGISTRY)
