"""Network factory: string name → backbone module.

Uniform signature across the zoo (ref: upstream nets/__init__.py factory
[UPSTREAM-K]; SURVEY.md §2a "Net factory"):

    net = create_network("resnet_v1_50", dtype=jnp.bfloat16)
    variables = net.init(rng, images, train=False)
    embeddings = net.apply(variables, images, train=False)   # (N, 512) f32

Every entry produces a float32 ``embedding_dim`` embedding regardless of
compute dtype.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from tf_face_toolbox_tpu.models.densenet import DenseNet
from tf_face_toolbox_tpu.models.iresnet import IResNet
from tf_face_toolbox_tpu.models.mobilefacenet import MobileFaceNet
from tf_face_toolbox_tpu.models.resnet import ResNet
from tf_face_toolbox_tpu.models.vit import FaceViT

# name → (module class, fixed kwargs)
_REGISTRY: dict[str, tuple[type, dict[str, Any]]] = {
    # ResNet family (ref: upstream nets/resnet.py [UPSTREAM-K])
    "resnet_v1_50": (ResNet, dict(stage_sizes=(3, 4, 6, 3))),
    "resnet_v1_101": (ResNet, dict(stage_sizes=(3, 4, 23, 3))),
    "resnet_v1_152": (ResNet, dict(stage_sizes=(3, 8, 36, 3))),
    # SE-ResNet family (ref: upstream nets/se_resnet.py [UPSTREAM-K])
    "se_resnet_50": (ResNet, dict(stage_sizes=(3, 4, 6, 3), se_reduction=16)),
    "se_resnet_101": (ResNet, dict(stage_sizes=(3, 4, 23, 3), se_reduction=16)),
    # ResNeXt family, 32x4d convention: bottleneck width 128 at stage 0
    # with expansion 2 → stage outputs 256/512/1024/2048, matching the
    # paper (ref: upstream nets/resnext.py [UPSTREAM-K])
    "resnext_50": (ResNet, dict(stage_sizes=(3, 4, 6, 3), groups=32,
                                width_per_group=4, expansion=2)),
    "resnext_101": (ResNet, dict(stage_sizes=(3, 4, 23, 3), groups=32,
                                 width_per_group=4, expansion=2)),
    # SE-ResNeXt (composable knobs — free given the shared block library)
    "se_resnext_50": (ResNet, dict(stage_sizes=(3, 4, 6, 3), groups=32,
                                   width_per_group=4, expansion=2,
                                   se_reduction=16)),
    # JPEG/DCT-domain face backbone (PAPERS.md: Gueguen et al. 2018,
    # Ehrlich & Davis 2018, dos Santos 2021 — frequency-domain entry at
    # equal ImageNet accuracy). Late stages identical to r50's
    # (w256@14², w512@7²); a w128 28² stage (r50 stage-1 geometry)
    # replaces the 56² stage whose local filtering the 8x8 DCT basis
    # subsumes. The bf16 accuracy-class serving config (docs/design.md).
    # Geometry picked by measurement (tools/dct_arch_sweep.py, v5e-1
    # b256 bf16): (3,6,3)/(128,256,512) = 11.9k faces/sec (min 11.4k)
    # vs (4,6,3)/(128,..) 9.6k and (4,6,3)/(96,..) 10.9k.
    "dct_resnet_50": (ResNet, dict(stage_sizes=(3, 6, 3),
                                   stage_widths=(128, 256, 512),
                                   stem="dct")),
    # iResNet family (beyond the reference: the InsightFace/ArcFace-era
    # BasicBlock+PReLU architecture most published face checkpoints use;
    # import trained torch state_dicts via cli.import_torch and serve
    # with --input_norm=fixed). stem/head pinned: structural.
    "iresnet_18": (IResNet, dict(stage_sizes=(2, 2, 2, 2),
                                 stem="face", head_variant="flatten")),
    "iresnet_50": (IResNet, dict(stage_sizes=(3, 4, 14, 3),
                                 stem="face", head_variant="flatten")),
    "iresnet_100": (IResNet, dict(stage_sizes=(3, 13, 30, 3),
                                  stem="face", head_variant="flatten")),
    # Tiny iresnet for smoke tests / the import-CLI test.
    "iresnet_tiny": (IResNet, dict(stage_sizes=(1, 1),
                                   stage_widths=(8, 16),
                                   stem="face", head_variant="flatten")),
    # MobileFaceNet (beyond the reference: the standard lightweight
    # face net — Chen et al. 2018; see models/mobilefacenet.py). The
    # ×2-width variant is the common accuracy-recovering deployment.
    # stem/head pinned: structural (paper stem + GDConv head).
    "mobilefacenet": (MobileFaceNet, dict(stem="mobile",
                                          head_variant="gdconv")),
    "mobilefacenet_x2": (MobileFaceNet, dict(width_mult=2.0,
                                             stem="mobile",
                                             head_variant="gdconv")),
    # Tiny variant for smoke tests (two stages, 32² inputs OK).
    "mobilefacenet_tiny": (MobileFaceNet,
                           dict(stages=((2, 16, 1, 2), (2, 16, 1, 2)),
                                stem_width=8, head_width=32,
                                stem="mobile", head_variant="gdconv")),
    # JPEG-block-token ViT family (beyond the reference; PAPERS.md
    # "RGB no more" — tokens ARE the 8×8 DCT blocks, so the zero-decode
    # serving path of the dct stem applies unchanged). stem/head pinned:
    # structural. Small = the ViT-S class (W384/D12/H6, ~22M params);
    # tiny = the throughput tier (W192/D12/H3, ~5.7M).
    "dct_vit_small": (FaceViT, dict(depth=12, width=384, num_heads=6,
                                    stem="dct", head_variant="gap")),
    "dct_vit_tiny": (FaceViT, dict(depth=12, width=192, num_heads=3,
                                   stem="dct", head_variant="gap")),
    # Two-block smoke-test variant (16² inputs OK) — not a real model.
    "dct_vit_test": (FaceViT, dict(depth=2, width=32, num_heads=2,
                                   stem="dct", head_variant="gap")),
    # DenseNet family (ref: upstream nets/densenet.py [UPSTREAM-K])
    "densenet_121": (DenseNet, dict(stage_sizes=(6, 12, 24, 16))),
    "densenet_169": (DenseNet, dict(stage_sizes=(6, 12, 32, 32))),
    # Tiny variant for smoke tests / CI — not a reference model.
    "resnet_tiny": (ResNet, dict(stage_sizes=(1,), width_per_group=16)),
}


def list_networks() -> list[str]:
    return sorted(_REGISTRY)


def create_network(name: str, *, embedding_dim: int = 512,
                   dtype: jnp.dtype = jnp.float32, **overrides: Any):
    """Instantiate a backbone by name.

    Args:
      name: registry key, e.g. "resnet_v1_50".
      embedding_dim: output embedding size (BASELINE: 512).
      dtype: compute dtype (use jnp.bfloat16 on TPU).
      **overrides: any field of the underlying module (stem, head_variant, ...).
    """
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown network '{name}'; available: {list_networks()}")
    cls, kwargs = _REGISTRY[name]
    # A stem/head pinned in the registry is structural (dct_resnet_50
    # only works in the frequency domain; iresnet IS a face-stem
    # flatten-head net); CLIs pass their --stem/--head defaults
    # unconditionally, so the pin wins over a conflicting override.
    for pinned in ("stem", "head_variant"):
        if pinned in kwargs and overrides.get(
                pinned, kwargs[pinned]) != kwargs[pinned]:
            from absl import logging
            logging.warning("network %s pins %s=%s; ignoring %s=%s",
                            name, pinned, kwargs[pinned], pinned,
                            overrides[pinned])
            overrides = {k: v for k, v in overrides.items()
                         if k != pinned}
    merged = {**kwargs, **overrides,
              "embedding_dim": embedding_dim, "dtype": dtype}
    return cls(**merged)


def calibrate_quant_stats(name: str, variables, batches, *,
                          embedding_dim: int = 512,
                          dtype: jnp.dtype = jnp.float32,
                          **overrides: Any):
    """Static-int8 calibration pass: max-|activation| stats per conv.

    Runs ``batches`` (an iterable of standardized (N, S, S, 3) float
    images from the serving distribution) through the network in
    full-precision eval mode, recording each conv's running max |input|
    into the ``quant_stats`` collection. Returns ``variables`` with the
    frozen stats added — ready for ``create_network(...,
    quantized="static")`` serving, where the activation quantize is a
    single fusable elementwise op (no dynamic max pass).

    The returned tree's params/batch_stats are untouched: the same
    checkpoint serves fp, dynamic-int8 and static-int8 modes.
    """
    overrides.pop("quantized", None)
    calib = create_network(name, embedding_dim=embedding_dim, dtype=dtype,
                           quantized="calibrate", **overrides)

    @jax.jit
    def update(v, x):
        _, mutated = calib.apply(v, x, train=False,
                                 mutable=["quant_stats"])
        return mutated["quant_stats"]

    variables = dict(variables)
    for x in batches:
        if "quant_stats" not in variables:
            # first batch also CREATES the stat tree (separate trace)
            _, mutated = calib.apply(variables, x, train=False,
                                     mutable=["quant_stats"])
            variables["quant_stats"] = mutated["quant_stats"]
        else:
            variables["quant_stats"] = update(variables, x)
    if "quant_stats" not in variables:
        raise ValueError("calibrate_quant_stats: empty batch iterable")
    return variables


def init_variables(net, rng: jax.Array, input_shape: tuple[int, ...]):
    """Jit-compiled variable init (params + batch_stats).

    ~7x faster than eager ``net.init`` — eager init dispatches one tiny
    XLA program per parameter tensor; jitting fuses the whole tree into
    one compile.
    """
    dummy = jnp.zeros(input_shape, jnp.float32)
    return jax.jit(functools.partial(net.init, train=False))(rng, dummy)
