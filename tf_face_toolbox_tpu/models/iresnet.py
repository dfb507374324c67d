"""iResNet backbones — the ArcFace-era "improved ResNet" family.

The modern face-recognition community (InsightFace's arcface_torch,
and most published ArcFace/CosFace checkpoints since ~2019) trains on
a BasicBlock variant that differs from the classic ResNet the reference
shipped (ref: upstream nets/resnet.py [UPSTREAM-K]; SURVEY.md §2a):

- BN-first blocks: BN → 3x3 conv → BN → PReLU → 3x3 conv (stride) → BN,
  residual add with NO activation after the add;
- per-channel PReLU instead of ReLU;
- 3x3/s1 stem (112² aligned crops), every stage at stride 2 → 7² map;
- "E" head: BN → dropout → flatten → FC(512) → BN1d.

This module re-implements that architecture TPU-first (NHWC, bfloat16
compute on the MXU, f32 BN/params like the rest of the zoo) so users
can (a) train it here and (b) import trained PyTorch ``state_dict``
checkpoints via ``interop.torch_iresnet`` / ``cli.import_torch`` and
serve them from this framework. Note imported checkpoints expect the
fixed InsightFace input normalization ``(x - 127.5) / 127.5``
(``ops.preprocess.fixed_standardization``; ``cli.extract
--input_norm=fixed``), not the reference's per-image standardization.

Architecture source: the public iresnet description (Duta et al. 2020,
"Improved Residual Networks"; InsightFace arcface_torch backbones) —
re-implemented from the block diagram, not translated.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel PReLU: ``where(x >= 0, x, alpha * x)``.

    (flax's ``nn.PReLU`` is a single scalar slope; torch's
    ``nn.PReLU(C)`` — the iresnet convention — learns one slope per
    channel.)
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (x.shape[-1],), jnp.float32)
        return jnp.where(x >= 0, x, alpha.astype(self.dtype) * x)


class IBasicBlock(nn.Module):
    """BN-first basic block with PReLU and a stride on the SECOND conv."""

    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        conv = lambda name, strides: nn.Conv(  # noqa: E731
            self.features, (3, 3), strides=strides, padding=1,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        y = bn("bn1")(x)
        y = conv("conv1", (1, 1))(y)
        y = bn("bn2")(y)
        y = PReLU(dtype=self.dtype, name="prelu")(y)
        y = conv("conv2", self.strides)(y)
        y = bn("bn3")(y)
        if self.strides != (1, 1) or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=self.strides, use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        else:
            identity = x
        return y + identity  # no activation after the add (iresnet)


class IResNet(nn.Module):
    """iresnet-18/50/100-style backbone producing a face embedding.

    Same factory contract as the rest of the zoo:
    ``apply(variables, images, train) → (N, embedding_dim) f32``
    (un-normalized — extraction L2-normalizes, like every head here).
    """

    stage_sizes: Sequence[int] = (3, 4, 14, 3)          # iresnet-50
    stage_widths: Sequence[int] = (64, 128, 256, 512)
    embedding_dim: int = 512
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # Compatibility knobs so the factory/CLI surface stays uniform.
    # They are structural here: iresnet IS a face-stem, flatten-head
    # architecture, and the int8 serving path (ConvBN residual carry)
    # does not cover its BN-first blocks — refuse loudly, don't drift.
    stem: str = "face"
    head_variant: str = "flatten"
    quantized: bool | str = False

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        """images: (N, H, W, 3) float, fixed-normalized
        ``(x - 127.5) / 127.5`` for imported checkpoints. → (N, D) f32."""
        if self.stem != "face":
            raise ValueError("iresnet is structurally a 3x3/s1 face-stem "
                             f"net; got stem={self.stem!r}")
        if self.head_variant != "flatten":
            raise ValueError("iresnet's head is structurally the "
                             "flatten 'E' head; got head_variant="
                             f"{self.head_variant!r}")
        if self.quantized:
            raise ValueError(
                "int8 serving is not supported for iresnet (the static-"
                "int8 residual carry covers the ConvBN block library "
                "only); serve fp — bf16 compute is the fast path")
        x = images.astype(self.dtype)
        x = nn.Conv(self.stage_widths[0], (3, 3), strides=(1, 1),
                    padding=1, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn1")(x)
        x = PReLU(dtype=self.dtype, name="prelu")(x)
        for stage_idx, num_blocks in enumerate(self.stage_sizes):
            for block_idx in range(num_blocks):
                x = IBasicBlock(
                    features=self.stage_widths[stage_idx],
                    strides=(2, 2) if block_idx == 0 else (1, 1),
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn2")(x)
        # Flatten in NHWC order; the torch importer permutes fc weights
        # from torch's CHW flatten, so trees stay layout-natural here.
        x = x.reshape((x.shape[0], -1))
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate,
                           deterministic=not train)(x)
        # FC + the final BN1d in f32: embedding precision sets the
        # cosine-parity ceiling, and this is <1% of the FLOPs.
        x = nn.Dense(self.embedding_dim, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="fc")(
                         x.astype(jnp.float32))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="features")(x)
        return x.astype(jnp.float32)
