"""DenseNet backbone producing a face embedding.

(ref: upstream nets/densenet.py [UPSTREAM-K]; BASELINE.json configs[2]
"DenseNet / ResNeXt backbone variants under the same extraction API")

TPU-first notes:
- Dense blocks concatenate along the channel (last, lane) axis — the
  cheap axis to concatenate on in NHWC, and XLA keeps the concats as
  views feeding the next conv.
- BN→ReLU→Conv pre-activation ordering (DenseNet convention), all
  bfloat16-computable, params f32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tf_face_toolbox_tpu.models.layers import (
    EmbeddingHead,
    conv_kernel_init,
    int8_conv,
)


class _BNReLUConv(nn.Module):
    """Pre-activation BN→ReLU→Conv (DenseNet ordering).

    ``quantized`` mirrors layers.ConvBN's serving modes for the
    post-activation conv input (False | "dynamic"/True | "calibrate" |
    "static") — the concat stream between layers stays bf16 (XLA keeps
    the concats as views, so unlike ResNet's inter-block residual
    stream there is no single carry tensor worth quantizing)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32
    quantized: bool | str = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        kernel = self.param(
            "kernel", conv_kernel_init,
            (*self.kernel_size, x.shape[-1], self.features), jnp.float32)
        mode = "dynamic" if self.quantized is True else self.quantized
        if mode == "static_dense":
            # DenseNet has no grouped convs: the dense-only split is
            # exactly "static" here (silently serving fp would mislabel
            # benchmark results — review r3)
            mode = "static"
        if mode == "calibrate" and not train:
            stat = self.variable("quant_stats", "act_max",
                                 lambda: jnp.zeros((), jnp.float32))
            stat.value = jnp.maximum(
                stat.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            mode = False
        if mode == "static" and not train:
            if not self.has_variable("quant_stats", "act_max"):
                raise ValueError(
                    "quantized='static' needs calibrated quant_stats; "
                    "run models.calibrate_quant_stats(...) first")
            act_max = self.get_variable("quant_stats", "act_max")
            x = int8_conv(x, kernel, self.strides,
                          act_scale=act_max / 127.0).astype(self.dtype)
        elif mode == "dynamic" and not train:
            x = int8_conv(x, kernel, self.strides).astype(self.dtype)
        else:
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x


class DenseLayer(nn.Module):
    """Bottlenecked dense layer: BN-ReLU-1x1(4k) → BN-ReLU-3x3(k), concat."""

    growth_rate: int
    dtype: jnp.dtype = jnp.float32
    quantized: bool | str = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = _BNReLUConv(4 * self.growth_rate, (1, 1), dtype=self.dtype,
                        quantized=self.quantized)(x, train)
        y = _BNReLUConv(self.growth_rate, (3, 3), dtype=self.dtype,
                        quantized=self.quantized)(y, train)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    """DenseNet-BC with a 512-d embedding head."""

    stage_sizes: Sequence[int] = (6, 12, 24, 16)  # DenseNet-121
    growth_rate: int = 32
    compression: float = 0.5
    embedding_dim: int = 512
    stem: str = "face"
    head_variant: str = "gap"
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # serving-only W8A8 on every dense-layer/transition conv (stem conv
    # stays fp — 3-channel input, negligible cost, quantization-noise
    # prone): False | True/"dynamic" | "calibrate" | "static".
    quantized: bool | str = False

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        x = images.astype(self.dtype)
        init_features = 2 * self.growth_rate
        if self.stem == "face":
            x = nn.Conv(init_features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=conv_kernel_init)(x)
            # Downsample 112 → 56 so stage maps match the ResNet face stem.
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        elif self.stem == "imagenet":
            x = nn.Conv(init_features, (7, 7), strides=(2, 2), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        kernel_init=conv_kernel_init)(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        else:
            raise ValueError(f"unknown stem: {self.stem}")

        for stage_idx, num_layers in enumerate(self.stage_sizes):
            for _ in range(num_layers):
                x = DenseLayer(self.growth_rate, dtype=self.dtype,
                               quantized=self.quantized)(x, train)
            if stage_idx != len(self.stage_sizes) - 1:
                # Transition: 1x1 compress + 2x2 avg-pool downsample.
                out = int(x.shape[-1] * self.compression)
                x = _BNReLUConv(out, (1, 1), dtype=self.dtype,
                                quantized=self.quantized)(x, train)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        # Final BN-ReLU before the head (DenseNet convention).
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        return EmbeddingHead(
            embedding_dim=self.embedding_dim,
            variant=self.head_variant,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
        )(x, train)
