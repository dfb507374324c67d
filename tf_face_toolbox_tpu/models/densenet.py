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
)


class _BNReLUConv(nn.Module):
    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32,
                    kernel_init=conv_kernel_init)(x)
        return x


class DenseLayer(nn.Module):
    """Bottlenecked dense layer: BN-ReLU-1x1(4k) → BN-ReLU-3x3(k), concat."""

    growth_rate: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = _BNReLUConv(4 * self.growth_rate, (1, 1), dtype=self.dtype)(x, train)
        y = _BNReLUConv(self.growth_rate, (3, 3), dtype=self.dtype)(y, train)
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
                x = DenseLayer(self.growth_rate, dtype=self.dtype)(x, train)
            if stage_idx != len(self.stage_sizes) - 1:
                # Transition: 1x1 compress + 2x2 avg-pool downsample.
                out = int(x.shape[-1] * self.compression)
                x = _BNReLUConv(out, (1, 1), dtype=self.dtype)(x, train)
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
