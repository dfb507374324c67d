"""MobileFaceNet — the lightweight face-embedding architecture.

Beyond the reference's zoo (ref: SURVEY.md §2a lists ResNet / SE /
ResNeXt / DenseNet only): MobileFaceNet (Chen et al. 2018,
"MobileFaceNets: Efficient CNNs for Accurate Real-Time Face
Verification on Mobile Devices") is the standard small model of the
face-recognition ecosystem — ~1M params, ~0.44 GFLOPs at 112², built
from MobileNetV2-style inverted-residual bottlenecks with PReLU and a
Global Depthwise Convolution (GDConv) head instead of average pooling.
It rounds out the serving story at the opposite end from ResNet-50:
maximum queries/sec per chip when a deployment can trade a little
accuracy for throughput.

TPU-first notes (re-designed from the paper's table 1, not translated
from any mobile inference stack):

- NHWC + bfloat16 compute, f32 params/BN like the rest of the zoo.
- Depthwise 3×3s use ``feature_group_count == channels`` — XLA:TPU
  lowers these to VPU elementwise-window ops; at 1M params the model is
  HBM-latency-bound, so the pointwise (1×1) convs — which ARE MXU
  matmuls — dominate useful work and stay large via batching.
- GDConv(7×7, per-channel weights, VALID) is mathematically a
  per-channel weighted sum over the spatial map; we express it as one
  ``einsum('nhwc,hwc->nc', x, w)`` so XLA sees a single contraction
  instead of a degenerate 7×7 convolution with a 1×1 output.
- The expand → depthwise → project bottleneck is written as three ops
  with the linear (activation-free) projection the paper prescribes;
  XLA fuses BN+PReLU into the neighboring convs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tf_face_toolbox_tpu.models.iresnet import PReLU

# (expansion t, channels c, repeats n, first-block stride s) per stage —
# paper table 1. Every stride-2 halves the map: 112 → 56 → 28 → 14 → 7.
MOBILEFACENET_STAGES = (
    (2, 64, 5, 2),
    (4, 128, 1, 2),
    (2, 128, 6, 1),
    (4, 128, 1, 2),
    (2, 128, 2, 1),
)


def _bn(train: bool, dtype, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype,
                        param_dtype=jnp.float32, name=name)


class Bottleneck(nn.Module):
    """Inverted residual: 1×1 expand → dw3×3 → 1×1 linear project."""

    features: int
    expansion: int
    strides: tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        inp = x.shape[-1]
        mid = inp * self.expansion
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="expand")(x)
        y = _bn(train, self.dtype, "expand_bn")(y)
        y = PReLU(dtype=self.dtype, name="expand_prelu")(y)
        y = nn.Conv(mid, (3, 3), strides=self.strides, padding=1,
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="dw")(y)
        y = _bn(train, self.dtype, "dw_bn")(y)
        y = PReLU(dtype=self.dtype, name="dw_prelu")(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="project")(y)
        y = _bn(train, self.dtype, "project_bn")(y)
        if self.strides == (1, 1) and inp == self.features:
            y = y + x  # linear bottleneck: no activation on the stream
        return y


class GDConvHead(nn.Module):
    """Linear GDConv(k×k) → BN → 1×1 linear conv(D) → BN, as one module.

    The per-channel spatial weights replace global average pooling: the
    paper's insight is that FMap-end positions carry unequal importance
    for aligned faces, so the head learns the spatial weighting. The
    contraction is an einsum (see module docstring).
    """

    embedding_dim: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        _, h, w, c = x.shape
        gd = self.param("gdconv", nn.initializers.variance_scaling(
            2.0, "fan_in", "truncated_normal"), (h, w, c), jnp.float32)
        x = jnp.einsum("nhwc,hwc->nc", x, gd.astype(self.dtype))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="gdconv_bn")(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate,
                           deterministic=not train)(x)
        # Linear projection + BN in f32 — embedding precision sets the
        # cosine-parity ceiling and this is a negligible matmul.
        x = nn.Dense(self.embedding_dim, use_bias=False,
                     dtype=jnp.float32, param_dtype=jnp.float32,
                     name="linear")(x.astype(jnp.float32))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="features")(x)
        return x


class MobileFaceNet(nn.Module):
    """MobileFaceNet backbone; factory contract like the rest of the zoo:
    ``apply(variables, images, train) → (N, embedding_dim) f32``
    (un-normalized — extraction L2-normalizes).

    ``stages`` entries are (expansion, channels, repeats, stride);
    ``width_mult`` scales every channel count (the common ×2 variant of
    deployed stacks). Input H and W must be divisible by 16 (the four
    stride-2 reductions; 112² → 7² FMap-end like the paper).
    """

    stages: Sequence[tuple[int, int, int, int]] = MOBILEFACENET_STAGES
    stem_width: int = 64
    head_width: int = 512
    width_mult: float = 1.0
    embedding_dim: int = 512
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # Uniform-surface knobs (structural here, like iresnet's): the stem
    # IS the paper's 3×3/s2 + depthwise pair, the head IS GDConv, and
    # the int8 residual-carry path covers the ConvBN block library only.
    stem: str = "mobile"
    head_variant: str = "gdconv"
    quantized: bool | str = False

    def _w(self, c: int) -> int:
        return max(8, int(round(c * self.width_mult)))

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        if self.stem != "mobile":
            raise ValueError("mobilefacenet's stem is structurally the "
                             "paper's conv3x3/s2 + depthwise pair; got "
                             f"stem={self.stem!r}")
        if self.head_variant != "gdconv":
            raise ValueError("mobilefacenet's head is structurally "
                             "GDConv; got head_variant="
                             f"{self.head_variant!r}")
        if self.quantized:
            raise ValueError(
                "int8 serving is not supported for mobilefacenet (the "
                "static-int8 residual carry covers the ConvBN block "
                "library only); serve fp — at ~1M params the model is "
                "latency-bound, not compute-bound, so int8 buys little")
        x = images.astype(self.dtype)
        w0 = self._w(self.stem_width)
        x = nn.Conv(w0, (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = _bn(train, self.dtype, "conv1_bn")(x)
        x = PReLU(dtype=self.dtype, name="conv1_prelu")(x)
        x = nn.Conv(w0, (3, 3), padding=1, feature_group_count=w0,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="dw1")(x)
        x = _bn(train, self.dtype, "dw1_bn")(x)
        x = PReLU(dtype=self.dtype, name="dw1_prelu")(x)
        for si, (t, c, n, s) in enumerate(self.stages):
            for bi in range(n):
                x = Bottleneck(
                    features=self._w(c), expansion=t,
                    strides=(s, s) if bi == 0 else (1, 1),
                    dtype=self.dtype,
                    name=f"stage{si + 1}_{bi}")(x, train)
        wh = self._w(self.head_width)
        x = nn.Conv(wh, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(x)
        x = _bn(train, self.dtype, "conv2_bn")(x)
        x = PReLU(dtype=self.dtype, name="conv2_prelu")(x)
        x = GDConvHead(embedding_dim=self.embedding_dim,
                       dropout_rate=self.dropout_rate,
                       dtype=self.dtype, name="head")(x, train)
        return x.astype(jnp.float32)
