"""Shared layer library for the backbone zoo.

TPU-first conventions used throughout:

- NHWC activations / HWIO kernels: the native layout for XLA:TPU convs.
- ``dtype`` is the *compute* dtype (bfloat16 on TPU for MXU throughput);
  ``param_dtype`` stays float32 so optimizers and BN statistics remain
  accurate. flax inserts the casts; XLA fuses them into the convs.
- Conv is bias-free when followed by BN (the BN shift subsumes it), so
  XLA can fuse conv+BN+ReLU into a single kernel (BASELINE.json
  north_star: "conv+BN+ReLU fusion").
- No data-dependent Python control flow: every module traces to a static
  graph; `train` is a static argument.

The reference's equivalents live in its ``nets/*.py`` as raw
``tf.nn.conv2d`` + ``tf.layers.batch_normalization`` calls
(ref: upstream nets/resnet.py [UPSTREAM-K]).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any

# Kaiming/He normal: the standard init for ReLU residual nets.
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
dense_kernel_init = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")


def int8_conv(x: jax.Array, kernel: jax.Array,
              strides: tuple[int, int], groups: int = 1,
              act_scale: jax.Array | None = None) -> jax.Array:
    """W8A8 convolution on the int8 MXU path (v5e: 2x bf16 peak).

    - weights: symmetric per-output-channel scales (zero accuracy cost
      for conv weights, standard PTQ practice)
    - activations: ``act_scale=None`` → dynamic per-sample scale (a
      max-reduce per layer — needs no calibration but costs an extra
      pass over the activations, which on bandwidth-bound stages eats
      the MXU gain); else a FROZEN per-tensor scale from calibration —
      the quantize collapses to one fusable elementwise op.
    - accumulation in int32; dequantized output in float32

    Serving-only: the training path stays bf16.
    """
    ks = jnp.max(jnp.abs(kernel), axis=(0, 1, 2), keepdims=True) / 127.0
    ks = jnp.maximum(ks, 1e-12)
    kq = jnp.round(kernel / ks).astype(jnp.int8)
    x = x.astype(jnp.float32)
    if act_scale is None:
        # PER-SAMPLE activation scale: a per-batch max would make each
        # image's quantization grid depend on its co-batched images
        # (non-reproducible embeddings across batchings).
        xs = jnp.maximum(
            jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True) / 127.0,
            1e-12)
        xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, kq, strides, "SAME",
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (xs * ks.reshape(1, 1, 1, -1))
    # STATIC scale: quantize with the frozen per-tensor scale, then the
    # shared int8-conv + dequant path below.
    xs = jnp.maximum(act_scale, 1e-12)
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    return int8_conv_prequant(xq, xs, kernel, strides, groups,
                              _ks=(kq, ks))


def int8_conv_prequant(xq: jax.Array, xs: jax.Array, kernel: jax.Array,
                       strides: tuple[int, int], groups: int = 1,
                       _ks=None) -> jax.Array:
    """int8 conv over an ALREADY-quantized activation tensor.

    Used by the static-int8 residual carry: the block stream between
    residual blocks is materialized once as s8 (plus its frozen scalar
    scale) and every consumer — bottleneck conv, projection conv, and
    the dequantized skip connection — reads that one buffer.

    The conv asks the MXU drain for bf16 output — int32 accumulation
    happens inside the MXU either way, but the materialized conv output
    halves from 4 to 2 bytes/elem (measured: s32 conv outputs alone
    were 11.2 GB/batch on the face stem, the single largest HBM
    consumer of the whole network).
    """
    if _ks is None:
        ks = jnp.max(jnp.abs(kernel), axis=(0, 1, 2),
                     keepdims=True) / 127.0
        ks = jnp.maximum(ks, 1e-12)
        kq = jnp.round(kernel / ks).astype(jnp.int8)
    else:
        kq, ks = _ks
    y = jax.lax.conv_general_dilated(
        xq, kq, strides, "SAME",
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)
    scale = (xs * ks.reshape(1, 1, 1, -1)).astype(jnp.bfloat16)
    return (y * scale).astype(jnp.float32)


def fake_quant_ste(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric int8 fake-quantization with a straight-through gradient.

    Forward: round(clip(x/scale)) * scale — the exact value grid the
    int8 serving path (int8_conv) produces. Backward: identity (the
    classic STE), so training sees the quantization error as forward
    noise and learns weights that sit well on the int8 grid.
    """
    q = jnp.clip(jnp.round(x / scale), -127, 127) * scale
    return x + jax.lax.stop_gradient(q - x)


class ConvBN(nn.Module):
    """Conv → BatchNorm, optionally → ReLU, shaped for XLA fusion.

    Equivalent of the reference's conv+BN pairs inside every backbone
    block (ref: upstream nets/resnet.py [UPSTREAM-K]).

    ``quantized`` (training always runs ``dtype`` except "qat"):
      - ``False``: full-precision convs.
      - ``True`` / ``"dynamic"``: W8A8 with per-sample dynamic
        activation scales (no calibration; extra max pass per layer).
      - ``"calibrate"``: full-precision math, but records the running
        max |input| of every conv into the ``quant_stats`` collection
        (apply with ``mutable=["quant_stats"]``).
      - ``"static"``: W8A8 with the frozen per-tensor scales from a
        prior calibration pass — the quantize is one fusable
        elementwise op, so the int8 bandwidth/MXU win is kept intact.
      - ``"qat"``: quantization-aware TRAINING — the train forward
        fake-quantizes the conv input (per-tensor dynamic scale) and
        kernel (per-output-channel) onto the int8 grid with
        straight-through gradients, mimicking the "static" serving
        math; eval mode is full precision (serve the result via
        calibrate → static as usual).
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    groups: int = 1
    relu: bool = True
    # `scale_init` lets zero-init the last BN of a residual branch
    # (identity-at-init residual blocks: stabilizes large-batch training).
    bn_scale_init: Callable = nn.initializers.ones
    dtype: jnp.dtype = jnp.float32
    quantized: bool | str = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool,
                 prequant: tuple[jax.Array, jax.Array] | None = None
                 ) -> jax.Array:
        # One explicit kernel param shared by the fp and int8 paths, so
        # a checkpoint loads into either mode unchanged.
        in_features = (prequant[0].shape[-1] if prequant is not None
                       else x.shape[-1])
        kernel = self.param(
            "kernel", conv_kernel_init,
            (*self.kernel_size, in_features // self.groups,
             self.features), jnp.float32)
        mode = ("dynamic" if self.quantized is True else self.quantized)
        if mode == "static_dense":
            # ResNeXt probe finding (r3, docs/design.md): a grouped 3x3
            # with width-4 groups has per-group contraction K=36 and
            # N=4 — two orders below the 128x128 MXU tile, so int8's 2x
            # peak never engages and its quantize/dequant is pure
            # overhead. Quantize dense convs only.
            mode = "static" if self.groups == 1 else False
        if mode == "qat":
            if train:
                # QAT in f32 (quantization error << bf16 resolution),
                # cast to the compute dtype only for the conv itself.
                xf = x.astype(jnp.float32)
                xs = jnp.maximum(
                    jnp.max(jnp.abs(jax.lax.stop_gradient(xf))) / 127.0,
                    1e-12)
                x = fake_quant_ste(xf, xs)
                ks = jnp.maximum(
                    jnp.max(jnp.abs(jax.lax.stop_gradient(kernel)),
                            axis=(0, 1, 2), keepdims=True) / 127.0,
                    1e-12)
                kernel = fake_quant_ste(kernel, ks)
            mode = False  # fall through to the fp conv below
        if mode == "calibrate" and not train:
            stat = self.variable("quant_stats", "act_max",
                                 lambda: jnp.zeros((), jnp.float32))
            stat.value = jnp.maximum(
                stat.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            mode = False  # fall through to the fp conv below
        if mode == "static" and not train:
            if prequant is not None:
                # Input already int8 (the block-level residual carry):
                # no quantize here, just the int8 conv + dequant.
                xq, xs = prequant
                x = int8_conv_prequant(xq, xs, kernel, self.strides,
                                       self.groups)
            else:
                if not self.has_variable("quant_stats", "act_max"):
                    raise ValueError(
                        "quantized='static' needs calibrated quant_stats;"
                        " run models.calibrate_quant_stats(...) first")
                act_max = self.get_variable("quant_stats", "act_max")
                x = int8_conv(x, kernel, self.strides, self.groups,
                              act_scale=act_max / 127.0)
            x = x.astype(self.dtype)
        elif mode == "dynamic" and not train:
            x = int8_conv(x, kernel, self.strides, self.groups)
            x = x.astype(self.dtype)
        else:
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, "SAME",
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # Tag for the "save_convs" remat policy (models.resnet):
            # backward keeps conv outputs, recomputes BN/ReLU from them.
            from jax.ad_checkpoint import checkpoint_name
            x = checkpoint_name(x, "conv_out")
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            scale_init=self.bn_scale_init,
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class SqueezeExcite(nn.Module):
    """Squeeze-and-Excitation channel gating.

    GAP → FC(C/r) → ReLU → FC(C) → sigmoid → channel scale
    (ref: upstream nets/se_resnet.py [UPSTREAM-K]; SURVEY.md §3.4).

    The two FCs are 1x1-dense on a (N, 1, 1, C) tensor — tiny matmuls the
    MXU eats for free; XLA fuses the sigmoid-scale into the surrounding
    elementwise stream.
    """

    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        squeezed = jnp.mean(x, axis=(1, 2), keepdims=True)  # (N,1,1,C)
        s = nn.Dense(max(c // self.reduction, 8), dtype=self.dtype,
                     param_dtype=jnp.float32)(squeezed)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(s)
        s = nn.sigmoid(s)
        return x * s


class EmbeddingHead(nn.Module):
    """Final embedding head: pool/flatten → FC(dim) → BN (no scale-relu).

    Produces the 512-d face embedding (BASELINE.json: "512-d embeddings";
    ref: upstream per-net final layers [UPSTREAM-K]). Two variants:

    - ``gap``: global average pool → FC → BN  (SURVEY.md §3.4 call stack)
    - ``flatten``: BN → dropout → flatten → FC → BN (ArcFace-style "E"
      head; heavier but stronger for 112x112 face crops)
    """

    embedding_dim: int = 512
    variant: str = "gap"  # "gap" | "flatten"
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.variant == "gap":
            x = jnp.mean(x, axis=(1, 2))
        elif self.variant == "flatten":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = x.reshape((x.shape[0], -1))
        else:
            raise ValueError(f"unknown head variant: {self.variant}")
        x = nn.Dense(self.embedding_dim, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     kernel_init=dense_kernel_init)(x)
        # Final BN without ReLU: standard for face embeddings; emit f32 so
        # downstream L2-normalization / cosine math is accurate.
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x)
        return x.astype(jnp.float32)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along ``axis`` (safe at zero)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)
    return x / norm
