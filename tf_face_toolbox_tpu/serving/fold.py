"""Batch-norm folding for inference.

At eval time ``BN(conv(x, K))`` is an affine function of the conv:

    y = g * (conv(x, K) - mu) / sqrt(var + eps) + beta
      = conv(x, K * r) + (beta - mu * r),      r = g / sqrt(var + eps)

so the pair collapses to one conv with a per-output-channel rescaled
kernel plus a bias. The reference era shipped this as TF's
"freeze_graph + fold_batch_norms" deployment transform [TF1-IDIOM]; here
it is a pure pytree-to-pytree function over the flax variables.

Folding happens in float32 regardless of serving dtype (the checkpoint
may already be cast to bf16 for serving — bench.py does this); the
folded kernel/bias are then cast to the engine's compute dtype once.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

BN_EPS = 1e-5  # models/layers.py ConvBN uses epsilon=1e-5 throughout


@dataclass(frozen=True)
class FoldedConv:
    """A ConvBN collapsed to conv + bias (+ the ConvBN's static config)."""

    kernel: jax.Array        # (kh, kw, cin/groups, cout), compute dtype
    bias: jax.Array          # (cout,) float32
    strides: tuple[int, int]
    groups: int
    relu: bool

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.lax.conv_general_dilated(
            x, self.kernel, self.strides, "SAME",
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + self.bias.astype(y.dtype)
        return jax.nn.relu(y) if self.relu else y


def fold_conv_bn(convbn_params: Any, convbn_stats: Any, *,
                 strides: tuple[int, int] = (1, 1), groups: int = 1,
                 relu: bool = True, dtype=jnp.float32) -> FoldedConv:
    """Fold one ConvBN submodule's {params, batch_stats} into a FoldedConv.

    ``convbn_params``: {"kernel", "BatchNorm_0": {"scale", "bias"}}
    ``convbn_stats``:  {"BatchNorm_0": {"mean", "var"}}
    (models/layers.py ConvBN's tree layout).
    """
    kernel = jnp.asarray(convbn_params["kernel"], jnp.float32)
    bn_p = convbn_params["BatchNorm_0"]
    bn_s = convbn_stats["BatchNorm_0"]
    scale = jnp.asarray(bn_p["scale"], jnp.float32)
    beta = jnp.asarray(bn_p["bias"], jnp.float32)
    mean = jnp.asarray(bn_s["mean"], jnp.float32)
    var = jnp.asarray(bn_s["var"], jnp.float32)
    r = scale * jax.lax.rsqrt(var + BN_EPS)
    return FoldedConv(
        kernel=(kernel * r).astype(dtype),
        bias=beta - mean * r,
        strides=strides,
        groups=groups,
        relu=relu,
    )


def fold_dense_bn(dense_params: Any, bn_params: Any, bn_stats: Any, *,
                  dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    """Fold Dense -> BatchNorm (the embedding head) into (W', b') f32.

    emb = scale * (x @ W + b - mean) / sqrt(var+eps) + beta
        = x @ (W * r) + ((b - mean) * r + beta)
    """
    w = jnp.asarray(dense_params["kernel"], jnp.float32)
    b = jnp.asarray(dense_params["bias"], jnp.float32)
    scale = jnp.asarray(bn_params["scale"], jnp.float32)
    beta = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    r = scale * jax.lax.rsqrt(var + BN_EPS)
    return (w * r).astype(dtype), (b - mean) * r + beta
