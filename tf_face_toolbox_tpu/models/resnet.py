"""ResNet-family backbones: ResNet, SE-ResNet, ResNeXt (one implementation).

The three families differ only in two orthogonal knobs on the bottleneck
block, so they share one module instead of three copy-pasted files
(the reference keeps nets/resnet.py, nets/se_resnet.py, nets/resnext.py
as separate ~300-line files [UPSTREAM-K]):

- ``groups``/``width_per_group``: cardinality of the 3x3 conv (ResNeXt).
- ``se_reduction``: squeeze-excite gating after the 3x3 (SE-ResNet).

TPU-first notes:
- NHWC + bfloat16 compute keeps every conv on the MXU at full tile width.
- The hot loop is the 3x3 bottleneck convs (SURVEY.md §3.4: ≥90% of
  FLOPs); they are plain ``lax.conv_general_dilated`` calls that XLA:TPU
  maps straight onto the systolic array — no hand-written kernel can beat
  the compiler here, so Pallas is reserved for the input pipeline.
- Residual adds and ReLUs fuse into the conv epilogues.
- Stems: ``face`` = 3x3/s1 conv (for 112x112 aligned crops, ArcFace-era
  convention → final 7x7 map); ``imagenet`` = 7x7/s2 + 3x3 maxpool
  (classic, for 224x224 → final 7x7 map).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tf_face_toolbox_tpu.models.layers import ConvBN, EmbeddingHead, SqueezeExcite


class BottleneckBlock(nn.Module):
    """1x1 → 3x3(grouped) → 1x1 bottleneck with residual add.

    (ref: upstream nets/resnet.py bottleneck [UPSTREAM-K]; SURVEY.md §3.4)
    """

    features: int          # bottleneck width (the 3x3's channel count)
    strides: tuple[int, int]
    groups: int = 1
    se_reduction: int = 0  # 0 = no SE
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32
    quantized: bool | str = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool,
                 prequant=None) -> jax.Array:
        """``prequant=(xq s8, scale)``: static-int8 residual carry — the
        block input arrives already quantized; the bottleneck path, the
        projection shortcut, and the (dequantized) identity skip all
        read that single s8 buffer, so no bf16 copy of the inter-block
        stream ever hits HBM."""
        out_features = self.features * self.expansion
        q = self.quantized
        if prequant is not None:
            xq, xs = prequant
            residual = (xq.astype(self.dtype)
                        * xs.astype(self.dtype))  # fuses into final add
            in_shape = xq.shape
            y = ConvBN(self.features, (1, 1), dtype=self.dtype,
                       quantized=q)(None, train, prequant=prequant)
        else:
            residual = x
            in_shape = x.shape
            y = ConvBN(self.features, (1, 1), dtype=self.dtype,
                       quantized=q)(x, train)
        y = ConvBN(self.features, (3, 3), strides=self.strides,
                   groups=self.groups, dtype=self.dtype,
                   quantized=q)(y, train)
        # Zero-init the last BN scale: block starts as identity, which
        # stabilizes the large-batch margin-softmax training regime.
        y = ConvBN(out_features, (1, 1), relu=False,
                   bn_scale_init=nn.initializers.zeros,
                   dtype=self.dtype, quantized=q)(y, train)
        if self.se_reduction > 0:
            y = SqueezeExcite(self.se_reduction, dtype=self.dtype)(y)
        if in_shape[-1] != out_features or self.strides != (1, 1):
            proj = ConvBN(out_features, (1, 1), strides=self.strides,
                          relu=False, dtype=self.dtype, quantized=q)
            if prequant is not None:
                residual = proj(None, train, prequant=prequant)
            else:
                residual = proj(residual, train)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    """Configurable ResNet/SE-ResNet/ResNeXt producing a face embedding."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)   # ResNet-50
    width_per_group: int = 64
    # Explicit per-stage bottleneck widths; None = the classic
    # width_per_group·groups·2^stage doubling. Used by the JPEG-domain
    # variant whose stages start at 28² with r50's late-stage widths.
    stage_widths: Sequence[int] | None = None
    groups: int = 1
    se_reduction: int = 0
    # Output channels = bottleneck width × expansion. ResNet uses 4;
    # ResNeXt-32x4d uses 2 (width 128 → output 256 at stage 0).
    expansion: int = 4
    embedding_dim: int = 512
    stem: str = "face"    # "face" | "imagenet" | "space2depth" | "dct"
    # dct stem: channels after the frequency-domain 1x1 + depth2space
    dct_stem_features: int = 256
    head_variant: str = "gap"
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # serving-only W8A8 convs: False | True/"dynamic" | "calibrate" |
    # "static" (training always runs ``dtype``) — see layers.ConvBN
    quantized: bool | str = False
    # Rematerialization in backward:
    #   True / "full": jax.checkpoint whole blocks — ~1 extra forward of
    #     FLOPs for O(depth) less activation memory. Measured 7% SLOWER
    #     on r50@112/b512 v5e; use only to avoid OOM.
    #   "save_convs": selective policy — save ONLY conv outputs
    #     (checkpoint_name "conv_out" in layers.ConvBN); BN/ReLU/add
    #     chains are recomputed in backward from them. Convs are never
    #     recomputed, the recompute is VPU-cheap, and the saved-residual
    #     traffic drops.
    remat: bool | str = False

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        """images: (N, H, W, 3) float — standardized pixels. → (N, D) f32."""
        x = images.astype(self.dtype)
        if self.stem == "face":
            x = ConvBN(64, (3, 3), strides=(1, 1), dtype=self.dtype)(x, train)
        elif self.stem == "imagenet":
            x = ConvBN(64, (7, 7), strides=(2, 2), dtype=self.dtype)(x, train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        elif self.stem == "space2depth":
            # TResNet-style stem (PAPERS.md "TResNet: High Performance
            # GPU-Dedicated Architecture", §SpaceToDepth): losslessly
            # re-layout 2x2 pixel blocks into channels (H,W,3 → H/2,W/2,
            # 12), then one 3x3 conv. Same stage resolutions as the
            # `face` stem (stage 0 runs at stride 1 — the s2d already
            # downsampled), but the MXU-hostile 3-channel full-res conv
            # disappears and block-0's pre-stride 1x1s run at half res.
            n, h, w, c = x.shape
            x = x.reshape(n, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                n, h // 2, w // 2, 4 * c)
            x = ConvBN(64, (3, 3), strides=(1, 1), dtype=self.dtype)(x, train)
        elif self.stem == "dct":
            # JPEG-domain entry (PAPERS.md: Gueguen et al. 2018 "Faster
            # Neural Networks Straight from JPEG"; Ehrlich & Davis 2018;
            # dos Santos 2021): the 8x8 blockwise DCT replaces the
            # 112²/56² high-resolution stages — their MXU-hostile
            # 64-channel convs are where the accuracy-class stems spend
            # most of their time (docs/design.md). Accepts EITHER
            # standardized pixels (N, H, W, 3) — exact linear re-layout
            # to (H/8, W/8, 192) — or an already-prepared coefficient
            # tensor (N, H/8, W/8, 192) from ops/dct.prepare_coefficients
            # (the zero-decode serving path: entropy decode on host,
            # nothing else).
            from tf_face_toolbox_tpu.ops import dct as dct_ops

            if x.shape[-1] == 3:
                x = dct_ops.block_dct(x).astype(self.dtype)
            elif x.shape[-1] != 192:
                raise ValueError(
                    f"dct stem wants (N,H,W,3) pixels or (N,h,w,192) "
                    f"coefficients, got trailing dim {x.shape[-1]}")
            # Frequency norm (Gueguen §4.2): coefficient magnitudes span
            # orders of magnitude across the band; BN equalizes them.
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
            # Learned frequency→space up-projection: 1x1 over the 192
            # frequency channels to 4·C, then depth-to-space to 28² —
            # a full-rank learnable sibling of the fixed IDCT re-layout,
            # with every matmul ≥192 wide (full MXU tiles).
            c0 = self.dct_stem_features
            x = ConvBN(4 * c0, (1, 1), dtype=self.dtype)(x, train)
            n, h, w, _ = x.shape
            x = x.reshape(n, h, w, 2, 2, c0)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c0)
        else:
            raise ValueError(f"unknown stem: {self.stem}")

        # Explicit names keep the param tree identical with/without remat
        # (nn.remat otherwise renames the scope to remat(Checkpoint...)).
        if self.remat == "save_convs":
            block_cls = nn.remat(
                BottleneckBlock, static_argnums=(2,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out"))
        elif self.remat:
            block_cls = nn.remat(BottleneckBlock, static_argnums=(2,))
        else:
            block_cls = BottleneckBlock
        # Static-int8 residual carry: quantize the inter-block stream
        # ONCE per boundary with a frozen block-level scale; the block's
        # convs and its skip path all read the same s8 buffer, so the
        # bf16 copy of every 56²/28²/14² activation vanishes from HBM.
        carry_int8 = (self.quantized in ("static", "static_dense")
                      and not train)
        record_carry = self.quantized == "calibrate" and not train
        # QAT: fake-quantize the inter-block stream too, mirroring the
        # static-int8 residual carry the model will serve with (the
        # skip path reads the dequantized s8 buffer at serving time).
        qat_carry = self.quantized == "qat" and train
        block_counter = 0
        for stage_idx, num_blocks in enumerate(self.stage_sizes):
            if self.stage_widths is not None:
                features = self.stage_widths[stage_idx]
            else:
                features = (self.width_per_group * self.groups
                            * (2 ** stage_idx))
            for block_idx in range(num_blocks):
                # Face stem keeps stage 0 at stride 2 too (112 → 56);
                # imagenet/s2d stems already downsampled, so stage 0 is s1.
                first = block_idx == 0
                if first and (stage_idx > 0 or self.stem == "face"):
                    strides = (2, 2)
                else:
                    strides = (1, 1)
                block = block_cls(
                    features=features,
                    strides=strides,
                    groups=self.groups,
                    se_reduction=self.se_reduction,
                    expansion=self.expansion,
                    dtype=self.dtype,
                    quantized=self.quantized,
                    name=f"BottleneckBlock_{block_counter}",
                )
                if record_carry:
                    stat = self.variable(
                        "quant_stats", f"block_{block_counter}_in_max",
                        lambda: jnp.zeros((), jnp.float32))
                    stat.value = jnp.maximum(
                        stat.value,
                        jnp.max(jnp.abs(x.astype(jnp.float32))))
                    x = block(x, train)
                elif qat_carry:
                    from tf_face_toolbox_tpu.models.layers import (
                        fake_quant_ste)
                    xf = x.astype(jnp.float32)
                    xs = jnp.maximum(
                        jnp.max(jnp.abs(jax.lax.stop_gradient(xf)))
                        / 127.0, 1e-12)
                    x = block(fake_quant_ste(xf, xs).astype(self.dtype),
                              train)
                elif carry_int8:
                    key = f"block_{block_counter}_in_max"
                    if not self.has_variable("quant_stats", key):
                        raise ValueError(
                            "quantized='static' needs calibrated "
                            "quant_stats; run "
                            "models.calibrate_quant_stats(...) first")
                    in_scale = jnp.maximum(
                        self.get_variable("quant_stats", key),
                        1e-12) / 127.0
                    xq = jnp.clip(
                        jnp.round(x.astype(jnp.float32) / in_scale),
                        -127, 127).astype(jnp.int8)
                    x = block(None, train, prequant=(xq, in_scale))
                else:
                    x = block(x, train)
                block_counter += 1

        return EmbeddingHead(
            embedding_dim=self.embedding_dim,
            variant=self.head_variant,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
        )(x, train)
