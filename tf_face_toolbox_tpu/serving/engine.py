"""Serving engine: BN-folded ResNet-family forward with fused blocks.

``build_plan`` digests a checkpoint tree (the SAME variables the flax
model trains/serves with — nothing is re-exported) into folded conv
weights; ``make_serving_apply`` returns a drop-in replacement for
``net.apply(variables, x, train=False)`` that runs:

- stem / strided stage-entry blocks / SE blocks / head on XLA (folded
  convs — XLA's conv tilings are unbeatable where spatial reduction
  keeps the op compute-bound), and
- every run of stride-1 bottleneck blocks as ONE fused Pallas kernel
  (fused_block.py) when it fits VMEM — the bandwidth-bound part.

Scope: the ResNet family (resnet/se_resnet; groups=1, fp serving).
ResNeXt's grouped 3x3 and DenseNet's concat topology keep their
(already fast) XLA path via net.apply; int8 serving likewise
(models/layers.py) — the engine refuses rather than silently diverging.

Parity: tests/test_serving.py asserts embedding equality vs net.apply
within bf16 rounding (the fold itself is exact in f32).

Reference: the deployment-time counterpart of upstream features.py's
restore-and-run [UPSTREAM-K], redesigned around the TPU memory
hierarchy (SURVEY.md §2b "fused kernels" row).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tf_face_toolbox_tpu.serving.fold import (
    FoldedConv,
    fold_conv_bn,
    fold_dense_bn,
)
from tf_face_toolbox_tpu.serving import fused_block


@dataclass(frozen=True)
class SEWeights:
    """SqueezeExcite Dense pair (eval math has no BN to fold)."""

    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array

    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = jax.nn.relu(jnp.dot(s, self.w1) + self.b1)
        s = jax.nn.sigmoid(jnp.dot(s, self.w2) + self.b2)
        return x * s


@dataclass(frozen=True)
class BlockPlan:
    conv1: FoldedConv
    conv2: FoldedConv
    conv3: FoldedConv
    proj: FoldedConv | None
    se: SEWeights | None

    @property
    def stride1(self) -> bool:
        return self.conv2.strides == (1, 1)

    def apply_xla(self, x: jax.Array) -> jax.Array:
        y = self.conv3(self.conv2(self.conv1(x)))
        if self.se is not None:
            y = self.se(y)
        residual = self.proj(x) if self.proj is not None else x
        return jax.nn.relu(residual + y)


@dataclass(frozen=True)
class ServingPlan:
    stem_kind: str
    stem: FoldedConv
    stages: tuple[tuple[BlockPlan, ...], ...]
    head_variant: str
    head_dense: tuple[jax.Array, jax.Array]       # folded (W, b)
    head_prebn: tuple[jax.Array, jax.Array] | None  # flatten variant
    compute_dtype: Any = jnp.bfloat16


def _fold_block(params: Any, stats: Any, *, strides, dtype) -> BlockPlan:
    proj = None
    if "ConvBN_3" in params:
        proj = fold_conv_bn(params["ConvBN_3"], stats["ConvBN_3"],
                            strides=strides, relu=False, dtype=dtype)
    se = None
    if "SqueezeExcite_0" in params:
        sep = params["SqueezeExcite_0"]
        se = SEWeights(
            w1=jnp.asarray(sep["Dense_0"]["kernel"], dtype),
            b1=jnp.asarray(sep["Dense_0"]["bias"], dtype),
            w2=jnp.asarray(sep["Dense_1"]["kernel"], dtype),
            b2=jnp.asarray(sep["Dense_1"]["bias"], dtype),
        )
    return BlockPlan(
        conv1=fold_conv_bn(params["ConvBN_0"], stats["ConvBN_0"],
                           dtype=dtype),
        conv2=fold_conv_bn(params["ConvBN_1"], stats["ConvBN_1"],
                           strides=strides, dtype=dtype),
        conv3=fold_conv_bn(params["ConvBN_2"], stats["ConvBN_2"],
                           relu=False, dtype=dtype),
        proj=proj,
        se=se,
    )


def build_plan(net, variables: Any) -> ServingPlan:
    """Fold a ResNet-family checkpoint into a ServingPlan.

    ``net`` is the flax module the checkpoint belongs to (its static
    config — stage sizes, stem, head — drives the plan); ``variables``
    is the {params, batch_stats} tree.
    """
    from tf_face_toolbox_tpu.models.resnet import ResNet

    if not isinstance(net, ResNet):
        raise ValueError(
            f"serving engine supports the ResNet family, got "
            f"{type(net).__name__}; use net.apply for this model")
    if net.groups != 1:
        raise ValueError("serving engine does not support grouped convs "
                         "(ResNeXt); use net.apply")
    if net.stem == "dct":
        raise ValueError(
            "serving engine does not fold the dct stem (frequency BN + "
            "1x1 + depth2space); use net.apply — the dct net's bf16 "
            "flax path is the measured 11.9k faces/sec config")
    if net.quantized:
        raise ValueError("int8 serving runs via net.apply "
                         "(models/layers.py); the engine serves fp")
    dtype = net.dtype
    params = variables["params"]
    stats = variables["batch_stats"]

    stem = fold_conv_bn(
        params["ConvBN_0"], stats["ConvBN_0"],
        strides=(2, 2) if net.stem == "imagenet" else (1, 1), dtype=dtype)

    stages = []
    counter = 0
    for stage_idx, num_blocks in enumerate(net.stage_sizes):
        blocks = []
        for block_idx in range(num_blocks):
            first = block_idx == 0
            if first and (stage_idx > 0 or net.stem == "face"):
                strides = (2, 2)
            else:
                strides = (1, 1)
            name = f"BottleneckBlock_{counter}"
            blocks.append(_fold_block(params[name], stats[name],
                                      strides=strides, dtype=dtype))
            counter += 1
        stages.append(tuple(blocks))

    head = params["EmbeddingHead_0"]
    head_s = stats["EmbeddingHead_0"]
    prebn = None
    if net.head_variant == "flatten":
        # eval BN on the pre-flatten map folds to a per-channel affine
        bnp, bns = head["BatchNorm_0"], head_s["BatchNorm_0"]
        r = (jnp.asarray(bnp["scale"], jnp.float32)
             * jax.lax.rsqrt(jnp.asarray(bns["var"], jnp.float32) + 1e-5))
        prebn = (r.astype(dtype),
                 (jnp.asarray(bnp["bias"], jnp.float32)
                  - jnp.asarray(bns["mean"], jnp.float32) * r).astype(dtype))
        final_bn_p, final_bn_s = head["BatchNorm_1"], head_s["BatchNorm_1"]
    else:
        final_bn_p, final_bn_s = head["BatchNorm_0"], head_s["BatchNorm_0"]
    head_dense = fold_dense_bn(head["Dense_0"], final_bn_p, final_bn_s,
                               dtype=dtype)

    return ServingPlan(
        stem_kind=net.stem,
        stem=stem,
        stages=tuple(stages),
        head_variant=net.head_variant,
        head_dense=head_dense,
        head_prebn=prebn,
        compute_dtype=dtype,
    )


def _fused_operands(block: BlockPlan, with_proj: bool) -> dict:
    """Folded BlockPlan -> the fused kernel's tensor dict (unstacked)."""
    b = block.conv1.kernel.shape[-1]
    d = {
        "w1": block.conv1.kernel.reshape(-1, b),
        "b1": block.conv1.bias.reshape(1, -1),
        "w2": block.conv2.kernel.reshape(9 * b, b),
        "b2": block.conv2.bias.reshape(1, -1),
        "w3": block.conv3.kernel.reshape(b, -1),
        "b3": block.conv3.bias.reshape(1, -1),
    }
    if with_proj:
        d["wp"] = block.proj.kernel.reshape(block.proj.kernel.shape[-2],
                                            block.proj.kernel.shape[-1])
        d["bp"] = block.proj.bias.reshape(1, -1)
    return d


def _plan_stage_fusion(blocks: Sequence[BlockPlan]) -> tuple:
    """Split a stage into [xla prefix][one fused segment][xla suffix].

    Returns (n_xla_prefix, entry_dict | None, tail_dict | None). The
    fused segment is the maximal run ending at the stage's last block:
    an optional stride-1 entry (projection) block plus the identity
    blocks. SE blocks and strided blocks stay on XLA.
    """
    if any(blk.se is not None for blk in blocks):
        return len(blocks), None, None
    entry = None
    start = 0
    if blocks[0].proj is not None and blocks[0].stride1:
        entry = _fused_operands(blocks[0], with_proj=True)
        start = 1
    elif blocks[0].proj is not None:
        start = 1     # strided entry: XLA
    tail_blocks = [blk for blk in blocks[start:]
                   if blk.proj is None and blk.stride1]
    if len(tail_blocks) != len(blocks) - start:
        # mid-stage projection/stride (never happens in this zoo):
        # don't fuse across it
        return len(blocks), None, None
    tail = None
    if tail_blocks:
        per = [_fused_operands(blk, with_proj=False) for blk in tail_blocks]
        tail = {name + "s": jnp.stack([p[name] for p in per])
                for name in ("w1", "b1", "w2", "b2", "w3", "b3")}
    if entry is None and tail is None:
        return len(blocks), None, None
    return start if entry is None else 0, entry, tail


def make_serving_apply(net, variables: Any, *, use_pallas: bool = False,
                       interpret: bool = False) -> Callable:
    """Build ``apply(variables_ignored, images) -> (N, D) f32 embeddings``.

    The returned callable has the flax ``net.apply(variables, x)``
    calling convention (variables are pre-folded and baked in; the
    first argument is accepted and ignored) so extract.py's
    ``flip_averaged_embeddings`` and the CLIs can swap it in directly.

    The default (``use_pallas=False``) is the folded pure-XLA engine —
    the fastest measured path on v5e. ``use_pallas=True`` additionally
    fuses stride-1 block runs into single Pallas kernels; measured
    slower than XLA here (docs/design.md "fused-block" paragraph), kept
    as an option and to separate the BN-fold win from the fusion win in
    benchmarks.
    """
    plan = build_plan(net, variables)
    cdtype = plan.compute_dtype

    fusion = [_plan_stage_fusion(blocks) for blocks in plan.stages] \
        if use_pallas else [(len(b), None, None) for b in plan.stages]

    def apply_fn(_variables, images, train: bool = False):
        assert not train, "serving engine is inference-only"
        x = images.astype(cdtype)
        if plan.stem_kind == "space2depth":
            n, h, w, c = x.shape
            x = x.reshape(n, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                n, h // 2, w // 2, 4 * c)
        x = plan.stem(x)
        if plan.stem_kind == "imagenet":
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        for blocks, (n_xla, entry, tail) in zip(plan.stages, fusion):
            for blk in blocks[:n_xla]:
                x = blk.apply_xla(x)
            if entry is None and tail is None:
                continue
            if tail is not None:
                k, b = tail["w1s"].shape[0], tail["w1s"].shape[-1]
                c = tail["w3s"].shape[-1]
            else:
                k, b, c = 0, entry["w1"].shape[-1], entry["w3"].shape[-1]
            g = fused_block.pick_images_per_step(
                x.shape[0], x.shape[1] * x.shape[2], x.shape[-1], c, b,
                k, jnp.dtype(x.dtype).itemsize)
            if g:
                x = fused_block.fused_bottleneck_stack(
                    x, entry, tail, h=x.shape[1], w=x.shape[2],
                    images_per_step=g, interpret=interpret)
            else:  # working set exceeds VMEM: XLA for this segment
                for blk in blocks[n_xla:]:
                    x = blk.apply_xla(x)

        if plan.head_variant == "flatten":
            r, c = plan.head_prebn
            x = x * r + c
            x = x.reshape(x.shape[0], -1)
        else:
            x = jnp.mean(x, axis=(1, 2))
        w, b = plan.head_dense
        emb = jnp.dot(x.astype(cdtype), w,
                      preferred_element_type=jnp.float32)
        return emb + b

    return apply_fn
