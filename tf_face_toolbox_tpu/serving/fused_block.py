"""Pallas kernel: a stack of bottleneck blocks fused in VMEM.

Why: extraction is HBM-bandwidth-bound (docs/design.md roofline). XLA
materializes every conv output of every residual block in HBM — for a
stage-0 block at 56x56 that is ~6x more traffic than the information
that actually has to cross the HBM boundary (the block input and the
block output). This kernel runs a whole run of stride-1 bottleneck
blocks per grid step with every intermediate resident in VMEM:

    HBM ──x(G,HW,C)──► VMEM                       [one read]
        repeat per block k (statically unrolled):
          y1 = relu(x @ W1k + b1k)                1x1 reduce    (MXU)
          y2 = relu(conv3x3(y1, W2k) + b2k)       9 tap-GEMMs   (MXU)
          y3 = y2 @ W3k + b3k                     1x1 expand    (MXU)
          x  = relu(y3 + x)                       residual add  (VPU)
    VMEM ──x──► HBM                               [one write]

The 3x3 conv runs as nine shift-and-accumulate (G·HW, B) x (B, B)
matmuls over the zero-padded map (see _conv3x3_same for why not one
im2col GEMM).

An optional ENTRY block with a projection shortcut (the first block of
a stage when its stride is 1, e.g. every imagenet-stem stage 0) fuses
into the same kernel: proj = x @ Wp + bp replaces the identity carry.

Batch-norm is already folded into (W, b) by serving/fold.py. Inference
only — no VJP (the training step stays on the XLA path, whose backward
is the bandwidth-bound part no inference kernel helps).

Numerics match the XLA path: every matmul accumulates f32 on the MXU
(preferred_element_type), intermediates round to the compute dtype, the
residual add happens in f32.

No reference equivalent (the reference leaves fusion to cuDNN/TF
[UPSTREAM-K]); this is the TPU-native answer to the same need.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Working-set budget per grid step. Conservative vs the chip's VMEM so
# Pallas' double-buffered per-grid-step DMAs and Mosaic temporaries fit;
# tuned empirically on v5e (see docs/design.md serving-engine section).
_VMEM_BUDGET = 14 * 1024 * 1024
# What we tell Mosaic it may use (v5e has more VMEM than the default
# 32 MB compiler cap assumes for tiles + our whole-image blocks).
_VMEM_LIMIT = 64 * 1024 * 1024


# 3x3 strategy: "slice" = zero-pad then 9 slice+reshape taps (DEFAULT:
# compiles everywhere; measured equal to the shift-free "mm" ceiling,
# i.e. Mosaic feeds offset slices to the MXU at zero extra cost);
# "roll" = flattened-row rotations + boundary masks (needs 32-bit data:
# Mosaic has no bf16 rotate — kept for f32 experiments); "mm" =
# UNSHIFTED taps — wrong numerics, kept only as the pure-MXU ceiling
# probe for tools/stage_bench.py. NOTE: module-level knob read at trace
# time; set it before the first fused_bottleneck_stack call.
CONV3X3_MODE = "slice"


def _conv3x3_same(y2d: jax.Array, w2, g: int, h: int, w: int) -> jax.Array:
    """SAME 3x3 conv with (9B, Bout) weights -> f32 (G·HW, Bout).

    ``y2d`` is the activation already flattened to (G·H·W, B), image-
    major. Weight rows are grouped by tap: rows [(dy*3+dx)*B, ...+B)
    multiply input(y+dy-1, x+dx-1, :) — the HWIO kernel flattened over
    (H, W, I).

    Nine shift-and-accumulate matmuls instead of one im2col GEMM:
    Mosaic cannot concatenate vectors whose sublane offsets differ, and
    the 9-tap form needs no (HW, 9B) patch buffer in VMEM — which is
    what lets stage-0-sized blocks (56² maps) fit on-chip. In "roll"
    mode each tap's shifted operand is a row rotation of the SAME
    flattened 2D buffer (input pixel (y+dy-1, x+dx-1) lives exactly
    (dy-1)*W + (dx-1) rows away), so the shift is one sublane rotation
    plus an iota mask for the rows that crossed an image/row boundary —
    no relayout copies.
    """
    m, b = y2d.shape
    acc = None
    for dy in range(3):
        for dx in range(3):
            wk = w2[(dy * 3 + dx) * b:(dy * 3 + dx + 1) * b, :]
            off = (dy - 1) * w + (dx - 1)
            if CONV3X3_MODE == "mm":
                sl = y2d
            elif CONV3X3_MODE == "roll":
                # rolled[r] = y2d[(r + off) mod m]; pltpu.roll wants a
                # non-negative shift
                sl = y2d if off == 0 else pltpu.roll(y2d, (-off) % m, 0)
                # zero rows whose source pixel fell outside the image
                r = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
                yy = jax.lax.rem(jax.lax.div(r, w), h) + (dy - 1)
                xx = jax.lax.rem(r, w) + (dx - 1)
                ok = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))
                sl = jnp.where(ok, sl, jnp.zeros_like(sl))
            else:  # "slice"
                y4 = y2d.reshape(g, h, w, b)
                p = jnp.pad(y4, ((0, 0), (1, 1), (1, 1), (0, 0)))
                sl = p[:, dy:dy + h, dx:dx + w, :].reshape(m, b)
            t = jnp.dot(sl, wk, preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc


def _bottleneck(x2d, h, w, g, w1, b1, w2, b2, w3, b3, cdtype):
    """One folded bottleneck main path: (G·HW, C) -> f32 (G·HW, Cout)."""
    y1 = jnp.dot(x2d, w1[:], preferred_element_type=jnp.float32)
    y1 = jax.nn.relu(y1 + b1[:]).astype(cdtype)
    y2 = _conv3x3_same(y1, w2[:], g, h, w)
    y2 = jax.nn.relu(y2 + b2[:]).astype(cdtype)
    y3 = jnp.dot(y2, w3[:], preferred_element_type=jnp.float32)
    return y3 + b3[:]


def _kernel(x_ref, *refs, h: int, w: int, k_blocks: int, has_entry: bool,
            cdtype):
    g = x_ref.shape[0]
    hw = h * w
    refs = list(refs)
    out_ref = refs.pop()
    x = x_ref[:]                                   # (G, HW, Cin)
    if has_entry:
        w1, b1, w2, b2, w3, b3, wp, bp = refs[:8]
        refs = refs[8:]
        x2d = x.reshape(g * hw, x.shape[-1]).astype(cdtype)
        y3 = _bottleneck(x2d, h, w, g, w1, b1, w2, b2, w3, b3, cdtype)
        proj = jnp.dot(x2d, wp[:], preferred_element_type=jnp.float32)
        # adds in compute dtype: matches the flax path, where both the
        # branch output and the shortcut are already rounded to cdtype
        x = jax.nn.relu(y3.astype(cdtype)
                        + (proj + bp[:]).astype(cdtype))
        x = x.reshape(g, hw, -1)
    if k_blocks:
        w1s, b1s, w2s, b2s, w3s, b3s = refs
        c = w3s.shape[-1]
        for k in range(k_blocks):                  # static unroll
            x2d = x.reshape(g * hw, c).astype(cdtype)
            y3 = _bottleneck(x2d, h, w, g, w1s[k], b1s[k], w2s[k],
                             b2s[k], w3s[k], b3s[k], cdtype)
            x = jax.nn.relu(y3.astype(cdtype) + x2d)
            x = x.reshape(g, hw, c)
    out_ref[:] = x.astype(out_ref.dtype)


def _vmem_bytes(g: int, hw: int, cin: int, c: int, b: int, k: int,
                itemsize: int) -> int:
    """Rough per-grid-step VMEM estimate (activations dominate)."""
    act = g * hw * (
        2 * cin * itemsize      # input block (x2: pipeline double-buffer)
        + 2 * c * itemsize      # output block (x2: double-buffer)
        + b * itemsize          # padded y1 + the current shifted slice
        + c * 4                 # f32 y3 accumulator
        + 2 * b * 4             # f32 conv3x3 accumulator + y1/y2 pre-cast
        + 2 * b * itemsize)     # rounded y1/y2
    wts = ((k + 1) * (c * b + 9 * b * b + b * c) * itemsize
           + cin * c * itemsize)
    return act + wts


def pick_images_per_step(n: int, hw: int, cin: int, c: int, b: int,
                         k: int, itemsize: int = 2) -> int:
    """Largest divisor of n (<=16) whose working set fits the budget."""
    for g in (16, 8, 4, 2, 1):
        if n % g == 0 and _vmem_bytes(g, hw, cin, c, b, k, itemsize) \
                <= _VMEM_BUDGET:
            return g
    return 0  # not even one image fits: caller falls back to XLA


@functools.partial(
    jax.jit, static_argnames=("h", "w", "images_per_step", "interpret"))
def fused_bottleneck_stack(x: jax.Array, entry, tail, *, h: int, w: int,
                           images_per_step: int = 0,
                           interpret: bool = False) -> jax.Array:
    """Run [entry?] + K stride-1 bottleneck blocks as one Pallas kernel.

    Args:
      x: (N, H, W, Cin) activations in the compute dtype (bf16/f32).
      entry: None, or the first block of a stage when its stride is 1 —
        a dict of folded tensors ``w1 (Cin,B), b1 (1,B) f32, w2 (9B,B),
        b2, w3 (B,C), b3 (1,C) f32, wp (Cin,C), bp (1,C) f32``.
      tail: None, or the stage's stride-1 identity blocks stacked on a
        leading K axis: ``w1s (K,C,B), b1s (K,1,B) f32, w2s (K,9B,B),
        b2s, w3s (K,B,C), b3s (K,1,C) f32``.
      h, w: spatial size (static; == x.shape[1:3]).
      images_per_step: grid granularity G (must divide N); 0 = pick.

    Returns (N, H, W, C) in x.dtype.
    """
    if entry is None and tail is None:
        raise ValueError("need at least one of entry/tail")
    n, xh, xw, cin = x.shape
    assert (xh, xw) == (h, w), (x.shape, h, w)
    hw = h * w
    cdtype = x.dtype
    if tail is not None:
        k_blocks = tail["w1s"].shape[0]
        c = tail["w3s"].shape[-1]
        b = tail["w1s"].shape[-1]
    else:
        k_blocks = 0
        c = entry["w3"].shape[-1]
        b = entry["w1"].shape[-1]
    g = images_per_step or pick_images_per_step(
        n, hw, cin, c, b, k_blocks, jnp.dtype(cdtype).itemsize)
    if g <= 0 or n % g:
        raise ValueError(
            f"no valid images_per_step for n={n} (got {g})")

    operands = []
    in_specs = []

    def add(arr, dtype=None):
        arr = jnp.asarray(arr, dtype) if dtype else arr
        operands.append(arr)
        in_specs.append(pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim,
            memory_space=pltpu.VMEM))

    if entry is not None:
        for name in ("w1", "b1", "w2", "b2", "w3", "b3", "wp", "bp"):
            add(entry[name],
                jnp.float32 if name.startswith("b") else cdtype)
    if tail is not None:
        for name in ("w1s", "b1s", "w2s", "b2s", "w3s", "b3s"):
            add(tail[name],
                jnp.float32 if name.startswith("b") else cdtype)

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, k_blocks=k_blocks,
                          has_entry=entry is not None, cdtype=cdtype),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, hw, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *in_specs,
        ],
        out_specs=pl.BlockSpec((g, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), cdtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x.reshape(n, hw, cin), *operands)
    return out.reshape(n, h, w, c)
