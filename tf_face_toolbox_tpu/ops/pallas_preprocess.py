"""Fused Pallas input kernel: u8→f32 + resize + flip + standardize.

The BASELINE.json north-star input stage: "the tf.image preprocessing
chain ... fuses into a single Pallas/XLA input kernel". The pure-XLA
chain (ops/preprocess.py) needs several HBM round-trips (cast, resize
pair, flip select, two reduction passes for standardization). This
kernel does ONE HBM read and ONE write per image; everything between
happens in VMEM:

    HBM u8 (H_in, W_in*C) ──DMA──► VMEM
        cast f32
        y = R_h @ x @ R_wc          resize as two MXU matmuls; the
                                    width matrix acts on the W*C axis
                                    (block-diagonal per channel) and a
                                    flipped variant R_wc_f bakes the
                                    horizontal flip into the same GEMM
        per-image standardization   mean/var in VMEM registers,
                                    tf.image rsqrt(N)-floor semantics
    VMEM ──DMA──► HBM f32 (H_out, W_out*C)

Layout note (why W*C, not (W, C)): TPU tiles the last dim to 128 lanes.
A channels-last (..., 3) block would pad 3 → 128 (42x VMEM waste); the
flattened (H, W*3) layout wastes nothing and reshapes for free on the
XLA side. Flip must then permute *triples* along the W*C axis — exactly
what the R_wc_f matrix encodes, turning an awkward gather into MXU work.

Grid = one image per step; Pallas double-buffers the per-image DMAs
across grid steps automatically. The interpolation matrices are shared
operands resident in VMEM for the whole grid.

Gradients: none needed (input pipeline), so no custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tf_face_toolbox_tpu.ops.preprocess import _bilinear_matrix


def _width_channel_matrix(out_w: int, in_w: int, channels: int,
                          flip: bool) -> np.ndarray:
    """(in_w*C, out_w*C) bilinear matrix on the flattened W*C axis.

    Block structure: M[wi*C + c, wo*C + c] = bilinear(wi → wo), zero for
    mismatched channels. ``flip=True`` composes the horizontal flip
    (output column wo reads source column out_w-1-wo's taps).
    """
    base = _bilinear_matrix(out_w, in_w)          # (out_w, in_w)
    if flip:
        base = base[::-1, :]
    m = np.zeros((in_w * channels, out_w * channels), np.float32)
    for c in range(channels):
        m[c::channels, c::channels] = base.T
    return m


def _kernel(flip_ref, x_ref, rh_ref, rw_ref, rwf_ref, out_ref, *,
            num_pixels: float, out_dtype):
    x = x_ref[0]                                  # (H_in, W_in*C)
    if x.dtype == jnp.uint8:
        # Mosaic has no direct u8→f32 cast; hop through int32.
        x = x.astype(jnp.int32)
    x = x.astype(jnp.float32)
    rh = rh_ref[:]                                # (H_out, H_in)
    # Resize height then width(*C); both on the MXU.
    y = jnp.dot(rh, x, preferred_element_type=jnp.float32)
    rw = rw_ref[:]                                # (W_in*C, W_out*C)
    rwf = rwf_ref[:]
    # flip flags arrive via scalar prefetch: whole (N,) vector in SMEM.
    # Select the MATRIX (cheap VPU select) so the dominant width GEMM
    # runs once per image, not twice.
    flip = flip_ref[pl.program_id(0)] != 0
    rsel = jnp.where(flip, rwf, rw)
    y = jnp.dot(y, rsel, preferred_element_type=jnp.float32)
    # tf.image.per_image_standardization (SURVEY.md §8): the
    # rsqrt(num_pixels) floor on the std.
    mean = jnp.mean(y)
    var = jnp.mean(jnp.square(y - mean))
    adjusted = jnp.maximum(jnp.sqrt(var), 1.0 / np.sqrt(num_pixels))
    out_ref[0] = ((y - mean) / adjusted).astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_h", "out_w", "out_dtype",
                                    "interpret"))
def fused_preprocess(images: jax.Array, flip_mask: jax.Array, *,
                     out_h: int, out_w: int,
                     out_dtype=jnp.float32,
                     interpret: bool = False) -> jax.Array:
    """Fused resize→flip→standardize for a batch of images.

    Args:
      images: (N, H, W, C) uint8 (or any castable dtype) — aligned face
        crops (cropping itself is a dynamic_slice upstream).
      flip_mask: (N,) bool/int — per-image horizontal flip (all-zeros
        for the eval chain).
      out_h/out_w: output resolution.
      interpret: run the Pallas interpreter (CPU tests).

    Returns (N, out_h, out_w, C) standardized pixels in ``out_dtype``.
    """
    n, h, w, c = images.shape

    # VMEM budget guard: the two (W·C × W'·C) width matrices + the image
    # blocks must fit on-chip (~16 MB/core). For big frames (e.g. 512²+)
    # the matrices alone blow the budget — fall back to the pure-XLA
    # chain, which is numerically identical (tests/test_pallas_preprocess
    # asserts parity) and lets XLA tile HBM-resident matmuls.
    est_bytes = 4 * (h * w * c            # input block (f32 in VMEM)
                     + out_h * out_w * c  # output block
                     + out_h * h          # height matrix
                     + 2 * (w * c) * (out_w * c))
    if est_bytes > 12 * 1024 * 1024:
        from tf_face_toolbox_tpu.ops import preprocess as _pp
        x = _pp.resize_bilinear(images, out_h, out_w)
        x = _pp.apply_flip_mask(x, flip_mask.astype(bool))
        return _pp.per_image_standardization(x).astype(out_dtype)

    x = images.reshape(n, h, w * c)
    rh = jnp.asarray(_bilinear_matrix(out_h, h))
    rw = jnp.asarray(_width_channel_matrix(out_w, w, c, flip=False))
    rwf = jnp.asarray(_width_channel_matrix(out_w, w, c, flip=True))
    flips = flip_mask.astype(jnp.int32)

    grid = (n,)
    out = pl.pallas_call(
        functools.partial(_kernel, num_pixels=float(out_h * out_w * c),
                          out_dtype=out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, h, w * c), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((out_h, h), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w * c, out_w * c), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w * c, out_w * c), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, out_h, out_w * c),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w * c), out_dtype),
        interpret=interpret,
    )(flips, x, rh, rw, rwf)
    return out.reshape(n, out_h, out_w, c)


def fused_eval_preprocess(images: jax.Array, out_h: int, out_w: int,
                          **kw) -> jax.Array:
    """Eval chain: resize + standardize, no flip."""
    zeros = jnp.zeros((images.shape[0],), jnp.int32)
    return fused_preprocess(images, zeros, out_h=out_h, out_w=out_w, **kw)
