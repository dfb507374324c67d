"""Blockwise 8x8 DCT ops for the JPEG-domain backbone (stem="dct").

The accuracy-class stems pay for one thing above all: stage-0 work at
56² with MXU-hostile 64-channel convs (docs/design.md perf table — the
`face`/`space2depth` stems sit at ~7k faces/sec bf16 while the
28²-entry imagenet stem does 30k). The JPEG-domain CNN literature
(PAPERS.md: Gueguen et al. 2018 "Faster Neural Networks Straight from
JPEG"; Ehrlich & Davis 2018 "Deep Residual Learning in the JPEG
Transform Domain"; dos Santos 2021 "Less is More") shows the 8x8
blockwise DCT itself can replace the early high-resolution stages at
equal ImageNet accuracy: feed the 64 frequency channels per block and
let wide low-resolution stages do the rest.

This module provides the three pieces the backbone + serving paths
need, all expressed as batched 8x8 einsums the MXU eats for free:

- :func:`block_dct` — standardized pixels → per-channel orthonormal
  coefficient tensor (the stem's pixel-input path; exact linear
  re-layout, no information loss).
- :func:`prepare_coefficients` — dequantized JPEG (YCbCr) coefficient
  blocks → the SAME tensor, computed entirely in the frequency domain:
  color conversion is a per-frequency channel mix, per-image
  standardization uses Parseval (mean from the DC band, energy from
  the coefficient norm) so pixels are never materialized. This is the
  zero-decode serving path on top of the native entropy-only loader
  (ops/jpeg_tpu.py did dequant+IDCT+color to get pixels back; a DCT
  backbone needs none of that).
- :func:`flip_coefficients` — horizontal flip in the frequency domain
  (reverse block columns, negate odd horizontal frequencies) for
  flip-averaged extraction without leaving the domain.

Convention: the DCT basis is jpeg_tpu's orthonormal A (A @ A.T = I,
forward X = A x Aᵀ), so a constant-μ block has DC = 8μ and Parseval
holds exactly: Σ x² = Σ X².
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tf_face_toolbox_tpu.ops.jpeg_tpu import _idct_matrix

# JFIF YCbCr→RGB mixing matrix (rows: R,G,B over [Y, Cb, Cr]) — the
# same affine decode_dct applies per pixel, lifted to the frequency
# domain (linear, so it commutes with the per-channel DCT).
_YCC_TO_RGB = (
    (1.0, 0.0, 1.402),
    (1.0, -0.344136286, -0.714136286),
    (1.0, 1.772, 0.0),
)


def block_dct(x: jax.Array) -> jax.Array:
    """(N, H, W, C) float pixels → (N, H/8, W/8, C*64) coefficients.

    Per-channel orthonormal 8x8 blockwise DCT — an exact, invertible
    linear re-layout (Parseval: per-block energy is preserved). The
    last axis orders as (C, 8u, 8v) flattened: channel-major, then the
    8x8 frequency block row-major, matching prepare_coefficients.
    """
    n, h, w, c = x.shape
    if h % 8 or w % 8:
        raise ValueError(f"spatial dims must be multiples of 8, "
                         f"got {(h, w)}")
    a = jnp.asarray(_idct_matrix(), x.dtype)
    blocks = x.reshape(n, h // 8, 8, w // 8, 8, c)
    # X[u, v] = Σ_yx A[u, y] A[v, x] x[y, x]
    z = jnp.einsum("uy,nhywxc,vx->nhwcuv", a, blocks, a)
    return z.reshape(n, h // 8, w // 8, c * 64)


def block_idct(z: jax.Array, channels: int = 3) -> jax.Array:
    """Inverse of :func:`block_dct` (tests / debugging)."""
    n, bh, bw, _ = z.shape
    a = jnp.asarray(_idct_matrix(), z.dtype)
    blocks = z.reshape(n, bh, bw, channels, 8, 8)
    x = jnp.einsum("uy,nhwcuv,vx->nhywxc", a, blocks, a)
    return x.reshape(n, bh * 8, bw * 8, channels)


def standardize_coefficients(z: jax.Array) -> jax.Array:
    """Per-image standardization in the frequency domain.

    Exactly tf.image.per_image_standardization's math (SURVEY.md §8,
    including the rsqrt(N) stddev floor) applied to the pixels the
    coefficients represent — computed without materializing them:

    - pixel sum  = 8 · Σ DC   (constant-μ block ⇒ DC = 8μ)
    - pixel Σx²  = Σ z²       (Parseval, orthonormal basis)

    Standardizing pixels is an affine map, so on coefficients it is
    `(z − mean·8·δ_DC) / adjusted_std`: only the DC band shifts.
    """
    n, bh, bw, ck = z.shape
    c = ck // 64
    num_pix = bh * 8 * bw * 8 * c
    zf = z.astype(jnp.float32).reshape(n, bh, bw, c, 64)
    dc = zf[..., 0]
    mean = 8.0 * jnp.sum(dc, axis=(1, 2, 3)) / num_pix
    energy = jnp.sum(jnp.square(zf), axis=(1, 2, 3, 4)) / num_pix
    var = jnp.maximum(energy - jnp.square(mean), 0.0)
    adj = jnp.maximum(jnp.sqrt(var), jax.lax.rsqrt(float(num_pix)))
    shift = jnp.zeros((64,), jnp.float32).at[0].set(8.0)
    out = (zf - mean[:, None, None, None, None] * shift) \
        / adj[:, None, None, None, None]
    return out.reshape(n, bh, bw, ck)


@jax.jit
def prepare_coefficients(coef: jax.Array, qtab: jax.Array) -> jax.Array:
    """Dequantized-JPEG → standardized RGB coefficient input.

    (N, bh, bw, 3, 64) int16 natural-order YCbCr coefficients +
    (N, 3, 64) uint16 quant tables (the native loader's fs_dct_batch
    output, faceshard.cc ReadDctCoefficients) → (N, bh, bw, 192)
    float32, the same tensor :func:`block_dct` produces from the
    standardized decoded pixels — up to decode rounding: this path
    skips libjpeg's per-component range-limit and the final
    round-to-uint8 (both nonlinear), a sub-LSB difference absorbed by
    the cosine ≥0.999 parity budget (SURVEY.md §8 decoder-variation
    tolerance; gated in tests).

    Zero-decode serving: entropy decode on host, everything else is
    this one jitted elementwise+mix chain feeding the dct stem.
    """
    c = coef.astype(jnp.float32) * qtab[:, None, None].astype(jnp.float32)
    # JPEG stores level-shifted Y'CbCr: pixel = idct(c) + 128 for every
    # component; RGB = M·(idct(c)) + 128 (the ±128 chroma shifts cancel
    # — see jpeg_tpu.decode_dct). Lifted to coefficients:
    #   z_rgb = M · c   (per frequency)  +  128·8 on the DC band.
    m = jnp.asarray(_YCC_TO_RGB, jnp.float32)
    z = jnp.einsum("rc,nhwck->nhwrk", m, c)
    z = z.at[..., 0].add(128.0 * 8.0)
    n, bh, bw = z.shape[:3]
    return standardize_coefficients(z.reshape(n, bh, bw, 3 * 64))


def flip_coefficients(z: jax.Array) -> jax.Array:
    """Horizontal image flip, in the frequency domain.

    flip(x)[y, x'] = x[y, 7−x'] per block ⇒ reverse the block-column
    axis and negate odd horizontal frequencies (A[v, 7−x] =
    (−1)ᵛ A[v, x]). Exact — used for flip-averaged extraction on the
    zero-decode path.
    """
    n, bh, bw, ck = z.shape
    c = ck // 64
    sign = jnp.asarray([(-1.0) ** v for v in range(8)], z.dtype)
    zz = z[:, :, ::-1].reshape(n, bh, bw, c, 8, 8) * sign
    return zz.reshape(n, bh, bw, ck)
