"""TPU-side JPEG completion: dequantize + IDCT + YCbCr→RGB.

The reference decoded JPEG entirely on the host inside TF's C++ input
ops (SURVEY.md §2b "decode_jpeg"). Hosts driving a TPU are usually
core-starved; entropy decode is inherently serial per image, but the
expensive back half of JPEG — inverse DCT and color conversion — is
dense linear algebra. So the native loader stops after entropy decode
(native/faceshard fs_dct_batch → quantized coefficients + quant
tables) and this module finishes the decode on the TPU:

- dequantize: one elementwise multiply (fuses into the IDCT matmuls)
- inverse DCT: 8x8 blocks, two small matmuls per block — batched as
  (N*bh*bw*3, 8, 8) einsum contractions that tile onto the MXU
- level shift + JFIF YCbCr→RGB affine + round/clip to uint8

The output feeds the existing fused preprocess chain unchanged, so
the model sees the same pixels (±1 LSB vs libjpeg's integer islow
IDCT — inside the golden-test tolerance budgeted in SURVEY.md §8 for
decoder variation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.cache
def _idct_matrix() -> np.ndarray:
    """8-point DCT-II basis A with A[u, y] = c(u) cos((2y+1)uπ/16):
    forward X = A x Aᵀ, inverse x = Aᵀ X A (A is orthonormal)."""
    u = np.arange(8)[:, None]
    y = np.arange(8)[None, :]
    a = np.cos((2 * y + 1) * u * np.pi / 16)
    a[0] *= 1.0 / np.sqrt(2)
    return (a * 0.5).astype(np.float32)


@jax.jit
def decode_dct(coef: jax.Array, qtab: jax.Array) -> jax.Array:
    """(N, bh, bw, 3, 64) int16 coefficients + (N, 3, 64) uint16 quant
    tables → (N, 8*bh, 8*bw, 3) uint8 RGB.

    Natural-order coefficients/tables as libjpeg stores them
    (faceshard.cc ReadDctCoefficients).
    """
    n, bh, bw = coef.shape[:3]
    c = coef.astype(jnp.float32) * qtab[:, None, None].astype(jnp.float32)
    blocks = c.reshape(n, bh, bw, 3, 8, 8)
    a = jnp.asarray(_idct_matrix())
    # x[y, x] = Σ_uv A[u, y] A[v, x] X[u, v]
    pix = jnp.einsum("uy,nhwcuv,vx->nhwcyx", a, blocks, a) + 128.0
    # libjpeg range-limits every component to [0, 255] BEFORE color
    # conversion; without this, IDCT overshoot at hard edges (ringing)
    # would diverge from its output by more than the ±2 LSB budget.
    pix = jnp.clip(pix, 0.0, 255.0)
    # (n, bh, bw, 3, 8, 8) → (n, 8bh, 8bw, 3)
    img = pix.transpose(0, 1, 4, 2, 5, 3).reshape(n, bh * 8, bw * 8, 3)
    y, cb, cr = img[..., 0], img[..., 1] - 128.0, img[..., 2] - 128.0
    rgb = jnp.stack([
        y + 1.402 * cr,
        y - 0.344136286 * cb - 0.714136286 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)
