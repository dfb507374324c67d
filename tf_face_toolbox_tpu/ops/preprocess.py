"""On-device preprocessing chain: crop → resize → flip → standardize.

Rebuilds the reference's tf.image pipeline (ref: upstream data/
preprocessing [UPSTREAM-K]; exact oracle semantics verified against the
installed TF source in SURVEY.md §8):

- ``per_image_standardization``: (x - mean) / max(std, rsqrt(H*W*C)) —
  the rsqrt(N) floor is the detail naive ports miss
  (tensorflow/python/ops/image_ops_impl.py:1964 in TF 2.21).
- ``random_flip_left_right``: per-image Bernoulli(0.5) on the width axis
  (image_ops_impl.py:384).
- resize: bilinear with half-pixel centers (TF v2 / jax.image default).
- crops: aligned face crops → random offset (train) / center (eval) via
  ``lax.dynamic_slice`` — static output shapes, jit-friendly.

TPU-first design decisions:

- **Resize as two matmuls.** Separable bilinear interpolation is a
  linear map per axis, so resize(H→H') is ``R_h @ img`` and W→W' is
  ``img @ R_w^T`` — dense (H',H)/(W',W) matrices precomputed once at
  trace time. On TPU this runs on the MXU instead of the VPU gather
  path, and XLA fuses the u8→f32 cast into the first matmul. For
  112-class face crops the matrices are tiny and live in VMEM.
- Everything is batched (N,H,W,C) with static shapes; per-image
  randomness comes in as explicit arrays (flip mask, crop offsets) so
  the whole chain jits and vmaps cleanly and is reproducible from a
  single PRNG key.
- A fused Pallas kernel for the flip+standardize tail lives in
  ``pallas_preprocess.py``; this module is the pure-XLA reference
  implementation and the fallback on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# standardize / flip
# ---------------------------------------------------------------------------

def per_image_standardization(images: jax.Array) -> jax.Array:
    """tf.image.per_image_standardization, batched over axis 0.

    (x - mean) / adjusted_std with adjusted_std = max(std, 1/sqrt(N)),
    N = H*W*C. Matches TF 2.21 image_ops_impl.py:2009-2021 exactly
    (SURVEY.md §8).
    """
    x = images.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    n = float(np.prod(x.shape[1:]))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    # TF uses reduce_std (population std, ddof=0).
    std = jnp.sqrt(jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True))
    adjusted = jnp.maximum(std, 1.0 / np.sqrt(n))
    return (x - mean) / adjusted


def fixed_standardization(images: jax.Array) -> jax.Array:
    """InsightFace/arcface_torch input normalization:
    ``(x/255 - 0.5) / 0.5 = (x - 127.5) / 127.5``.

    Checkpoints imported from the torch face ecosystem
    (cli.import_torch / models.iresnet) were trained with this fixed
    affine, NOT the reference's per-image standardization — serving
    them through the wrong one silently destroys their accuracy.
    Select with ``norm="fixed"`` (extraction) / ``--input_norm=fixed``.
    """
    return (images.astype(jnp.float32) - 127.5) / 127.5


def standardize(images: jax.Array, norm: str = "per_image") -> jax.Array:
    """Dispatch on the standardization convention (see each fn)."""
    if norm == "per_image":
        return per_image_standardization(images)
    if norm == "fixed":
        return fixed_standardization(images)
    raise ValueError(f"unknown norm {norm!r}; want per_image|fixed")


def flip_left_right(images: jax.Array) -> jax.Array:
    """Deterministic horizontal flip (width axis of NHWC)."""
    return images[:, :, ::-1, :]


def random_flip_left_right(key: jax.Array, images: jax.Array) -> jax.Array:
    """Per-image Bernoulli(0.5) horizontal flip (tf.image semantics)."""
    mask = jax.random.bernoulli(key, 0.5, (images.shape[0], 1, 1, 1))
    return jnp.where(mask, images[:, :, ::-1, :], images)


def apply_flip_mask(images: jax.Array, mask: jax.Array) -> jax.Array:
    """Flip images[i] where mask[i] — randomness passed in explicitly."""
    m = mask.reshape((-1, 1, 1, 1))
    return jnp.where(m, images[:, :, ::-1, :], images)


# ---------------------------------------------------------------------------
# resize as matmul
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _bilinear_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) dense bilinear interpolation matrix, half-pixel centers.

    Row o holds the two taps for output coordinate (o+0.5)*in/out - 0.5,
    clamped at the borders — identical sampling to TF v2 bilinear
    (antialias=False) and jax.image.resize when out<=in is a mild ratio.
    """
    m = np.zeros((out_size, in_size), np.float32)
    if out_size == in_size:
        np.fill_diagonal(m, 1.0)
        return m
    scale = in_size / out_size
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        lo_c = min(max(lo, 0), in_size - 1)
        hi_c = min(max(lo + 1, 0), in_size - 1)
        m[o, lo_c] += 1.0 - frac
        m[o, hi_c] += frac
    return m


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear(images: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Batched bilinear resize as two MXU matmuls (see module docstring).

    images: (N, H, W, C) any float/int dtype → (N, out_h, out_w, C) f32.
    """
    n, h, w, c = images.shape
    rh = jnp.asarray(_bilinear_matrix(out_h, h))     # (H', H)
    rw = jnp.asarray(_bilinear_matrix(out_w, w))     # (W', W)
    x = images.astype(jnp.float32)
    # (N,H,W,C): contract H with rh → (N,H',W,C), then W with rw.
    x = jnp.einsum("oh,nhwc->nowc", rh, x)
    x = jnp.einsum("pw,nowc->nopc", rw, x)
    return x


# ---------------------------------------------------------------------------
# crops
# ---------------------------------------------------------------------------

def crop_at(images: jax.Array, offsets: jax.Array,
            crop_h: int, crop_w: int) -> jax.Array:
    """Batched crop at per-image (y, x) offsets via dynamic_slice.

    offsets: (N, 2) int32. Static output shape (N, crop_h, crop_w, C).
    """
    def one(img, off):
        return jax.lax.dynamic_slice(
            img, (off[0], off[1], 0), (crop_h, crop_w, img.shape[-1]))
    return jax.vmap(one)(images, offsets)


def center_offsets(batch: int, in_h: int, in_w: int,
                   crop_h: int, crop_w: int) -> jax.Array:
    off = jnp.array([(in_h - crop_h) // 2, (in_w - crop_w) // 2], jnp.int32)
    return jnp.broadcast_to(off, (batch, 2))


def random_offsets(key: jax.Array, batch: int, in_h: int, in_w: int,
                   crop_h: int, crop_w: int) -> jax.Array:
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (batch,), 0, in_h - crop_h + 1)
    xs = jax.random.randint(kx, (batch,), 0, in_w - crop_w + 1)
    return jnp.stack([ys, xs], axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# full chains (train / eval), jit-compiled
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def preprocess_train(key: jax.Array, images_u8: jax.Array,
                     crop_h: int, crop_w: int,
                     norm: str = "per_image") -> jax.Array:
    """Training chain: random crop → random flip → standardize.

    images_u8: (N, H, W, C) uint8 decoded aligned face images.
    Matches the reference's train-time tf.image chain [TF1-IDIOM]
    with resize folded away when the crop already has target size.

    ``norm``: "per_image" (reference) or "fixed" — fine-tuning an
    imported fixed-norm checkpoint (cli.import_torch) must train with
    the SAME normalization it serves with.
    """
    n, h, w, _ = images_u8.shape
    kc, kf = jax.random.split(key)
    offs = random_offsets(kc, n, h, w, crop_h, crop_w)
    x = crop_at(images_u8, offs, crop_h, crop_w)
    x = x.astype(jnp.float32)
    x = random_flip_left_right(kf, x)
    return standardize(x, norm)


def random_erase(key: jax.Array, images: jax.Array,
                 prob: float = 0.5,
                 area: tuple[float, float] = (0.02, 0.33),
                 aspect: float = 0.3) -> jax.Array:
    """Random erasing (Zhong et al., AAAI 2020) — occlusion-robustness
    augmentation: with probability ``prob`` per image, a rectangle with
    area fraction ~U(area) and aspect ratio ~exp(U(log a, log 1/a)) is
    replaced by unit-gaussian noise (the paper's RE-R variant — apply
    AFTER standardization so the fill matches the input statistics).

    TPU-native formulation: the rectangle is a broadcasted-iota
    comparison mask, so shapes stay static and the whole op fuses into
    the augment chain — no dynamic_update_slice, no host RNG.
    """
    n, h, w, c = images.shape
    k_on, k_area, k_asp, k_top, k_left, k_fill = jax.random.split(key, 6)
    active = jax.random.bernoulli(k_on, prob, (n,))
    frac = jax.random.uniform(k_area, (n,), minval=area[0],
                              maxval=area[1])
    log_a = jax.random.uniform(k_asp, (n,),
                               minval=jnp.log(aspect),
                               maxval=-jnp.log(aspect))
    a = jnp.exp(log_a)
    target = frac * h * w
    eh = jnp.clip(jnp.round(jnp.sqrt(target * a)), 1, h)
    ew = jnp.clip(jnp.round(jnp.sqrt(target / a)), 1, w)
    top = jnp.floor(jax.random.uniform(k_top, (n,)) * (h - eh + 1))
    left = jnp.floor(jax.random.uniform(k_left, (n,)) * (w - ew + 1))
    rows = jax.lax.broadcasted_iota(jnp.float32, (1, h, 1, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, 1, w, 1), 2)
    rsel = (rows >= top[:, None, None, None]) & (
        rows < (top + eh)[:, None, None, None])
    csel = (cols >= left[:, None, None, None]) & (
        cols < (left + ew)[:, None, None, None])
    mask = rsel & csel & active[:, None, None, None]
    fill = jax.random.normal(k_fill, images.shape, jnp.float32)
    return jnp.where(mask, fill.astype(images.dtype), images)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def preprocess_eval(images_u8: jax.Array, crop_h: int, crop_w: int,
                    norm: str = "per_image") -> jax.Array:
    """Eval chain: center crop → standardize (no flip) [TF1-IDIOM].

    ``norm``: "per_image" (the reference's tf.image chain) or "fixed"
    ((x-127.5)/127.5 — imported InsightFace-ecosystem checkpoints).
    """
    n, h, w, _ = images_u8.shape
    offs = center_offsets(n, h, w, crop_h, crop_w)
    x = crop_at(images_u8, offs, crop_h, crop_w)
    return standardize(x.astype(jnp.float32), norm)


@functools.partial(jax.jit, static_argnums=(1, 2))
def preprocess_eval_resize(images_u8: jax.Array,
                           out_h: int, out_w: int) -> jax.Array:
    """Eval chain for mismatched input sizes: resize → standardize."""
    x = resize_bilinear(images_u8, out_h, out_w)
    return per_image_standardization(x)
