"""Face alignment: 5-landmark similarity transform to the canonical crop.

The reference consumed pre-aligned face crops and left alignment to an
external (MTCNN-era) pipeline [UPSTREAM-K, SURVEY.md §8 "aligned crop"].
Production enrollment needs the step in-toolbox: given the standard
5 facial landmarks (eye centers, nose tip, mouth corners), estimate the
least-squares similarity transform onto the ArcFace 112×112 template
(Umeyama 1991 — the same closed form skimage.transform.SimilarityTransform
uses and the InsightFace ecosystem standardized on) and warp.

Two warp implementations with identical semantics (tested equal):
- :func:`warp_similarity` — vectorized numpy, the pack-time host path
  (cli.pack --landmarks aligns while packing);
- :func:`warp_similarity_jax` — jitted map_coordinates gather for
  on-device use (e.g. aligning inside a serving pipeline).

Both sample bilinearly and fill outside the source with 0, matching
cv2.warpAffine's defaults (the ecosystem's reference behavior).
"""

from __future__ import annotations

import numpy as np

# The canonical ArcFace/InsightFace 5-point destination template for a
# 112x112 crop: [left eye, right eye, nose, left mouth, right mouth]
# in (x, y) pixel coordinates.
ARCFACE_TEMPLATE_112 = np.array(
    [[38.2946, 51.6963],
     [73.5318, 51.5014],
     [56.0252, 71.7366],
     [41.5493, 92.3655],
     [70.7299, 92.2041]], np.float64)


def umeyama(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform src → dst (Umeyama 1991).

    src, dst: (K, 2) point sets in (x, y). Returns the (2, 3) matrix M
    with ``dst ≈ M @ [x, y, 1]ᵀ`` (rotation+uniform scale+translation;
    reflections are excluded via the determinant correction).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    if src.shape != dst.shape or src.ndim != 2 or src.shape[1] != 2:
        raise ValueError(f"point sets must both be (K, 2); got "
                         f"{src.shape} vs {dst.shape}")
    k = src.shape[0]
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / k
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u) * np.linalg.det(vt)) or 1.0
    diag = np.array([1.0, d])
    rot = u @ np.diag(diag) @ vt
    var_s = (sc ** 2).sum() / k
    if var_s == 0:
        raise ValueError("degenerate source landmarks (zero variance)")
    scale = (s * diag).sum() / var_s
    t = mu_d - scale * rot @ mu_s
    return np.hstack([scale * rot, t[:, None]])


def _invert_affine(m: np.ndarray) -> np.ndarray:
    """(2,3) affine → its (2,3) inverse."""
    a = np.vstack([m, [0.0, 0.0, 1.0]])
    return np.linalg.inv(a)[:2]


def warp_similarity(image: np.ndarray, matrix: np.ndarray,
                    out_h: int, out_w: int) -> np.ndarray:
    """Warp ``image`` (H, W, C) uint8 by the src→dst ``matrix`` (2, 3);
    output (out_h, out_w, C) uint8. Bilinear, zero fill outside."""
    image = np.asarray(image)
    h, w = image.shape[:2]
    inv = _invert_affine(np.asarray(matrix, np.float64))
    ys, xs = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx, fy = sx - x0, sy - y0
    out = np.zeros((out_h, out_w) + image.shape[2:], np.float64)
    img = image.astype(np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            xi, yi = x0 + dx, y0 + dy
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                   * valid)
            tap = img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
            out += tap * wgt[..., None]
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def warp_similarity_jax(image, matrix: np.ndarray,
                        out_h: int, out_w: int):
    """On-device twin of :func:`warp_similarity` (same math, jax
    map_coordinates order-1 gather; outside fill 0). ``matrix`` is a
    host-side constant — alignment geometry is per-image metadata, not
    a traced value."""
    import jax.numpy as jnp
    from jax.scipy.ndimage import map_coordinates

    inv = _invert_affine(np.asarray(matrix, np.float64))
    ys, xs = np.mgrid[0:out_h, 0:out_w].astype(np.float32)
    sx = jnp.asarray(inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2])
    sy = jnp.asarray(inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2])
    img = jnp.asarray(image).astype(jnp.float32)
    chans = [map_coordinates(img[..., c], [sy, sx], order=1, cval=0.0)
             for c in range(img.shape[-1])]
    out = jnp.stack(chans, axis=-1)
    return jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)


def align_face(image: np.ndarray, landmarks: np.ndarray,
               size: int = 112) -> np.ndarray:
    """Align a face to the ArcFace template, scaled to ``size``².

    ``landmarks``: (5, 2) (x, y) points — left eye, right eye, nose,
    left mouth corner, right mouth corner — in ``image`` coordinates.
    """
    landmarks = np.asarray(landmarks, np.float64)
    if landmarks.shape != (5, 2):
        raise ValueError(f"landmarks must be (5, 2) (x, y); got "
                         f"{landmarks.shape}")
    template = ARCFACE_TEMPLATE_112 * (size / 112.0)
    m = umeyama(landmarks, template)
    return warp_similarity(image, m, size, size)
