"""Face alignment (ops/align): Umeyama estimator, warp semantics,
numpy↔jax warp parity, and pack-time alignment e2e."""

import numpy as np
import pytest

from tf_face_toolbox_tpu.ops.align import (
    ARCFACE_TEMPLATE_112,
    align_face,
    umeyama,
    warp_similarity,
    warp_similarity_jax,
)


def _similarity(scale, theta, tx, ty):
    c, s = scale * np.cos(theta), scale * np.sin(theta)
    return np.array([[c, -s, tx], [s, c, ty]], np.float64)


def _apply(m, pts):
    return pts @ m[:, :2].T + m[:, 2]


def test_umeyama_recovers_known_similarity():
    m_true = _similarity(1.37, 0.41, 12.0, -7.5)
    src = ARCFACE_TEMPLATE_112
    dst = _apply(m_true, src)
    m = umeyama(src, dst)
    np.testing.assert_allclose(m, m_true, atol=1e-9)
    # and the inverse direction maps dst back onto src
    m_inv = umeyama(dst, src)
    np.testing.assert_allclose(_apply(m_inv, dst), src, atol=1e-9)


def test_umeyama_least_squares_under_noise():
    rng = np.random.default_rng(0)
    m_true = _similarity(0.8, -0.2, 3.0, 4.0)
    src = ARCFACE_TEMPLATE_112
    dst = _apply(m_true, src) + 0.5 * rng.normal(size=src.shape)
    m = umeyama(src, dst)
    # residual of the LS fit must be <= residual of the true transform
    r_fit = np.sum((_apply(m, src) - dst) ** 2)
    r_true = np.sum((_apply(m_true, src) - dst) ** 2)
    assert r_fit <= r_true + 1e-9


def test_umeyama_rejects_reflection():
    src = ARCFACE_TEMPLATE_112
    dst = src * np.array([-1.0, 1.0])       # mirrored
    m = umeyama(src, dst)
    # determinant of the linear part must stay positive (rotation+scale)
    assert np.linalg.det(m[:, :2]) > 0


def test_warp_identity_is_noop():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (20, 24, 3), np.uint8)
    eye = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    out = warp_similarity(img, eye, 20, 24)
    np.testing.assert_array_equal(out, img)


def test_warp_pure_translation_shifts_pixels():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    m = np.array([[1.0, 0, 3.0], [0, 1.0, 2.0]])   # src→dst shift
    out = warp_similarity(img, m, 16, 16)
    np.testing.assert_array_equal(out[2:, 3:], img[:-2, :-3])
    assert (out[:2] == 0).all() and (out[:, :3] == 0).all()  # zero fill


def test_jax_warp_matches_numpy():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (30, 26, 3), np.uint8)
    m = _similarity(0.9, 0.3, 4.0, -2.0)
    a = warp_similarity(img, m, 24, 24)
    b = np.asarray(warp_similarity_jax(img, m, 24, 24))
    # identical bilinear math; rounding may differ by 1 LSB at .5 ties
    assert np.mean(np.abs(a.astype(int) - b.astype(int)) <= 1) == 1.0
    assert np.mean(a == b) > 0.98


def test_align_face_lands_landmarks_on_template():
    """Synthesize a face whose landmarks are a known transform of the
    template; align_face must map bright landmark dots onto the
    template positions."""
    m_off = _similarity(1.6, 0.25, 30.0, 18.0)   # template → source
    lm = _apply(m_off, ARCFACE_TEMPLATE_112)
    img = np.zeros((320, 320, 3), np.uint8)
    for x, y in lm:
        xi, yi = int(round(x)), int(round(y))
        img[yi - 2:yi + 3, xi - 2:xi + 3] = 255
    out = align_face(img, lm, size=112)
    assert out.shape == (112, 112, 3)
    for x, y in ARCFACE_TEMPLATE_112:
        patch = out[int(y) - 3:int(y) + 4, int(x) - 3:int(x) + 4]
        assert patch.max() > 180, (x, y)
    # background stays dark
    assert out[:20, :20].max() < 30


def test_align_face_validates_landmark_shape():
    img = np.zeros((50, 50, 3), np.uint8)
    with pytest.raises(ValueError, match=r"\(5, 2\)"):
        align_face(img, np.zeros((4, 2)))


def test_pack_with_landmarks_e2e(tmp_path):
    from PIL import Image

    from tf_face_toolbox_tpu.data.format import pack_image_list
    from tf_face_toolbox_tpu.data.pipeline import FaceShardSource

    rng = np.random.default_rng(4)
    lines, lm_lines = [], []
    for i in range(6):
        img = rng.integers(0, 256, (160, 140, 3), np.uint8)
        Image.fromarray(img).save(str(tmp_path / f"f{i}.jpg"),
                                  "JPEG", quality=95)
        lines.append(f"f{i}.jpg {i % 3}")
        m = _similarity(1.2 + 0.1 * i, 0.1 * i, 15.0, 20.0)
        lm = _apply(m, ARCFACE_TEMPLATE_112)
        lm_lines.append(" ".join(f"{v:.3f}" for v in lm.ravel()))
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "lm.txt").write_text("\n".join(lm_lines) + "\n")
    shard = str(tmp_path / "aligned.faceshard")
    n = pack_image_list(str(tmp_path / "list.txt"), shard,
                        root=str(tmp_path),
                        landmarks_path=str(tmp_path / "lm.txt"),
                        align_size=112)
    assert n == 6
    source = FaceShardSource(shard)
    img, lab = source.record(0)
    assert img.shape == (112, 112, 3)

    # mismatched landmark count fails loudly
    (tmp_path / "lm_short.txt").write_text(lm_lines[0] + "\n")
    with pytest.raises(ValueError, match="parallel|more images"):
        pack_image_list(str(tmp_path / "list.txt"),
                        str(tmp_path / "x.faceshard"),
                        root=str(tmp_path),
                        landmarks_path=str(tmp_path / "lm_short.txt"))
