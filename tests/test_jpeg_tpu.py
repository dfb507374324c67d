"""TPU-side JPEG completion: native entropy-decode + on-device
dequant/IDCT/color (native fs_dct_batch + ops/jpeg_tpu.decode_dct).

Oracle is PIL/libjpeg's FULL decode of the same bytes; the device path
must land within the decoder-variation budget (SURVEY.md §8: JPEG
decode is not bit-exact across decoders — ±2 LSB here, the float IDCT
vs libjpeg's integer islow)."""

import io

import numpy as np
import pytest

from PIL import Image

from tf_face_toolbox_tpu.data.format import (
    PAYLOAD_JPEG,
    pack_image_list,
    write_shard,
)
from tf_face_toolbox_tpu.ops.jpeg_tpu import _idct_matrix, decode_dct

native = pytest.importorskip("tf_face_toolbox_tpu.data.native")
if not native.native_available():  # pragma: no cover
    pytest.skip("native loader unavailable", allow_module_level=True)


def _jpeg444(arr: np.ndarray, quality: int = 95) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality, subsampling=0)
    return buf.getvalue()


def _gradient_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([yy * 255 / h, xx * 255 / w,
                     (yy + xx) * 255 / (h + w)], -1)
    noisy = base + rng.normal(0, 12, (h, w, 3))
    return np.clip(noisy, 0, 255).astype(np.uint8)


def test_idct_matrix_orthonormal():
    a = _idct_matrix()
    np.testing.assert_allclose(a @ a.T, np.eye(8), atol=1e-6)


def test_device_decode_matches_libjpeg(tmp_path):
    imgs = [_gradient_image(32, 32, s) for s in range(4)]
    path = str(tmp_path / "t.faceshard")
    write_shard(path, [_jpeg444(im) for im in imgs], [0, 1, 2, 3],
                payload=PAYLOAD_JPEG)
    reader = native.NativeShardReader(path, num_threads=2)
    try:
        coef, qtab = reader.dct_batch([0, 1, 2, 3], 32, 32)
        assert coef.shape == (4, 4, 4, 3, 64) and coef.dtype == np.int16
        assert qtab.shape == (4, 3, 64) and qtab.dtype == np.uint16
        got = np.asarray(decode_dct(coef, qtab))
        # full host decode of the same bytes (libjpeg via the reader)
        want = reader.decode_batch([0, 1, 2, 3], 32, 32)
    finally:
        reader.close()
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 2, f"max LSB diff {diff.max()}"
    assert (diff > 1).mean() < 0.01  # overwhelmingly ≤1


def test_dct_rejects_nonuniform_geometry(tmp_path):
    path = str(tmp_path / "bad.faceshard")
    blobs = [_jpeg444(_gradient_image(32, 32)),
             _jpeg444(_gradient_image(24, 32))]  # wrong height
    write_shard(path, blobs, [0, 1], payload=PAYLOAD_JPEG)
    reader = native.NativeShardReader(path, num_threads=0)
    try:
        with pytest.raises(ValueError, match="DCT extraction"):
            reader.dct_batch([0, 1], 32, 32)
        # the well-formed record alone passes
        coef, qtab = reader.dct_batch([0], 32, 32)
        assert coef.shape[0] == 1
    finally:
        reader.close()


def test_dct_rejects_chroma_subsampling(tmp_path):
    buf = io.BytesIO()
    Image.fromarray(_gradient_image(32, 32)).save(
        buf, "JPEG", quality=90, subsampling=2)  # 4:2:0
    path = str(tmp_path / "sub.faceshard")
    write_shard(path, [buf.getvalue()], [0], payload=PAYLOAD_JPEG)
    reader = native.NativeShardReader(path, num_threads=0)
    try:
        with pytest.raises(ValueError, match="4:4:4"):
            reader.dct_batch([0], 32, 32)
    finally:
        reader.close()


def test_pack_recode_uniform_shard_feeds_dct(tmp_path):
    """Mixed-size sources → --recode_size shard → DCT path ≈ full
    decode of the recoded bytes (the e2e contract of the feature)."""
    sizes = [(40, 56), (32, 32), (64, 48)]
    lines = []
    for i, (h, w) in enumerate(sizes):
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(_gradient_image(h, w, i)).save(
            str(p), "JPEG", quality=95)
        lines.append(f"img_{i}.jpg {i}\n")
    lst = tmp_path / "list.txt"
    lst.write_text("".join(lines))
    out = str(tmp_path / "recoded.faceshard")
    n = pack_image_list(str(lst), out, root=str(tmp_path),
                        recode_size=32)
    assert n == 3
    reader = native.NativeShardReader(out, num_threads=0)
    try:
        coef, qtab = reader.dct_batch([0, 1, 2], 32, 32)
        got = np.asarray(decode_dct(coef, qtab))
        want = reader.decode_batch([0, 1, 2], 32, 32)
    finally:
        reader.close()
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


def test_pack_recode_size_must_be_block_aligned(tmp_path):
    (tmp_path / "list.txt").write_text("x.jpg 0\n")
    with pytest.raises(ValueError, match="multiple of 8"):
        pack_image_list(str(tmp_path / "list.txt"),
                        str(tmp_path / "o.faceshard"), recode_size=30)


@pytest.mark.mid
def test_extract_shard_dct_loader_matches_native(tmp_path):
    """extract_shard(loader='native_dct') ≈ loader='native' embeddings:
    the serving integration of the on-device JPEG completion."""
    import jax
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.data.pipeline import FaceShardSource
    from tf_face_toolbox_tpu.extract import extract_shard
    from tf_face_toolbox_tpu.models import create_network, init_variables

    lines = []
    for i in range(6):
        p = tmp_path / f"f_{i}.jpg"
        Image.fromarray(_gradient_image(40, 40, i)).save(str(p), "JPEG")
        lines.append(f"f_{i}.jpg {i}\n")
    (tmp_path / "list.txt").write_text("".join(lines))
    shard = str(tmp_path / "u.faceshard")
    pack_image_list(str(tmp_path / "list.txt"), shard,
                    root=str(tmp_path), recode_size=24)

    net = create_network("resnet_tiny", embedding_dim=8)
    variables = init_variables(net, jax.random.key(0), (1, 16, 16, 3))
    source = FaceShardSource(shard)
    kw = dict(image_size=16, crop_from=24, batch=4)
    e_native = extract_shard(net, variables, source, loader="native", **kw)
    e_dct = extract_shard(net, variables, source, loader="native_dct",
                          **kw)
    cos = np.sum(e_native * e_dct, axis=1)  # rows are unit-norm
    assert cos.min() > 0.999, cos
    # and the wrong-geometry shard fails loudly through this path too
    bad = str(tmp_path / "bad.faceshard")
    pack_image_list(str(tmp_path / "list.txt"), bad, root=str(tmp_path))
    with pytest.raises(ValueError, match="DCT extraction"):
        extract_shard(net, variables, FaceShardSource(bad),
                      loader="native_dct", **kw)


@pytest.mark.mid
def test_train_step_dct_input_matches_u8(tmp_path):
    """make_train_step(input_format='dct') runs the SPMD step off
    (coef, qtab) batches and lands within decode tolerance of the
    uint8 path (same RNG → same crops/flips; pixels differ ≤2 LSB)."""
    import jax

    from tf_face_toolbox_tpu.data.pipeline import (
        FaceShardSource,
        native_batch_iterator,
        native_dct_batch_iterator,
    )
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    from tf_face_toolbox_tpu.train.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    lines = []
    for i in range(16):
        p = tmp_path / f"t_{i}.jpg"
        Image.fromarray(_gradient_image(24, 24, i)).save(str(p), "JPEG")
        lines.append(f"t_{i}.jpg {i % 4}\n")
    (tmp_path / "list.txt").write_text("".join(lines))
    shard = str(tmp_path / "t.faceshard")
    pack_image_list(str(tmp_path / "list.txt"), shard,
                    root=str(tmp_path), recode_size=16)

    cfg = TrainConfig(network="resnet_tiny", embedding_dim=8,
                      num_classes=4, image_size=12, crop_from=16,
                      global_batch=8, augment=True)
    mesh = create_mesh()

    def one_step(fmt):
        it = (native_dct_batch_iterator(FaceShardSource(shard), 8,
                                        size=16)
              if fmt == "dct" else
              native_batch_iterator(FaceShardSource(shard), 8,
                                    out_h=16, out_w=16))
        batch = next(it)
        state, net = create_train_state(cfg, jax.random.key(0), mesh)
        step = make_train_step(net, cfg, mesh, state, input_format=fmt)
        state, metrics = step(state, batch["image"], batch["label"])
        return float(jax.device_get(metrics["loss"]))

    l_dct = one_step("dct")
    l_u8 = one_step("u8")
    assert np.isfinite(l_dct)
    assert abs(l_dct - l_u8) < 0.1, (l_dct, l_u8)

    # guard: dct input requires the augment chain
    with pytest.raises(ValueError, match="augment"):
        from tf_face_toolbox_tpu.train.trainer import (
            create_train_state as cts,
            make_train_step as mts,
        )
        cfg2 = TrainConfig(network="resnet_tiny", embedding_dim=8,
                           num_classes=4, image_size=12, crop_from=16,
                           global_batch=8, augment=False)
        s2, n2 = cts(cfg2, jax.random.key(0), mesh)
        mts(n2, cfg2, mesh, s2, input_format="dct")


def test_device_decode_hard_edges_within_budget(tmp_path):
    """Saturated checkerboard/edge content drives IDCT overshoot
    (ringing); libjpeg range-limits components BEFORE color conversion
    and decode_dct must match within the same ±2 LSB budget."""
    rng = np.random.default_rng(7)
    imgs = []
    for s in range(3):
        im = np.zeros((32, 32, 3), np.uint8)
        im[(np.mgrid[0:32, 0:32][0] // 4 +
            np.mgrid[0:32, 0:32][1] // 4) % 2 == 0] = 255
        im[8:12, :, 0] = 0  # hard colored stripe
        im[:, 20:22] = rng.integers(0, 256, (32, 2, 3), np.uint8)
        imgs.append(im)
    path = str(tmp_path / "edges.faceshard")
    write_shard(path, [_jpeg444(im, 85) for im in imgs], [0, 1, 2],
                payload=PAYLOAD_JPEG)
    reader = native.NativeShardReader(path, num_threads=0)
    try:
        coef, qtab = reader.dct_batch([0, 1, 2], 32, 32)
        got = np.asarray(decode_dct(coef, qtab))
        want = reader.decode_batch([0, 1, 2], 32, 32)
    finally:
        reader.close()
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 2, f"max LSB diff {diff.max()}"


def test_dct_rejects_block_padded_dimensions(tmp_path):
    """ADVICE r2: a 30x32 JPEG has the same BLOCK counts as 32x32
    (ceil(30/8)=4) but pads the edge blocks — it must be rejected, not
    silently decoded with padding rows the resize path would never
    produce."""
    path = str(tmp_path / "pad.faceshard")
    write_shard(path, [_jpeg444(_gradient_image(30, 32))], [0],
                payload=PAYLOAD_JPEG)
    reader = native.NativeShardReader(path, num_threads=0)
    try:
        with pytest.raises(ValueError, match="DCT extraction"):
            reader.dct_batch([0], 32, 32)
    finally:
        reader.close()


def test_pack_recode_resize_matches_pipeline_resize(tmp_path):
    """ADVICE r2: the recode resize must be the pipeline's half-pixel
    _resize_u8 (NOT PIL's antialiased BILINEAR) so recoded-shard pixels
    match what a plain shard produces at load time. Budget = JPEG q95
    re-encode error only (a few LSB); the PIL-antialias skew it guards
    against is tens of LSB on a noisy gradient."""
    from tf_face_toolbox_tpu.data.pipeline import _resize_u8

    src = _gradient_image(48, 40, seed=3)
    p = tmp_path / "img.jpg"
    Image.fromarray(src).save(str(p), "JPEG", quality=98)
    (tmp_path / "list.txt").write_text("img.jpg 0\n")
    out = str(tmp_path / "r.faceshard")
    pack_image_list(str(tmp_path / "list.txt"), out,
                    root=str(tmp_path), recode_size=32,
                    recode_quality=98)
    reader = native.NativeShardReader(out, num_threads=0)
    try:
        got = reader.decode_batch([0], 32, 32)[0]
    finally:
        reader.close()
    decoded = np.asarray(Image.open(str(p)).convert("RGB"), np.uint8)
    want = _resize_u8(decoded, 32, 32)
    anti = np.asarray(Image.fromarray(decoded).resize(
        (32, 32), Image.BILINEAR), np.uint8)  # the WRONG kernel
    d_want = np.abs(got.astype(int) - want.astype(int))
    d_anti = np.abs(got.astype(int) - anti.astype(int))
    # absolute: within JPEG re-encode noise of the pipeline kernel;
    # relative: strictly closer to it than to the antialiased kernel
    assert d_want.max() <= 8 and d_want.mean() < 1.3, (
        f"max {d_want.max()} mean {d_want.mean():.2f}")
    assert d_want.mean() < d_anti.mean(), (d_want.mean(), d_anti.mean())
