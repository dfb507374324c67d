"""Native C++ FaceShard loader vs the Python reference implementation."""

import io

import numpy as np
import pytest

from tf_face_toolbox_tpu.data.format import (
    pack_arrays,
    write_shard,
    PAYLOAD_JPEG,
)
from tf_face_toolbox_tpu.data.pipeline import FaceShardSource

native = pytest.importorskip("tf_face_toolbox_tpu.data.native")
if not native.native_available():
    pytest.skip("libfaceshard.so unavailable", allow_module_level=True)


def test_raw_batch_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (10, 12, 12, 3), dtype=np.uint8)
    labels = np.arange(10, dtype=np.int32)
    path = str(tmp_path / "raw.faceshard")
    pack_arrays(path, images, labels)

    r = native.NativeShardReader(path, num_threads=2)
    assert r.count == 10
    np.testing.assert_array_equal(r.labels, labels)
    out = r.decode_batch([3, 1, 4], 12, 12)
    np.testing.assert_array_equal(out, images[[3, 1, 4]])
    r.close()


def test_prefetch_hint_and_decode_unchanged(tmp_path):
    """fs_prefetch is a pure readahead hint: it coalesces ranges into
    >=1 madvise call and decode output is byte-identical after it."""
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (16, 8, 8, 3), dtype=np.uint8)
    labels = np.zeros(16, np.int32)
    path = str(tmp_path / "raw.faceshard")
    pack_arrays(path, images, labels)

    r = native.NativeShardReader(path, num_threads=2)
    base = r.decode_batch(list(range(16)), 8, 8)
    calls = r.prefetch([0, 1, 2, 3, 15])
    assert calls >= 1
    assert r.prefetch([-5, 999]) == 0       # out-of-range ids: no-ops
    after = r.decode_batch(list(range(16)), 8, 8)
    np.testing.assert_array_equal(base, after)
    r.close()


def test_jpeg_batch_matches_python_decoder(tmp_path):
    from PIL import Image
    blobs, labels = [], []
    for i in range(6):
        y, x = np.mgrid[0:20, 0:16]
        arr = np.stack([(y * 9 + i * 17) % 256, (x * 11) % 256,
                        ((x + y) * 7) % 256], -1).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=92)
        blobs.append(buf.getvalue())
        labels.append(i)
    path = str(tmp_path / "j.faceshard")
    write_shard(path, blobs, labels, payload=PAYLOAD_JPEG)

    r = native.NativeShardReader(path, num_threads=4)
    out = r.decode_batch(list(range(6)), 20, 16)

    src = FaceShardSource(path)
    for i in range(6):
        ref, _ = src.record(i)
        # PIL and libjpeg share the same decoder lineage; allow 1-2 LSB
        # for different IDCT paths (SURVEY.md §8 decode-tolerance note).
        assert np.abs(out[i].astype(int) - ref.astype(int)).max() <= 2
    r.close()


def test_native_resize_close_to_device_resize(tmp_path):
    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, (4, 24, 24, 3), dtype=np.uint8)
    path = str(tmp_path / "r.faceshard")
    pack_arrays(path, images, np.zeros(4, np.int32))
    r = native.NativeShardReader(path, num_threads=0)
    out = r.decode_batch([0, 1, 2, 3], 12, 12)

    import jax.numpy as jnp
    from tf_face_toolbox_tpu.ops.preprocess import resize_bilinear
    want = np.asarray(resize_bilinear(jnp.asarray(images), 12, 12))
    # u8 rounding vs f32: within 1 LSB everywhere
    assert np.abs(out.astype(np.float32) - want).max() <= 1.0
    r.close()


def test_out_of_range_id_raises(tmp_path):
    images = np.zeros((2, 8, 8, 3), np.uint8)
    path = str(tmp_path / "o.faceshard")
    pack_arrays(path, images, [0, 1])
    r = native.NativeShardReader(path, num_threads=0)
    with pytest.raises(ValueError):
        r.decode_batch([0, 99], 8, 8)
    r.close()


def test_truncated_shard_rejected_cleanly(tmp_path):
    """Corrupt/truncated shards must fail fs_open, not SIGSEGV later."""
    rng = np.random.default_rng(5)
    images = rng.integers(0, 256, (10, 8, 8, 3), dtype=np.uint8)
    path = str(tmp_path / "t.faceshard")
    pack_arrays(path, images, np.zeros(10, np.int32))
    data = open(path, "rb").read()
    # truncate mid-index and mid-payload
    for cut in (40, len(data) - 50):
        bad = str(tmp_path / f"bad{cut}.faceshard")
        open(bad, "wb").write(data[:cut])
        with pytest.raises(OSError):
            native.NativeShardReader(bad)
