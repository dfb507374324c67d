"""TFRecord ingestion vs the installed TF as writer-oracle."""

import io

import numpy as np
import pytest

from tf_face_toolbox_tpu.data.tfrecord import (
    convert_tfrecords_to_faceshard,
    iter_tfrecords,
    parse_example,
)

tf = pytest.importorskip("tensorflow")


def _write_tfrecord(path, examples):
    with tf.io.TFRecordWriter(str(path)) as w:
        for feats in examples:
            feature = {}
            for k, v in feats.items():
                if isinstance(v, bytes):
                    feature[k] = tf.train.Feature(
                        bytes_list=tf.train.BytesList(value=[v]))
                elif isinstance(v, int):
                    feature[k] = tf.train.Feature(
                        int64_list=tf.train.Int64List(value=[v]))
                elif isinstance(v, float):
                    feature[k] = tf.train.Feature(
                        float_list=tf.train.FloatList(value=[v]))
            w.write(tf.train.Example(
                features=tf.train.Features(feature=feature)
            ).SerializeToString())


def _jpeg(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=95)
    return buf.getvalue()


def test_parse_example_matches_tf(tmp_path):
    y, x = np.mgrid[0:10, 0:12]
    img = np.stack([y * 9 % 256, x * 7 % 256, (x + y) % 256],
                   -1).astype(np.uint8)
    blob = _jpeg(img)
    p = tmp_path / "a.tfrecord"
    _write_tfrecord(p, [{"image/encoded": blob, "image/label": 7,
                         "image/width": 12, "quality": 0.5}])
    records = list(iter_tfrecords(str(p)))
    assert len(records) == 1
    ex = parse_example(records[0])
    assert bytes(ex["image/encoded"][0]) == blob
    assert ex["image/label"][0] == 7
    assert ex["image/width"][0] == 12
    assert abs(ex["quality"][0] - 0.5) < 1e-6


def test_convert_to_faceshard_roundtrip(tmp_path):
    from tf_face_toolbox_tpu.data.pipeline import FaceShardSource
    examples = []
    for i in range(6):
        y, x = np.mgrid[0:16, 0:16]
        img = np.stack([(y * (i + 2)) % 256, x % 256, (x * y) % 256],
                       -1).astype(np.uint8)
        examples.append({"image/encoded": _jpeg(img),
                         "image/label": i % 3})
    p1, p2 = tmp_path / "s1.tfrecord", tmp_path / "s2.tfrecord"
    _write_tfrecord(p1, examples[:3])
    _write_tfrecord(p2, examples[3:])
    out = str(tmp_path / "out.faceshard")
    n = convert_tfrecords_to_faceshard([str(p1), str(p2)], out)
    assert n == 6
    src = FaceShardSource(out)
    img, lab = src.record(4)
    assert img.shape == (16, 16, 3)
    assert lab == 1
    np.testing.assert_array_equal(
        src.index.labels, [0, 1, 2, 0, 1, 2])


def test_missing_key_reports_available(tmp_path):
    p = tmp_path / "bad.tfrecord"
    _write_tfrecord(p, [{"img": b"xx", "y": 1}])
    with pytest.raises(KeyError, match="found features"):
        convert_tfrecords_to_faceshard([str(p)],
                                       str(tmp_path / "o.faceshard"))


def test_arrayrecord_ingest(tmp_path):
    arm = pytest.importorskip("array_record.python.array_record_module")
    from tf_face_toolbox_tpu.data.pipeline import FaceShardSource
    y, x = np.mgrid[0:8, 0:8]
    img = np.stack([y * 20 % 256, x * 20 % 256, (x + y) % 256],
                   -1).astype(np.uint8)
    ex = tf.train.Example(features=tf.train.Features(feature={
        "image/encoded": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[_jpeg(img)])),
        "image/label": tf.train.Feature(
            int64_list=tf.train.Int64List(value=[3])),
    })).SerializeToString()
    p = str(tmp_path / "d.array_record")
    w = arm.ArrayRecordWriter(p, "group_size:1")
    w.write(ex)
    w.close()
    out = str(tmp_path / "o.faceshard")
    n = convert_tfrecords_to_faceshard([p], out)
    assert n == 1
    src = FaceShardSource(out)
    got, lab = src.record(0)
    assert got.shape == (8, 8, 3) and lab == 3


def test_negative_int64_label_roundtrip(tmp_path):
    p = tmp_path / "neg.tfrecord"
    _write_tfrecord(p, [{"image/encoded": b"blob", "image/label": -1}])
    ex = parse_example(next(iter_tfrecords(str(p))))
    assert ex["image/label"][0] == -1


# ---------------------------------------------------------------------------
# masked CRC32C verification (default on)
# ---------------------------------------------------------------------------

def test_corrupt_data_byte_raises(tmp_path):
    p = str(tmp_path / "c.tfrecord")
    _write_tfrecord(p, [{"image/encoded": b"payload", "image/label": 1}])
    blob = bytearray(open(p, "rb").read())
    blob[14] ^= 0xFF  # flip a byte inside the record data
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="data CRC"):
        list(iter_tfrecords(p))
    # verification off: framing still parses (old behavior, opt-in)
    assert len(list(iter_tfrecords(p, verify_crc=False))) == 1


def test_corrupt_length_header_raises(tmp_path):
    p = str(tmp_path / "h.tfrecord")
    _write_tfrecord(p, [{"image/encoded": b"payload", "image/label": 1}])
    blob = bytearray(open(p, "rb").read())
    blob[1] ^= 0x01  # corrupt the u64 length without changing its CRC
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="length CRC"):
        list(iter_tfrecords(p))


def test_truncated_tail_raises(tmp_path):
    p = str(tmp_path / "t.tfrecord")
    _write_tfrecord(p, [{"image/encoded": b"payload" * 10,
                         "image/label": 1}])
    blob = open(p, "rb").read()
    open(p, "wb").write(blob[:-6])  # chop mid-footer
    with pytest.raises(ValueError, match="truncated"):
        list(iter_tfrecords(p))


def test_pure_python_crc_matches_c_extension():
    """The module's OWN except-ImportError fallback must agree with
    google_crc32c (and hence with the TF writer whose records the other
    tests verify end-to-end). google_crc32c IS installed on this image,
    so the fallback branch is exercised by reloading the module with the
    import forced to fail — testing the real code, not a local copy."""
    import importlib
    import sys

    import tf_face_toolbox_tpu.data.tfrecord as tfr
    from google_crc32c import value as c_ext

    sys.modules["google_crc32c"] = None  # makes the import raise
    try:
        importlib.reload(tfr)
        assert tfr._CRC32C_TABLE, "fallback branch did not run"
        pure = tfr._crc32c
        for blob in [b"", b"a", b"123456789", b"\x00" * 32,
                     bytes(range(256)) * 3]:
            assert pure(blob) == c_ext(blob)
        # known-answer vector: CRC32C("123456789") = 0xE3069283
        assert pure(b"123456789") == 0xE3069283
    finally:
        del sys.modules["google_crc32c"]
        importlib.reload(tfr)  # restore the C-extension path
