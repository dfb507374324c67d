"""MXNet RecordIO reader + InsightFace .rec → FaceShard importer.

Fixtures are synthesized byte-for-byte in the published MXNet framing
(magic/cflag/length, 4-byte padding, IRHeader) — no mxnet needed.
"""

import json
import struct

import numpy as np
import pytest

from tf_face_toolbox_tpu.data.recordio import (
    RECORDIO_MAGIC,
    convert_rec_to_faceshard,
    read_records,
    unpack_record,
)


def _frame(payload: bytes, cflag: int = 0) -> bytes:
    lrec = (cflag << 29) | len(payload)
    pad = (4 - len(payload) % 4) % 4
    return struct.pack("<II", RECORDIO_MAGIC, lrec) + payload + b"\0" * pad


def _ir(flag: int, label, content: bytes, idx: int = 0) -> bytes:
    if flag == 0:
        return struct.pack("<IfQQ", 0, float(label), idx, 0) + content
    head = struct.pack("<IfQQ", flag, 0.0, idx, 0)
    return head + np.asarray(label, "<f4").tobytes() + content


def _jpeg(seed: int) -> bytes:
    import io

    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=95)
    return buf.getvalue()


def _insightface_rec(tmp_path, images_per_id=3, ids=4):
    """The MS1M-style layout: meta record 0, image records, identity
    index rows at the tail (empty content)."""
    n = images_per_id * ids
    records = [_ir(2, [n + 1, n + 1 + ids], b"")]      # meta
    jpegs = []
    for i in range(n):
        ident = 100 + (i // images_per_id)             # sparse source ids
        jpegs.append(_jpeg(i))
        # mix of header styles: scalar label and 2-float label both
        # appear in the wild
        if i % 2:
            records.append(_ir(0, ident, jpegs[-1], idx=i + 1))
        else:
            records.append(_ir(2, [ident, 0.0], jpegs[-1], idx=i + 1))
    for k in range(ids):
        start = 1 + k * images_per_id
        records.append(_ir(2, [start, start + images_per_id], b""))
    path = tmp_path / "train.rec"
    path.write_bytes(b"".join(_frame(r) for r in records))
    return str(path), jpegs


def test_read_records_roundtrip_and_padding(tmp_path):
    payloads = [b"a", b"abcd", b"abcde", b""]
    p = tmp_path / "x.rec"
    p.write_bytes(b"".join(_frame(x) for x in payloads))
    assert list(read_records(str(p))) == payloads


def test_read_records_reassembles_split(tmp_path):
    p = tmp_path / "split.rec"
    p.write_bytes(_frame(b"one", 0) + _frame(b"he", 1) +
                  _frame(b"ll", 2) + _frame(b"o!", 3) + _frame(b"two", 0))
    assert list(read_records(str(p))) == [b"one", b"hello!", b"two"]


def test_read_records_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.rec"
    p.write_bytes(struct.pack("<II", 0xDEADBEEF, 4) + b"abcd")
    with pytest.raises(ValueError, match="magic"):
        list(read_records(str(p)))


def test_unpack_record_header_styles():
    labels, content = unpack_record(_ir(0, 7, b"IMG"))
    assert labels.tolist() == [7.0] and content == b"IMG"
    labels, content = unpack_record(_ir(3, [5, 1, 2], b"IMG"))
    assert labels.tolist() == [5.0, 1.0, 2.0] and content == b"IMG"


def test_convert_insightface_rec_to_faceshard(tmp_path):
    from tf_face_toolbox_tpu.data.format import ShardReader, read_index

    rec, jpegs = _insightface_rec(tmp_path)
    out = str(tmp_path / "train.faceshard")
    n, k = convert_rec_to_faceshard(rec, out)
    assert (n, k) == (12, 4)

    reader = ShardReader(read_index(out))
    assert reader.index.count == 12
    # blobs land verbatim, identities densified in first-seen order
    # (source ids 100..103 -> 0..3), meta/identity rows skipped
    for i in range(12):
        assert reader.blob(i) == jpegs[i]
        assert reader.label(i) == i // 3
    mapping = json.loads((tmp_path / "train.faceshard.labels.json"
                          ).read_text())
    assert mapping == {"100": 0, "101": 1, "102": 2, "103": 3}


def test_convert_norelabel_keeps_source_ids(tmp_path):
    from tf_face_toolbox_tpu.data.format import ShardReader, read_index

    rec, _ = _insightface_rec(tmp_path)
    out = str(tmp_path / "raw.faceshard")
    n, k = convert_rec_to_faceshard(rec, out, relabel=False)
    assert (n, k) == (12, 4)
    reader = ShardReader(read_index(out))
    assert reader.label(0) == 100 and reader.label(11) == 103
    assert not (tmp_path / "raw.faceshard.labels.json").exists()


def test_imported_shard_feeds_the_pipeline(tmp_path):
    """The imported shard is a first-class training input: the host
    pipeline decodes and batches it like any cli.pack output."""
    from tf_face_toolbox_tpu.data.pipeline import (
        FaceShardSource,
        batch_iterator,
    )

    rec, _ = _insightface_rec(tmp_path)
    out = str(tmp_path / "train.faceshard")
    convert_rec_to_faceshard(rec, out)
    src = FaceShardSource(out)
    batch = next(batch_iterator(src, 4, num_threads=2))
    assert batch["image"].shape == (4, 16, 16, 3)
    assert batch["label"].shape == (4,)
