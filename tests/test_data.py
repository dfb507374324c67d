"""FaceShard format + pipeline tests (SURVEY.md §4 unit/integration)."""

import io

import numpy as np
import pytest

from tf_face_toolbox_tpu.data.format import (
    PAYLOAD_JPEG,
    ShardReader,
    pack_arrays,
    pack_image_list,
    read_index,
    write_shard,
)
from tf_face_toolbox_tpu.data.pipeline import (
    FaceShardSource,
    batch_iterator,
    device_prefetch,
)


def _raw_shard(tmp_path, n=20, h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    labels = rng.integers(0, 5, n).astype(np.int32)
    path = str(tmp_path / "train.faceshard")
    pack_arrays(path, images, labels)
    return path, images, labels


def test_raw_roundtrip(tmp_path):
    path, images, labels = _raw_shard(tmp_path)
    idx = read_index(path)
    assert idx.count == 20 and idx.shape == (8, 8, 3)
    r = ShardReader(idx)
    for i in [0, 7, 19]:
        np.testing.assert_array_equal(r.raw(i), images[i])
        assert r.label(i) == labels[i]


def test_jpeg_roundtrip(tmp_path):
    from PIL import Image
    blobs, labels = [], []
    originals = []
    for i in range(5):
        # smooth gradient (JPEG-friendly; random noise decodes poorly)
        y, x = np.mgrid[0:16, 0:12]
        arr = np.stack([(y * 8 + i * 10) % 256, (x * 12) % 256,
                        ((x + y) * 5) % 256], -1).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=95)
        blobs.append(buf.getvalue())
        labels.append(i)
        originals.append(arr)
    path = str(tmp_path / "j.faceshard")
    write_shard(path, blobs, labels, payload=PAYLOAD_JPEG)
    src = FaceShardSource(path)
    img, lab = src.record(3)
    assert img.shape == (16, 12, 3) and lab == 3
    # lossy decode: within JPEG tolerance of the original
    assert np.abs(img.astype(int) - originals[3].astype(int)).mean() < 20


def test_pack_image_list(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(2)
    lines = []
    for i in range(4):
        arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(arr).save(str(p), "JPEG")
        lines.append(f"img{i}.jpg {i % 2}")
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(lines) + "\n")
    out = str(tmp_path / "packed.faceshard")
    n = pack_image_list(str(lst), out, root=str(tmp_path))
    assert n == 4
    idx = read_index(out)
    np.testing.assert_array_equal(idx.labels, [0, 1, 0, 1])


def test_epoch_shuffle_deterministic_and_complete(tmp_path):
    path, _, _ = _raw_shard(tmp_path)
    src = FaceShardSource(path, seed=7)
    o0a, o0b = src.epoch_order(0), src.epoch_order(0)
    np.testing.assert_array_equal(o0a, o0b)          # same seed+epoch
    o1 = src.epoch_order(1)
    assert not np.array_equal(o0a, o1)               # differs by epoch
    np.testing.assert_array_equal(np.sort(o0a), np.arange(20))


def test_host_sharding_partitions(tmp_path):
    path, _, _ = _raw_shard(tmp_path)
    srcs = [FaceShardSource(path, host_index=h, host_count=4)
            for h in range(4)]
    all_ids = np.concatenate([s._host_ids for s in srcs])
    np.testing.assert_array_equal(np.sort(all_ids), np.arange(20))


def test_batch_iterator_resume(tmp_path):
    path, images, labels = _raw_shard(tmp_path)
    src = FaceShardSource(path, seed=3)
    it = batch_iterator(src, 4, num_threads=1)
    seen = [next(it) for _ in range(7)]              # crosses epoch bound
    # resume from the recorded position of batch 5
    b5 = seen[5]
    it2 = batch_iterator(src, 4, start_epoch=b5["epoch"],
                         start_step=b5["step"], num_threads=1)
    again = next(it2)
    np.testing.assert_array_equal(again["image"], b5["image"])
    np.testing.assert_array_equal(again["label"], b5["label"])


def test_batch_iterator_threaded_matches_serial(tmp_path):
    path, _, _ = _raw_shard(tmp_path)
    src = FaceShardSource(path, seed=4)
    a = next(batch_iterator(src, 8, num_threads=1))
    b = next(batch_iterator(src, 8, num_threads=4))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["label"], b["label"])


def test_device_prefetch_preserves_order(tmp_path):
    path, _, _ = _raw_shard(tmp_path)
    src = FaceShardSource(path, seed=5)
    plain = batch_iterator(src, 4, num_threads=1)
    pref = device_prefetch(batch_iterator(src, 4, num_threads=1), depth=2)
    for _ in range(6):
        a, b = next(plain), next(pref)
        np.testing.assert_array_equal(a["image"], np.asarray(b["image"]))


def test_grain_adapter(tmp_path):
    grain = pytest.importorskip("grain.python")
    path, images, labels = _raw_shard(tmp_path)
    from tf_face_toolbox_tpu.data.grain_adapter import (
        FaceShardDataSource, make_grain_dataset)
    src = FaceShardDataSource(path)
    assert len(src) == 20
    rec = src[3]
    np.testing.assert_array_equal(rec["image"], images[3])
    assert rec["label"] == labels[3]
    loader = make_grain_dataset(path, batch_size=4, seed=1, num_epochs=1)
    batches = list(loader)
    assert len(batches) == 5
    assert batches[0]["image"].shape == (4, 8, 8, 3)


def test_balanced_batch_iterator(tmp_path):
    from tf_face_toolbox_tpu.data.pipeline import balanced_batch_iterator
    rng = np.random.default_rng(3)
    # 6 identities x 5 images each
    images = rng.integers(0, 256, (30, 8, 8, 3), dtype=np.uint8)
    labels = np.repeat(np.arange(6), 5).astype(np.int32)
    path = str(tmp_path / "bal.faceshard")
    pack_arrays(path, images, labels)
    src = FaceShardSource(path, seed=11)
    it = balanced_batch_iterator(src, ids_per_batch=3, images_per_id=2,
                                 num_threads=1)
    b = next(it)
    assert b["image"].shape == (6, 8, 8, 3)
    counts = np.bincount(b["label"], minlength=6)
    assert sorted(counts[counts > 0].tolist()) == [2, 2, 2]
    # deterministic resume: restarting at step N reproduces batch N
    b3 = [next(it) for _ in range(3)][-1]    # steps 1,2,3
    it2 = balanced_batch_iterator(src, ids_per_batch=3, images_per_id=2,
                                  start_step=3, num_threads=1)
    again = next(it2)
    np.testing.assert_array_equal(b3["image"], again["image"])


def test_balanced_iterator_rejects_thin_identities(tmp_path):
    from tf_face_toolbox_tpu.data.pipeline import balanced_batch_iterator
    images = np.zeros((4, 8, 8, 3), np.uint8)
    labels = np.array([0, 0, 1, 2], np.int32)   # ids 1,2 have 1 image
    path = str(tmp_path / "thin.faceshard")
    pack_arrays(path, images, labels)
    src = FaceShardSource(path)
    with pytest.raises(ValueError, match="identities"):
        next(balanced_batch_iterator(src, ids_per_batch=2, images_per_id=2,
                                     num_threads=1))


def test_decode_pool_propagates_errors(tmp_path):
    """A corrupt record must raise, not deadlock the thread pool."""
    from tf_face_toolbox_tpu.data.format import write_shard, PAYLOAD_JPEG
    from tf_face_toolbox_tpu.data.pipeline import _DecodePool
    path = str(tmp_path / "corrupt.faceshard")
    write_shard(path, [b"not-a-jpeg", b"also-bad"], [0, 1],
                payload=PAYLOAD_JPEG)
    src = FaceShardSource(path)
    pool = _DecodePool(src, 2)
    try:
        with pytest.raises(Exception):
            pool.decode([0, 1])
        # pool still alive after the failure: a good record elsewhere
        # would work; here just ensure close() returns.
    finally:
        pool.close()


def test_batch_iterator_resize_matches_native_semantics(tmp_path):
    """Python loader with resize_to must give the same pixels as the
    native loader at the same output geometry (<=1 LSB: PIL vs C++)."""
    from tf_face_toolbox_tpu.data import native as native_mod
    if not native_mod.native_available():
        pytest.skip("native loader unavailable")
    rng = np.random.default_rng(8)
    images = rng.integers(0, 256, (8, 24, 24, 3), dtype=np.uint8)
    path = str(tmp_path / "rz.faceshard")
    pack_arrays(path, images, np.zeros(8, np.int32))
    src = FaceShardSource(path, seed=6)
    from tf_face_toolbox_tpu.data.pipeline import native_batch_iterator
    b_py = next(batch_iterator(src, 8, num_threads=1, resize_to=(12, 12)))
    b_nat = next(native_batch_iterator(src, 8, out_h=12, out_w=12,
                                       num_threads=1))
    np.testing.assert_array_equal(b_py["label"], b_nat["label"])
    diff = np.abs(b_py["image"].astype(int) - b_nat["image"].astype(int))
    assert diff.max() <= 1


def test_host_prefetch_order_and_errors(tmp_path):
    from tf_face_toolbox_tpu.data.pipeline import host_prefetch
    path, images, labels = _raw_shard(tmp_path)
    src = FaceShardSource(path, seed=9)
    it_plain = batch_iterator(src, 4, num_threads=1)
    plain = [next(it_plain) for _ in range(4)]
    pref = host_prefetch(batch_iterator(src, 4, num_threads=1), depth=2)
    for want in plain:
        got = next(pref)
        np.testing.assert_array_equal(want["image"], got["image"])

    def boom():
        yield {"image": np.zeros(1)}
        raise RuntimeError("decode failed")
    it = host_prefetch(boom(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_globalize_host_batches_single_process(tmp_path):
    import jax
    from tf_face_toolbox_tpu.parallel.mesh import (
        create_mesh, globalize_host_batches)
    path, images, labels = _raw_shard(tmp_path)
    src = FaceShardSource(path, seed=2)
    mesh = create_mesh()
    it = globalize_host_batches(batch_iterator(src, 8, num_threads=1), mesh)
    b = next(it)
    assert isinstance(b["image"], jax.Array)
    assert b["image"].shape == (8, 8, 8, 3)
    ref = next(batch_iterator(src, 8, num_threads=1))
    np.testing.assert_array_equal(np.asarray(b["image"]), ref["image"])


def test_globalize_host_batches_tuple_image(tmp_path):
    """The DCT path's (coef, qtab) image tuple must globalize
    element-wise (the multi-host adapter's tuple branch)."""
    import jax
    from tf_face_toolbox_tpu.parallel.mesh import (
        create_mesh, globalize_host_batches)

    coef = np.zeros((8, 2, 2, 3, 64), np.int16)
    qtab = np.ones((8, 3, 64), np.uint16)
    batches = iter([{"image": (coef, qtab),
                     "label": np.arange(8, dtype=np.int32),
                     "epoch": 0, "step": 0}])
    b = next(globalize_host_batches(batches, create_mesh()))
    assert isinstance(b["image"], tuple) and len(b["image"]) == 2
    for got, want in zip(b["image"], (coef, qtab)):
        assert isinstance(got, jax.Array)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_shard_writer_streaming(tmp_path):
    from tf_face_toolbox_tpu.data.format import ShardWriter, read_index, ShardReader
    path = str(tmp_path / "stream.faceshard")
    with ShardWriter(path) as w:
        for i in range(5):
            w.add(bytes([i]) * (i + 1), i * 2)
    idx = read_index(path)
    assert idx.count == 5
    r = ShardReader(idx)
    assert r.blob(3) == bytes([3]) * 4
    assert r.label(3) == 6
    # temp files cleaned up
    assert not any(f.endswith(".tmp") for f in
                   __import__("os").listdir(tmp_path))


def test_truncation_fuzz_both_readers(tmp_path):
    """Every truncation of a valid shard must fail CLEANLY in both the
    Python reader and the native C++ loader — an exception or per-
    record failure, never a crash/hang/silent short read (production
    shards live on networks; partial copies happen)."""
    from PIL import Image
    import io as io_mod

    from tf_face_toolbox_tpu.data import native
    from tf_face_toolbox_tpu.data.format import (
        PAYLOAD_JPEG, read_index, ShardReader, write_shard)

    rng = np.random.default_rng(3)
    blobs = []
    for i in range(6):
        buf = io_mod.BytesIO()
        Image.fromarray(rng.integers(0, 256, (16, 16, 3), np.uint8)
                        ).save(buf, "JPEG", quality=90)
        blobs.append(buf.getvalue())
    path = str(tmp_path / "full.faceshard")
    write_shard(path, blobs, list(range(6)), payload=PAYLOAD_JPEG)
    full = open(path, "rb").read()

    rf = native.NativeShardReader(path, num_threads=0) \
        if native.native_available() else None
    full_decode = (rf.decode_batch(list(range(6)), 16, 16)
                   if rf else None)
    if rf:
        rf.close()

    cuts = sorted(set(
        list(range(0, 40, 7))                       # inside the header
        + list(rng.integers(40, len(full), 25))     # index/payload
        + [len(full) - 1]))
    trunc = str(tmp_path / "trunc.faceshard")
    for cut in cuts:
        open(trunc, "wb").write(full[:cut])
        # Python reader: reading the index/blobs may fail (clean); a
        # blob that comes back SHORTER than the original must then
        # fail to decode — a short blob decoding "fine" would be the
        # silent-corruption case this test exists to catch
        try:
            idx = read_index(trunc)
            reader = ShardReader(idx)
            got_blobs = [reader.blob(i) for i in range(int(idx.count))]
        except Exception:
            got_blobs = None  # clean refusal
        if got_blobs is not None:
            for i, blob in enumerate(got_blobs):
                if blob == blobs[i]:
                    continue  # record untouched by this cut
                try:
                    got_px = np.asarray(Image.open(
                        io_mod.BytesIO(blob)).convert("RGB"))
                except Exception:
                    continue  # clean decode failure
                # decoder leniency is only acceptable if the pixels
                # are STILL the original's — else silent corruption
                want_px = np.asarray(Image.open(
                    io_mod.BytesIO(blobs[i])).convert("RGB"))
                np.testing.assert_array_equal(
                    got_px, want_px,
                    err_msg=f"cut={cut}: blob {i} decoded to wrong "
                            "pixels silently")
        # Native loader: fs_open rejects, decode reports failures, or —
        # only if every record was untouched — pixels match exactly
        if native.native_available():
            try:
                r = native.NativeShardReader(trunc, num_threads=0)
            except OSError:
                continue  # clean open-time rejection
            try:
                out = r.decode_batch(list(range(r.count)), 16, 16)
            except ValueError:
                continue  # clean per-record failure report
            finally:
                r.close()
            np.testing.assert_array_equal(
                out, full_decode,
                err_msg=f"cut={cut}: silent short read in native decode")


def test_merge_shards_roundtrip(tmp_path):
    """Parallel-pack workflow: chunks merged == one-shot pack; relabel
    keeps per-chunk id spaces disjoint; mismatched inputs refused."""
    import subprocess
    import sys
    import os as os_mod

    from tf_face_toolbox_tpu.data.format import merge_shards

    from PIL import Image
    rng = np.random.default_rng(4)
    all_blobs, all_labels, chunks = [], [], []
    for c in range(3):
        blobs, labels = [], []
        for i in range(4):
            buf = io.BytesIO()
            Image.fromarray(rng.integers(0, 256, (8, 8, 3), np.uint8)
                            ).save(buf, "JPEG")
            blobs.append(buf.getvalue())
            labels.append(i % 2)  # every chunk numbers ids from 0
        p = str(tmp_path / f"chunk{c}.faceshard")
        write_shard(p, blobs, labels, payload=PAYLOAD_JPEG)
        chunks.append(p)
        all_blobs += blobs
        all_labels += labels

    out = str(tmp_path / "merged.faceshard")
    n = merge_shards(chunks, out)
    assert n == 12
    idx = read_index(out)
    r = ShardReader(idx)
    for i in range(12):
        assert r.blob(i) == all_blobs[i]
    np.testing.assert_array_equal(idx.labels, all_labels)

    out2 = str(tmp_path / "relabel.faceshard")
    merge_shards(chunks, out2, relabel=True)
    labels2 = read_index(out2).labels
    # chunk c's ids shift to [2c, 2c+1] — globally disjoint
    np.testing.assert_array_equal(
        labels2, np.concatenate([np.array([0, 1, 0, 1]) + 2 * c
                                 for c in range(3)]))

    # payload-type mismatch is refused, nothing half-written
    rawp = str(tmp_path / "raw.faceshard")
    pack_arrays(rawp, np.zeros((2, 8, 8, 3), np.uint8), [0, 1])
    with pytest.raises(ValueError, match="mismatch"):
        merge_shards([chunks[0], rawp], str(tmp_path / "bad.faceshard"))
    assert not os_mod.path.exists(str(tmp_path / "bad.faceshard"))

    # CLI e2e
    env = dict(os_mod.environ, TFFT_PLATFORM="cpu")
    res = subprocess.run(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.merge",
         f"--inputs={','.join(chunks)}",
         f"--output={tmp_path}/cli.faceshard", "--relabel"],
        capture_output=True, text=True, env=env)
    assert res.returncode == 0, res.stderr[-1500:]
    assert "merged 3 shards (12 records)" in res.stdout


def _two_shards(tmp_path, na=12, nb=8):
    rng = np.random.default_rng(11)
    a = str(tmp_path / "a.faceshard")
    b = str(tmp_path / "b.faceshard")
    pack_arrays(a, rng.integers(0, 256, (na, 8, 8, 3), dtype=np.uint8),
                (np.arange(na) % 3).astype(np.int32))   # classes 0..2
    pack_arrays(b, rng.integers(0, 256, (nb, 8, 8, 3), dtype=np.uint8),
                (np.arange(nb) % 2).astype(np.int32))   # classes 0..1
    return a, b


def test_mixed_iterator_offsets_and_weights(tmp_path):
    from tf_face_toolbox_tpu.data.pipeline import mixed_batch_iterator

    a, b = _two_shards(tmp_path)
    it = mixed_batch_iterator([a, b], 4, seed=3, num_threads=1)
    seen = {0: set(), 1: set()}
    sources = []
    for _ in range(40):
        batch = next(it)
        sources.append(batch["source"])
        seen[batch["source"]].update(batch["label"].tolist())
    # both sources drawn; disjoint identity spaces: shard B's classes
    # 0..1 are offset past shard A's 0..2
    assert set(sources) == {0, 1}
    assert seen[0] <= {0, 1, 2}
    assert seen[1] <= {3, 4}
    # weighted draw shifts the ratio the right way
    it = mixed_batch_iterator([a, b], 4, weights=(10, 1), seed=3,
                              num_threads=1)
    s = [next(it)["source"] for _ in range(60)]
    assert s.count(0) > 45


def test_mixed_iterator_resume_exact(tmp_path):
    from tf_face_toolbox_tpu.data.pipeline import mixed_batch_iterator

    a, b = _two_shards(tmp_path)
    fresh = mixed_batch_iterator([a, b], 4, weights=(2, 1), seed=5,
                                 num_threads=1)
    want = [next(fresh) for _ in range(10)]
    resumed = mixed_batch_iterator([a, b], 4, weights=(2, 1), seed=5,
                                   start_step=6, num_threads=1)
    for t in range(6, 10):
        got = next(resumed)
        assert got["source"] == want[t]["source"], t
        np.testing.assert_array_equal(got["image"], want[t]["image"])
        np.testing.assert_array_equal(got["label"], want[t]["label"])


def test_mixed_iterator_refusals(tmp_path):
    import pytest

    from tf_face_toolbox_tpu.data.pipeline import mixed_batch_iterator

    a, b = _two_shards(tmp_path)
    with pytest.raises(ValueError, match=">= 2"):
        next(mixed_batch_iterator([a], 4))
    with pytest.raises(ValueError, match="weights"):
        next(mixed_batch_iterator([a, b], 4, weights=(1.0,)))
    with pytest.raises(ValueError, match="smaller than one batch"):
        next(mixed_batch_iterator([a, b], 64, num_threads=1))
