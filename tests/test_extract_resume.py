"""Resumable bulk extraction (extract.extract_shard_to_npy) and row-
range extraction — the crash-safe path for corpus-scale feature dumps."""

import json
import os

import jax
import numpy as np
import pytest

from tf_face_toolbox_tpu.data.pipeline import FaceShardSource
from tf_face_toolbox_tpu.extract import (
    extract_shard,
    extract_shard_to_npy,
    make_extract_fn,
)
from tf_face_toolbox_tpu.models import create_network, init_variables


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import io

    from PIL import Image

    from tf_face_toolbox_tpu.data.format import write_shard

    tmp = tmp_path_factory.mktemp("resume")
    rng = np.random.default_rng(0)
    blobs = []
    for i in range(22):
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=95)
        blobs.append(buf.getvalue())
    shard = str(tmp / "faces.faceshard")
    write_shard(shard, blobs, list(range(22)))

    net = create_network("resnet_tiny", embedding_dim=8)
    variables = init_variables(net, jax.random.key(0), (1, 12, 12, 3))
    return tmp, shard, net, variables


def _extract_args():
    return dict(image_size=12, crop_from=16, batch=4, num_threads=1)


def test_resumable_equals_oneshot(setup):
    tmp, shard, net, variables = setup
    src = FaceShardSource(shard)
    ref = extract_shard(net, variables, src, **_extract_args())
    out = str(tmp / "a.npy")
    got = extract_shard_to_npy(net, variables, src, out,
                               chunk_rows=8, **_extract_args())
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)
    # sidecar KEPT on completion: an idempotent retry of a finished job
    # must skip everything, not re-extract the corpus
    side = json.load(open(out + ".progress.json"))
    assert side["done"] == [0, 8, 16]
    # the finished file is a plain .npy
    np.testing.assert_allclose(np.load(out), ref, rtol=1e-6)


def test_crash_resume_skips_done_chunks(setup):
    tmp, shard, net, variables = setup
    src = FaceShardSource(shard)
    ref = extract_shard(net, variables, src, **_extract_args())
    out = str(tmp / "b.npy")

    fn = make_extract_fn(net, donate=False)
    calls = {"n": 0}

    def dying_fn(v, x):
        calls["n"] += 1
        if calls["n"] > 3:  # chunk_rows=8 / batch=4 -> dies in chunk 2
            raise RuntimeError("simulated preemption")
        return fn(v, x)

    with pytest.raises(RuntimeError, match="preemption"):
        extract_shard_to_npy(net, variables, src, out, chunk_rows=8,
                             extract_fn=dying_fn, **_extract_args())
    side = json.load(open(out + ".progress.json"))
    assert side["done"] == [0]  # first chunk committed, second lost

    def counting_fn(v, x):
        calls["n"] += 1
        return fn(v, x)

    calls["n"] = 0
    got = extract_shard_to_npy(net, variables, src, out, chunk_rows=8,
                               extract_fn=counting_fn, **_extract_args())
    # 22 rows, chunks [0:8) done, [8:16) + [16:22) remain = 2+2 batches
    assert calls["n"] == 4
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)

    # retry AFTER success: every chunk recorded done -> zero recompute
    calls["n"] = 0
    got = extract_shard_to_npy(net, variables, src, out, chunk_rows=8,
                               extract_fn=counting_fn, **_extract_args())
    assert calls["n"] == 0
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)


def test_rows_subset_oneshot(setup):
    tmp, shard, net, variables = setup
    src = FaceShardSource(shard)
    ref = extract_shard(net, variables, src, **_extract_args())
    sub = extract_shard(net, variables, src, rows=(4, 12),
                        **_extract_args())
    np.testing.assert_allclose(sub, ref[4:12], rtol=1e-6)
    with pytest.raises(ValueError, match="out of range"):
        extract_shard(net, variables, src, rows=(0, 99),
                      **_extract_args())


def test_rows_land_at_offsets_in_chunked_output(setup):
    tmp, shard, net, variables = setup
    src = FaceShardSource(shard)
    ref = extract_shard(net, variables, src, **_extract_args())
    out = str(tmp / "c.npy")
    extract_shard_to_npy(net, variables, src, out, chunk_rows=8,
                         rows=(8, 22), **_extract_args())
    got = np.load(out)
    assert got.shape == ref.shape  # full-length file
    np.testing.assert_allclose(got[8:22], ref[8:22], rtol=1e-6)
    assert np.all(got[:8] == 0)  # untouched range stays zero
    # partial-range runs keep a RANGE-SCOPED sidecar (another range job
    # must not clobber this one's resume state)
    assert os.path.exists(out + ".rows8-22.progress.json")
    assert not os.path.exists(out + ".progress.json")


def test_chunk_rows_align_to_batch(setup):
    tmp, shard, net, variables = setup
    src = FaceShardSource(shard)
    ref = extract_shard(net, variables, src, **_extract_args())
    out = str(tmp / "d.npy")
    # 10 % 4 != 0 -> rounded down to 8; result must still be exact
    got = extract_shard_to_npy(net, variables, src, out, chunk_rows=10,
                               **_extract_args())
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)


def test_sequential_ranges_fill_one_file(setup):
    tmp, shard, net, variables = setup
    src = FaceShardSource(shard)
    ref = extract_shard(net, variables, src, **_extract_args())
    out = str(tmp / "f.npy")
    extract_shard_to_npy(net, variables, src, out, chunk_rows=8,
                         rows=(0, 8), **_extract_args())
    extract_shard_to_npy(net, variables, src, out, chunk_rows=8,
                         rows=(8, 22), **_extract_args())
    np.testing.assert_allclose(np.load(out), ref, rtol=1e-6)


def test_range_jobs_keep_independent_resume_state(setup):
    """Job A (rows 0:8) crashes; job B (rows 8:22) completes; job A's
    retry must still skip its committed chunks — range-scoped sidecars
    mean B never overwrote A's progress."""
    tmp, shard, net, variables = setup
    src = FaceShardSource(shard)
    ref = extract_shard(net, variables, src, **_extract_args())
    out = str(tmp / "h.npy")
    fn = make_extract_fn(net, donate=False)
    calls = {"n": 0}

    def dying_fn(v, x):
        calls["n"] += 1
        if calls["n"] > 1:  # chunk [0:4) commits, then die
            raise RuntimeError("simulated preemption")
        return fn(v, x)

    with pytest.raises(RuntimeError, match="preemption"):
        extract_shard_to_npy(net, variables, src, out, chunk_rows=4,
                             rows=(0, 8), extract_fn=dying_fn,
                             **_extract_args())
    # job B, a different range, runs to completion in between
    extract_shard_to_npy(net, variables, src, out, chunk_rows=4,
                         rows=(8, 22), **_extract_args())

    def counting_fn(v, x):
        calls["n"] += 1
        return fn(v, x)

    calls["n"] = 0
    extract_shard_to_npy(net, variables, src, out, chunk_rows=4,
                         rows=(0, 8), extract_fn=counting_fn,
                         **_extract_args())
    assert calls["n"] == 1  # only the lost chunk [4:8) recomputed
    np.testing.assert_allclose(np.load(out), ref, rtol=1e-6)


def test_fingerprint_mismatch_recomputes(setup):
    """Resuming with a different model identity must NOT splice new
    chunks into old ones — the whole range recomputes."""
    tmp, shard, net, variables = setup
    src = FaceShardSource(shard)
    out = str(tmp / "i.npy")
    fn = make_extract_fn(net, donate=False)
    calls = {"n": 0}

    def dying_fn(v, x):
        calls["n"] += 1
        if calls["n"] > 3:
            raise RuntimeError("simulated preemption")
        return fn(v, x)

    with pytest.raises(RuntimeError, match="preemption"):
        extract_shard_to_npy(net, variables, src, out, chunk_rows=8,
                             extract_fn=dying_fn, fingerprint="model-A",
                             **_extract_args())
    assert json.load(open(out + ".progress.json"))["done"] == [0]

    def counting_fn(v, x):
        calls["n"] += 1
        return fn(v, x)

    calls["n"] = 0
    extract_shard_to_npy(net, variables, src, out, chunk_rows=8,
                         extract_fn=counting_fn, fingerprint="model-B",
                         **_extract_args())
    assert calls["n"] == 6  # all 22 rows recomputed, nothing reused


def test_existing_incompatible_file_raises(setup):
    tmp, shard, net, variables = setup
    src = FaceShardSource(shard)
    out = str(tmp / "g.npy")
    np.save(out, np.zeros((3, 8), np.float32))  # wrong row count
    with pytest.raises(ValueError, match="incompatible"):
        extract_shard_to_npy(net, variables, src, out, chunk_rows=8,
                             **_extract_args())


def test_rejects_non_npy_output(setup):
    tmp, shard, net, variables = setup
    src = FaceShardSource(shard)
    with pytest.raises(ValueError, match="npy"):
        extract_shard_to_npy(net, variables, src, str(tmp / "e.mat"),
                             **_extract_args())
