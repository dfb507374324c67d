"""r5 gallery semantics: O(1) tombstone deenroll + the readers/writer
gate (VERDICT r4 #4; advisor r4 high-severity races).

Exactness contract: after remove(), every search program — XLA plain /
scan / streamed / both Pallas kernels, all three dtypes — must return
exactly what a fresh gallery enrolled without the removed rows returns,
WITHOUT the store re-uploading (the r4 behavior this replaces was a
full re-sync per remove: minutes at 10^7 rows over the tunnel).

Concurrency contract: /identify racing /enroll//deenroll must never
see a donated-away device buffer ("Array has been deleted", HTTP 500
pre-r5) or half-compacted host arrays.
"""

import threading

import numpy as np
import pytest

from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

DIM = 64


def _unit(n, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(n, DIM)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


def _oracle(e, labels, probes, k, dtype="float32", block=8):
    ref = DeviceGallery(DIM, block=block, dtype=dtype)
    ref.enroll(e, labels)
    return ref.search(probes, k=k)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_tombstone_remove_matches_oracle(dtype):
    """Below the compaction threshold, remove() tombstones (no device
    re-upload) and every subsequent search is exact vs a gallery that
    never contained the rows."""
    e = _unit(40)
    probes = _unit(6, seed=1)
    g = DeviceGallery(DIM, block=32, dtype=dtype)   # threshold = 32
    g.enroll(e, np.arange(40))
    dev_before = g._dev
    assert g.remove(7) == 1
    assert g.remove(7) == 0                 # idempotent
    assert g.remove(23) == 1
    assert g._tomb == 2 and g._n == 40      # tombstoned, not compacted
    assert g._dev is dev_before             # O(1): store not re-synced
    assert len(g) == 38
    keep = ~np.isin(np.arange(40), [7, 23])
    want_l, want_s = _oracle(e[keep], np.arange(40)[keep], probes, 5,
                             dtype=dtype)
    got_l, got_s = g.search(probes, k=5)
    np.testing.assert_array_equal(want_l, got_l)
    np.testing.assert_allclose(want_s, got_s, atol=3e-3)
    # the removed identity itself can never surface, even as its own
    # best match
    labs, _ = g.search(e[7], k=38)
    assert 7 not in labs


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_scan_program_masks_tombstones(dtype):
    """The lax.scan OOM-guard program slices the bias alongside the
    store chunks — tombstones must mask in every chunk."""
    e = _unit(37, seed=3)
    g = DeviceGallery(DIM, block=8, dtype=dtype)
    g.compact_frac = 0.9                    # keep the tombstone path
    g.scan_sims_bytes = 8 * 4               # force 8-row scan chunks
    g.enroll(e, np.arange(37))
    g.remove(12)
    g.remove(30)
    assert g._tomb == 2
    keep = ~np.isin(np.arange(37), [12, 30])
    want_l, want_s = _oracle(e[keep], np.arange(37)[keep], e[:5], 4,
                             dtype=dtype)
    got_l, got_s = g.search(e[:5], k=4)
    np.testing.assert_array_equal(want_l, got_l)
    np.testing.assert_allclose(want_s, got_s, atol=1e-6)


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_pallas_kernel_masks_tombstones(dtype):
    """Both Pallas kernels take the bias input (interpret mode on
    CPU); tombstoned rows must never surface from the kernel path."""
    e = _unit(40, seed=4)
    g = DeviceGallery(DIM, block=1024, dtype=dtype)
    g.use_pallas = True
    g.compact_frac = 0.9
    g.enroll(e, np.arange(40))
    g.remove(0)
    g.remove(19)
    assert g._tomb == 2 and g._pallas_fails == 0
    keep = ~np.isin(np.arange(40), [0, 19])
    want_l, want_s = _oracle(e[keep], np.arange(40)[keep], e[:6], 4,
                             dtype=dtype)
    got_l, got_s = g.search(e[:6], k=4)
    assert g._pallas_fails == 0             # kernel path actually ran
    np.testing.assert_array_equal(want_l, got_l)
    np.testing.assert_allclose(want_s, got_s, atol=1e-5)


def test_streaming_remove_tombstones(dtype="float32"):
    """Streamed search applies the host bias per slab; a remove in
    streaming mode is a pure host tombstone (no device store at all)."""
    e = _unit(40, seed=5)
    limit = 8 * DIM * 4 / 1e9
    g = DeviceGallery(DIM, block=8, hbm_limit_gb=limit,
                      overflow="stream")
    g.stream_slab_bytes = 8 * DIM * 4       # 8-row slabs
    g.compact_frac = 0.9
    g.enroll(e, np.arange(40))
    assert g.streaming
    g.remove(3)
    g.remove(38)
    assert g.streaming and g._tomb == 2     # still over the bound
    keep = ~np.isin(np.arange(40), [3, 38])
    want_l, want_s = _oracle(e[keep], np.arange(40)[keep], e[10:13], 5)
    got_l, got_s = g.search(e[10:13], k=5)
    np.testing.assert_array_equal(want_l, got_l)
    np.testing.assert_allclose(want_s, got_s, atol=1e-6)


def test_compaction_threshold_and_exactness():
    """Crossing compact_frac triggers the rebuild: tombstones drop to
    zero, the fill shrinks, and results are unchanged."""
    e = _unit(40, seed=6)
    g = DeviceGallery(DIM, block=4)
    g.enroll(e, np.arange(40))
    for lab in range(9):                    # threshold max(4, 10) = 10
        g.remove(lab)
    assert g._tomb == 9 and g._n == 40
    g.remove(9)                             # 10th crosses → compacts
    assert g._tomb == 0 and g._n == 30
    assert len(g) == 30
    want_l, want_s = _oracle(e[10:], np.arange(10, 40), e[15:18], 5)
    got_l, got_s = g.search(e[15:18], k=5)
    np.testing.assert_array_equal(want_l, got_l)
    np.testing.assert_allclose(want_s, got_s, atol=1e-6)


def test_enroll_reclaims_tombstones_before_refusing():
    """An enroll that would exceed hbm_limit_gb first compacts away
    dead rows; it only refuses if the LIVE store truly does not fit."""
    from tf_face_toolbox_tpu.serving.gallery import GalleryCapacityError

    limit = 8 * DIM * 4 / 1e9               # exactly one 8-row block
    g = DeviceGallery(DIM, block=8, hbm_limit_gb=limit)
    e = _unit(9, seed=7)
    g.enroll(e[:8], np.arange(8))
    g.remove(2)                             # tombstone (threshold 8)
    assert g._tomb == 1
    g.enroll(e[8:], [100])                  # 9 rows of fill → compacts
    assert g._tomb == 0 and len(g) == 8
    labs, _ = g.search(e[8], k=1)
    assert labs[0, 0] == 100
    with pytest.raises(GalleryCapacityError):
        g.enroll(_unit(1, seed=8), [101])   # live store genuinely full


def test_save_excludes_tombstones(tmp_path):
    e = _unit(12, seed=9)
    g = DeviceGallery(DIM, block=32)
    g.enroll(e, np.arange(12))
    g.remove(5)
    p = str(tmp_path / "g.npz")
    assert g.save(p) == 11
    g2 = DeviceGallery.load(p)
    assert len(g2) == 11
    labs, _ = g2.search(e[6], k=1)
    assert labs[0, 0] == 6
    labs, _ = g2.search(e[5], k=11)
    assert 5 not in labs


def test_reenroll_after_remove():
    e = _unit(10, seed=10)
    g = DeviceGallery(DIM, block=32)
    g.enroll(e, np.arange(10))
    g.remove(4)
    assert len(g) == 9
    g.enroll(e[4], [4])                     # same identity, new row
    assert len(g) == 10
    labs, scores = g.search(e[4], k=1)
    assert labs[0, 0] == 4
    assert scores[0, 0] == pytest.approx(1.0, abs=1e-5)


def test_pallas_backoff_cooldown_and_permanent():
    """Advisor r4: one Mosaic failure must not disable the kernel for
    life — 32-search cooldown, permanent only after 3 strikes."""
    g = DeviceGallery(DIM, block=1024)
    g.use_pallas = True
    g.enroll(_unit(5), np.arange(5))
    assert g._pallas_ok(g._dev, 1)
    g._pallas_backoff("test")               # strike 1
    assert g._pallas_fails == 1 and g._pallas_cooldown == 32
    for _ in range(32):                     # cooldown drains per check
        assert not g._pallas_ok(g._dev, 1)
    assert g._pallas_ok(g._dev, 1)          # recovered
    g._pallas_backoff("test")
    g._pallas_backoff("test")               # strike 3 → permanent
    g._pallas_cooldown = 0
    assert not g._pallas_ok(g._dev, 1)


def test_concurrent_search_enroll_remove():
    """The advisor r4 races: searches racing enrolls (donated store)
    and removes (host mutation). Pre-r5 this raised 'Array has been
    deleted' / returned wrong labels; the readers/writer gate must
    keep every result exact for the rows it can see."""
    e = _unit(400, seed=11)
    g = DeviceGallery(DIM, block=16)
    g.enroll(e[:64], np.arange(64))
    errors = []
    stop = threading.Event()

    def searcher():
        try:
            while not stop.is_set():
                probe_idx = np.random.default_rng().integers(0, 32)
                labs, scores = g.search(e[probe_idx], k=1)
                # rows 0..31 are never removed: their self-match must
                # always be exact regardless of concurrent writes
                assert labs[0, 0] == probe_idx, (labs, probe_idx)
                assert scores[0, 0] == pytest.approx(1.0, abs=1e-5)
        except Exception as exc:    # noqa: BLE001 - collected for assert
            errors.append(exc)

    def writer():
        try:
            nxt = 64
            for i in range(40):
                g.enroll(e[nxt:nxt + 4], np.arange(nxt, nxt + 4))
                nxt += 4
                if i % 3 == 2:
                    g.remove(nxt - 2)       # tombstone/compact mix
        except Exception as exc:    # noqa: BLE001
            errors.append(exc)
        finally:
            stop.set()

    threads = [threading.Thread(target=searcher) for _ in range(4)]
    threads.append(threading.Thread(target=writer))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    # final state is coherent
    labs, _ = g.search(e[0], k=1)
    assert labs[0, 0] == 0
