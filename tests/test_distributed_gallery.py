"""DistributedGallery: mesh-sharded 1:N store on the fake 8-device mesh.

The striped-shard store must be EXACTLY the single-device DeviceGallery
in results (modulo bf16 rounding, which on the CPU backend — unlike TPU
— rounds the matmul operands) while scaling capacity to n_dev x the
per-device bound. Runs on the conftest's 8 virtual CPU devices
(SURVEY.md §4 "distributed without a cluster").
"""

import numpy as np
import pytest

from tf_face_toolbox_tpu.parallel.mesh import create_mesh
from tf_face_toolbox_tpu.serving.distributed_gallery import (
    DistributedGallery,
)
from tf_face_toolbox_tpu.serving.gallery import (
    DeviceGallery,
    GalleryCapacityError,
)

DIM = 64


@pytest.fixture(scope="module")
def mesh():
    return create_mesh()        # all 8 fake devices on the data axis


def _unit(n, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(n, DIM)).astype(np.float32)
    return e / np.linalg.norm(e, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def reference():
    """Single-device f32 oracle over the shared 45-row corpus."""
    e = _unit(45)
    ref = DeviceGallery(DIM, block=8)
    ref.enroll(e, np.arange(45))
    probes = _unit(5, seed=1)
    labs, scores = ref.search(probes, k=6)
    return e, probes, labs, scores


@pytest.mark.parametrize("dtype,atol,exact_labels", [
    ("float32", 2e-6, True),
    # CPU bf16 rounds operands (TPU matmuls are bf16-pass either way,
    # measured bit-identical on hardware — DeviceGallery docstring);
    # rank-1 must still hold on this corpus, scores within bf16 ulp
    ("bfloat16", 3e-3, False),
    # int8 is two-stage exact-rescored: final scores are exact f32
    ("int8", 2e-6, True),
])
def test_matches_single_device(mesh, reference, dtype, atol,
                               exact_labels):
    e, probes, want_l, want_s = reference
    g = DistributedGallery(DIM, mesh=mesh, block=4, dtype=dtype)
    # incremental enrolls: 7-row steps cross per-shard block
    # boundaries (45 rows / 8 shards at block=4 grows 4 -> 8)
    for i in range(0, 45, 7):
        g.enroll(e[i:i + 7], np.arange(i, min(i + 7, 45)))
    assert len(g) == 45
    got_l, got_s = g.search(probes, k=6)
    if exact_labels:
        np.testing.assert_array_equal(want_l, got_l)
    else:
        np.testing.assert_array_equal(want_l[:, 0], got_l[:, 0])
    np.testing.assert_allclose(want_s, got_s, atol=atol)


def test_incremental_equals_bulk(mesh, reference):
    """The striped append/grow path == one bulk enroll, bit for bit."""
    e, probes, _, _ = reference
    bulk = DistributedGallery(DIM, mesh=mesh, block=4)
    bulk.enroll(e, np.arange(45))
    inc = DistributedGallery(DIM, mesh=mesh, block=4)
    for i in range(0, 45, 3):
        inc.enroll(e[i:i + 3], np.arange(i, min(i + 3, 45)))
    lb, sb = bulk.search(probes, k=5)
    li, si = inc.search(probes, k=5)
    np.testing.assert_array_equal(lb, li)
    np.testing.assert_allclose(sb, si, atol=1e-6)


@pytest.mark.parametrize("step", [1, 2, 3, 5, 11])
def test_striped_layout_invariant(mesh, step):
    """Every enroll cadence leaves device row ``s*cap + j`` holding
    global row ``j*n_dev + s`` exactly. Guards the scatter-drop append:
    dynamic_update_slice CLAMPS out-of-bounds starts, so zero padding
    for shards receiving < r_max rows used to clobber full shards'
    valid slots (caught by this invariant at step=3)."""
    e = _unit(45, seed=7)
    g = DistributedGallery(DIM, mesh=mesh, block=4)
    for i in range(0, 45, step):
        g.enroll(e[i:i + step], np.arange(i, min(i + step, 45)))
    dev = np.asarray(g._dev)
    cap = dev.shape[0] // g.n_dev
    for idx in range(45):
        s, j = idx % g.n_dev, idx // g.n_dev
        np.testing.assert_allclose(dev[s * cap + j], e[idx], atol=1e-6,
                                   err_msg=f"row {idx} (step {step})")


def test_host_reupload_grow_path(mesh, reference):
    """grow_on_device_max=0 forces every block-boundary growth through
    the full host re-stripe (the 2x-HBM-peak avoidance path for huge
    shards); results must not change."""
    e, probes, want_l, want_s = reference
    g = DistributedGallery(DIM, mesh=mesh, block=4)
    g.grow_on_device_max = 0
    for i in range(0, 45, 7):
        g.enroll(e[i:i + 7], np.arange(i, min(i + 7, 45)))
    got_l, got_s = g.search(probes, k=6)
    np.testing.assert_array_equal(want_l, got_l)
    np.testing.assert_allclose(want_s, got_s, atol=2e-6)


def test_probe_chunk_guard_exact(mesh, reference):
    """Shrunk sims-bytes guard forces the host probe-chunk loop; the
    chunked search is exact (it is the same program per chunk)."""
    e, probes, want_l, want_s = reference
    g = DistributedGallery(DIM, mesh=mesh, block=4)
    g.sims_bytes_guard = 4 * DIM          # ~1 probe per chunk
    g.enroll(e, np.arange(45))
    got_l, got_s = g.search(probes, k=6)
    np.testing.assert_array_equal(want_l, got_l)
    np.testing.assert_allclose(want_s, got_s, atol=2e-6)


def test_fewer_rows_than_shards(mesh):
    """n < n_dev: empty shards mask to -2e9 and can never surface."""
    e = _unit(3, seed=2)
    g = DistributedGallery(DIM, mesh=mesh, block=4)
    g.enroll(e, [10, 11, 12])
    labs, scores = g.search(e[1], k=3)
    assert labs[0, 0] == 11
    assert scores[0, 0] == pytest.approx(1.0, abs=1e-5)
    assert labs.shape == (1, 3)
    assert np.all(np.diff(scores[0]) <= 1e-6)          # descending
    # every returned row is a real enrollment, never a padded slot
    assert set(labs[0]) == {10, 11, 12}


def test_k_spans_shards(mesh, reference):
    """k > the fullest shard's fill: per-shard top-min(k, cap) must
    still merge to the exact global top-k (candidates span shards)."""
    e, probes, _, _ = reference
    ref = DeviceGallery(DIM, block=8)
    ref.enroll(e, np.arange(45))
    g = DistributedGallery(DIM, mesh=mesh, block=4)
    g.enroll(e, np.arange(45))
    want_l, want_s = ref.search(probes, k=20)          # > 45/8 per shard
    got_l, got_s = g.search(probes, k=20)
    np.testing.assert_array_equal(want_l, got_l)
    np.testing.assert_allclose(want_s, got_s, atol=2e-6)


def test_remove_restripes(mesh, reference):
    e, probes, _, _ = reference
    g = DistributedGallery(DIM, mesh=mesh, block=4)
    g.enroll(e, np.arange(45))
    assert g.remove(11) == 1
    assert g.remove(11) == 0
    assert len(g) == 44
    labs, _ = g.search(e[12], k=1)
    assert labs[0, 0] == 12
    # compaction renumbered rows; the oracle agrees post-removal
    ref = DeviceGallery(DIM, block=8)
    ref.enroll(np.delete(e, 11, axis=0),
               np.delete(np.arange(45), 11))
    want_l, want_s = ref.search(probes, k=6)
    got_l, got_s = g.search(probes, k=6)
    np.testing.assert_array_equal(want_l, got_l)
    np.testing.assert_allclose(want_s, got_s, atol=2e-6)


def test_capacity_refusal_per_device(mesh):
    # 4-row blocks x 64-d f32 = 1 KiB/shard limit -> 32 rows fit
    lim = 4 * DIM * 4 / 1e9
    g = DistributedGallery(DIM, mesh=mesh, block=4, dtype="float32",
                           hbm_limit_gb=lim)
    g.enroll(_unit(32, seed=3), np.arange(32))
    with pytest.raises(GalleryCapacityError, match="each of the 8"):
        g.enroll(_unit(8, seed=4), np.arange(8))
    assert len(g) == 32                   # refused enroll left no trace
    assert g.device_bytes() == 8 * 4 * DIM * 4


def test_save_load_interchange(mesh, tmp_path, reference):
    """Snapshots are the same .npz either way: enroll on a mesh, serve
    on one chip, or vice versa."""
    e, _, _, _ = reference
    g = DistributedGallery(DIM, mesh=mesh, block=4)
    g.enroll(e[:10], np.arange(10))
    p = str(tmp_path / "g.npz")
    assert g.save(p) == 10
    single = DeviceGallery.load(p, block=8)
    assert len(single) == 10
    back = DistributedGallery.load(p, mesh=mesh, block=4,
                                   dtype="bfloat16")
    labs, _ = back.search(e[7], k=1)
    assert labs[0, 0] == 7


def test_duck_type_surface(mesh):
    """The daemon duck-types gallery stores; the sharded one must
    carry the whole surface server.py reads."""
    g = DistributedGallery(DIM, mesh=mesh)
    assert g.overflow == "refuse"
    assert g.streaming is False
    assert g.dim == DIM and g.dtype == "float32"
    assert g.hbm_limit_gb == 8.0
    assert len(g) == 0
    with pytest.raises(ValueError, match="empty"):
        g.search(np.zeros((1, DIM), np.float32))
    with pytest.raises(ValueError, match="dim"):
        g.enroll(np.zeros((1, DIM + 1), np.float32), [0])


# ----------------------------------------------------------- r5 additions


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_dist_pallas_equals_xla_search(mesh, dtype):
    """VERDICT r4 #1: the fused Pallas kernel runs INSIDE the
    shard_map local (per-shard fill = ceil((n-s)/n_dev) is exactly the
    kernel's n_valid contract). Kernel and XLA sharded programs must
    agree exactly, across fills and after tombstoning removes."""
    e = _unit(60, seed=21)
    probes = _unit(7, seed=22)
    kw = dict(mesh=mesh, block=1024, dtype=dtype)   # kernel-shaped cap
    xla = DistributedGallery(DIM, **kw)
    pal = DistributedGallery(DIM, **kw)
    xla.use_pallas = False
    pal.use_pallas = True
    for lo in (0, 13, 45):                  # three fill levels
        hi = {0: 13, 13: 45, 45: 60}[lo]
        xla.enroll(e[lo:hi], np.arange(lo, hi))
        pal.enroll(e[lo:hi], np.arange(lo, hi))
        lx, sx = xla.search(probes, k=6)
        lp, sp = pal.search(probes, k=6)
        assert pal._pallas_fails == 0       # kernel path actually ran
        np.testing.assert_array_equal(lx, lp)
        np.testing.assert_allclose(sx, sp, atol=1e-5)
    # tombstones mask identically through both programs
    for lab in (3, 59):
        assert xla.remove(lab) == 1 and pal.remove(lab) == 1
    assert pal._tomb == 2                   # tombstoned, not compacted
    lx, sx = xla.search(probes, k=6)
    lp, sp = pal.search(probes, k=6)
    assert pal._pallas_fails == 0
    np.testing.assert_array_equal(lx, lp)
    np.testing.assert_allclose(sx, sp, atol=1e-5)
    labs, _ = pal.search(e[3], k=20)
    assert 3 not in labs and 59 not in labs


def test_dist_tombstone_remove_is_o1(mesh):
    """Below the compaction threshold, remove() is one sharded bias
    scatter: the store array is untouched (the r4 path re-striped the
    WHOLE store from host per remove) and results match the oracle."""
    e = _unit(45, seed=23)
    g = DistributedGallery(DIM, mesh=mesh, block=1024)
    g.enroll(e, np.arange(45))
    dev_before = g._dev
    assert g.remove(11) == 1
    assert g._tomb == 1 and g._n == 45
    assert g._dev is dev_before             # store not re-striped
    assert len(g) == 44
    ref = DeviceGallery(DIM, block=8)
    ref.enroll(np.delete(e, 11, axis=0), np.delete(np.arange(45), 11))
    probes = _unit(5, seed=24)
    want_l, want_s = ref.search(probes, k=6)
    got_l, got_s = g.search(probes, k=6)
    np.testing.assert_array_equal(want_l, got_l)
    np.testing.assert_allclose(want_s, got_s, atol=2e-6)
    # save() writes live rows only
    assert g.remove(11) == 0


def test_dist_compaction_crossing(mesh):
    """Crossing compact_frac re-stripes: tombstones drop to zero and
    results still match the oracle."""
    e = _unit(45, seed=25)
    g = DistributedGallery(DIM, mesh=mesh, block=4)
    g.enroll(e, np.arange(45))
    for lab in range(11):       # threshold max(4, 11.25) → 12th compacts
        g.remove(lab)
    assert g._tomb == 11
    g.remove(11)
    assert g._tomb == 0 and g._n == 33 and len(g) == 33
    ref = DeviceGallery(DIM, block=8)
    ref.enroll(e[12:], np.arange(12, 45))
    probes = _unit(4, seed=26)
    want_l, want_s = ref.search(probes, k=5)
    got_l, got_s = g.search(probes, k=5)
    np.testing.assert_array_equal(want_l, got_l)
    np.testing.assert_allclose(want_s, got_s, atol=2e-6)


def test_one_strike_per_search_not_per_chunk(mesh, monkeypatch):
    """r5 review fix: a probe-chunked search that trips the Pallas
    fallback must burn ONE strike for the whole request — retrying the
    kernel on every remaining chunk would let a single transient
    Mosaic/VMEM event exhaust all 3 strikes and permanently disable
    the fast path (the exact policy the 3-strike design prevents)."""
    import tf_face_toolbox_tpu.serving.distributed_gallery as dg

    e = _unit(40, seed=31)
    g = DistributedGallery(DIM, mesh=mesh, block=1024)
    g.use_pallas = True                     # force the kernel path
    g.enroll(e, np.arange(40))
    g.sims_bytes_guard = 1                  # chunk = _PROBE_CHUNK_MIN
    probes = _unit(3 * dg._PROBE_CHUNK_MIN, seed=32)

    real = dg._dist_search_fn
    pallas_calls = {"n": 0}

    def fake(mesh_, axis, n_dev, k_local, k, quantized, pallas,
             interpret):
        if pallas:
            pallas_calls["n"] += 1
            raise RuntimeError("transient mosaic failure")
        return real(mesh_, axis, n_dev, k_local, k, quantized, pallas,
                    interpret)

    monkeypatch.setattr(dg, "_dist_search_fn", fake)
    labs, sc = g.search(probes, k=5)
    assert g._pallas_fails == 1             # one strike, whole search
    assert pallas_calls["n"] == 1           # later chunks fell back
    assert g._pallas_cooldown > 0

    ref = DistributedGallery(DIM, mesh=mesh, block=1024)
    ref.use_pallas = False
    ref.enroll(e, np.arange(40))
    want_l, want_s = ref.search(probes, k=5)
    np.testing.assert_array_equal(labs, want_l)
    np.testing.assert_allclose(sc, want_s, atol=1e-5)
