"""Mesh-sharded enrollment gallery: the daemon's 1:N store at N x HBM.

:class:`~tf_face_toolbox_tpu.serving.gallery.DeviceGallery` tops out at
one chip's HBM (~15.6M bf16 rows at the default 8 GB bound, measured in
docs/design.md). This module scales the SAME serving surface over a
device mesh: gallery rows stripe across the mesh's ``data`` axis, each
device ranks its shard locally, and the per-shard candidates ride ICI
once (an all-gather of n_dev x k rows) into an exact replicated merge —
the persistent-daemon counterpart of the offline
``ops.verification.sharded_top_k_matches`` (cli.search) machinery. On a
v5e-8 slice the resident capacity is 8x one chip (~125M bf16 rows /
~250M int8 rows at 8 GB/chip) with per-search ICI traffic of kilobytes
against the gallery's gigabytes.

Design (SURVEY.md §2d: collectives are a named component; the mount is
empty, so rows cite SURVEY/BASELINE, not reference files):

- **Striped layout.** Global gallery row ``g`` lives on shard
  ``s = g % n_dev`` at local slot ``j = g // n_dev``. Striping keeps
  every shard's fill within one row of the others at ANY enrollment
  count — no shard becomes the straggler — and makes the shard/slot of
  a row a pure function of its index, so enrolls route rows without a
  placement table. It also makes the per-shard fill a closed form
  (ceil((fill − s) / n_dev)), which is exactly the ``n_valid`` mask
  contract of the Pallas kernel below.
- **Incremental enroll.** New rows are staged host-side into a
  ``(n_dev, r_max, D)`` block (r_max = rows landing on the fullest
  shard, i.e. ceil(m / n_dev)) and appended by ONE donated shard_map
  ``dynamic_update_slice`` at each shard's own fill offset. Host→device
  traffic per enroll is the new rows only; in-capacity appends reuse
  the store buffer in place (same O(1)-per-enroll economics as
  DeviceGallery's r4 incremental sync, now per shard).
- **One-dispatch search, Pallas per shard (r5).** A single jitted
  program runs the per-shard ranking under shard_map and the final
  merge in the same computation; XLA lowers the ``P(None, 'data')``
  candidate output + replicated top-k into one all-gather over ICI.
  The per-shard ranking dispatches to the SAME fused dot+running-top-k
  Pallas kernel as DeviceGallery (``ops/pallas_topk``) whenever the
  shard capacity is kernel-shaped — the r4 mesh store materialized the
  per-shard (B, local_cap) sims matrix and paid XLA's top-k tail, the
  very program the kernel was built to beat (measured 2.3x at B=64
  over 10^7 rows). The XLA program remains the fallback (Mosaic
  failure backoff, non-1024-multiple capacities) and the oracle the
  CPU-mesh tests compare against. Scores are exact at any fill
  (padding/garbage slots mask by the striped per-shard fill; dead
  slots by the tombstone bias).
- **dtype parity.** float32 / bfloat16 / int8 stores, same semantics
  as DeviceGallery: bf16 is bit-identical to f32 under default TPU
  matmul precision; int8 is two-stage — per-shard coarse top-(k x
  rescore_expand) over the quantized shards, exact f32 rescore of the
  gathered candidates against the host master.
- **O(1) deenroll (r5).** Tombstones + deferred compaction, the same
  contract as DeviceGallery: remove() writes −2e9 into a sharded
  per-row bias vector (one tiny scatter; the r4 path re-striped the
  ENTIRE store from host — minutes at 10^7 rows) that every per-shard
  program adds before selection; compaction re-stripes only when dead
  rows exceed ``compact_frac`` of the fill or an enroll needs the
  room back.
- **Loud capacity bound.** ``hbm_limit_gb`` is PER DEVICE; the total
  resident bound is n_dev x that. Past it, enrollments refuse with
  :class:`GalleryCapacityError` (HTTP 507 at the daemon) — streamed
  overflow stays a single-device mode (DeviceGallery
  ``overflow="stream"``); at mesh scale the documented spill is the
  offline sharded ``cli.search``.

Snapshots are the same ``.npz`` as DeviceGallery — the two stores are
interchangeable on disk (enroll on one chip, serve on a slice, or vice
versa). Thread-safe like DeviceGallery: the r5 readers/writer gate
drains in-flight searches before any donation or host mutation (the
HTTP front-end is threaded).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from tf_face_toolbox_tpu.serving.gallery import (
    _TOMB,
    GalleryCapacityError,
    _quantize_rows,
    _ReadersWriterGate,
    _rescore,
)

# past this per-shard (B, local_cap) f32 sims footprint, searches chunk
# the PROBES on host (exact; bounds device intermediates) — the mesh
# twin of DeviceGallery.scan_sims_bytes
_SIMS_BYTES_GUARD = 3 << 30
_PROBE_CHUNK_MIN = 32
# probes per shard_map dispatch on the Pallas path: bounds the
# in-kernel (B, blk) tile (same budget as DeviceGallery._PROBE_CHUNK)
_PALLAS_PROBE_CHUNK = 256


def _scatter_rows(st, sg, off, cnt):
    """Write ``sg``'s first ``cnt`` rows at local slots ``off + i``.

    NOT a dynamic_update_slice: dus CLAMPS out-of-bounds starts, so a
    shard that receives fewer than r_max rows this enroll (or none)
    would have its zero padding clamped back INTO valid slots once
    full. Scatter-with-drop sends the padding out of bounds instead,
    where it is discarded — each shard writes exactly its own rows.
    """
    import jax.numpy as jnp

    r_max = sg.shape[0]
    pos = jnp.arange(r_max)
    idx = jnp.where(pos < cnt, off + pos, st.shape[0])   # OOB → drop
    return st.at[idx].set(sg.astype(st.dtype), mode="drop")


@functools.lru_cache(maxsize=None)
def _dist_append_fn(mesh, data_axis: str):
    """Donated in-place striped append: each shard scatters its staged
    rows at its own fill offset. One dispatch for the whole mesh."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(store, staged, offsets, counts):
        def local(st, sg, off, cnt):
            return _scatter_rows(st, sg[0], off[0], cnt[0])

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(data_axis, None), P(data_axis, None, None),
                      P(data_axis), P(data_axis)),
            out_specs=P(data_axis, None))(store, staged, offsets,
                                          counts)

    return run


@functools.lru_cache(maxsize=None)
def _dist_append1_fn(mesh, data_axis: str):
    """1-D twin of :func:`_dist_append_fn` (int8 per-row scales)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(store, staged, offsets, counts):
        def local(st, sg, off, cnt):
            pos = jnp.arange(sg.shape[1])
            idx = jnp.where(pos < cnt[0], off[0] + pos, st.shape[0])
            return st.at[idx].set(sg[0], mode="drop")

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(data_axis), P(data_axis, None), P(data_axis),
                      P(data_axis)),
            out_specs=P(data_axis))(store, staged, offsets, counts)

    return run


@functools.lru_cache(maxsize=None)
def _dist_grow_fn(mesh, data_axis: str, new_local_cap: int):
    """Grown store built ON DEVICE per shard: zeros <- old <- staged.
    No donation — output shape differs; the old buffer frees after."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @functools.partial(jax.jit, static_argnames=("dt",))
    def run(old, staged, offsets, counts, dt):
        def local(ol, sg, off, cnt):
            out = jnp.zeros((new_local_cap, sg.shape[2]), dt)
            out = jax.lax.dynamic_update_slice(out, ol.astype(dt),
                                               (0, 0))
            return _scatter_rows(out, sg[0], off[0], cnt[0])

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(data_axis, None), P(data_axis, None, None),
                      P(data_axis), P(data_axis)),
            out_specs=P(data_axis, None))(old, staged, offsets, counts)

    return run


@functools.lru_cache(maxsize=None)
def _dist_grow1_fn(mesh, data_axis: str, new_local_cap: int):
    """1-D twin of :func:`_dist_grow_fn` (int8 per-row scales)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @jax.jit
    def run(old, staged, offsets, counts):
        def local(ol, sg, off, cnt):
            out = jnp.zeros((new_local_cap,), ol.dtype)
            out = jax.lax.dynamic_update_slice(out, ol, (0,))
            pos = jnp.arange(sg.shape[1])
            idx = jnp.where(pos < cnt[0], off[0] + pos, out.shape[0])
            return out.at[idx].set(sg[0], mode="drop")

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(data_axis), P(data_axis, None), P(data_axis),
                      P(data_axis)),
            out_specs=P(data_axis))(old, staged, offsets, counts)

    return run


@functools.lru_cache(maxsize=None)
def _dist_growvec_fn(mesh, data_axis: str, new_local_cap: int):
    """Zero-extend a per-shard 1-D vector (the tombstone bias) to the
    grown local capacity — fresh rows are live (bias 0)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @jax.jit
    def run(old):
        def local(ol):
            out = jnp.zeros((new_local_cap,), ol.dtype)
            return jax.lax.dynamic_update_slice(out, ol, (0,))

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(data_axis),),
            out_specs=P(data_axis))(old)

    return run


@functools.lru_cache(maxsize=None)
def _dist_bias_set_fn(mesh, data_axis: str):
    """Tombstone scatter into the sharded bias vector: indices are in
    FLAT striped device numbering (shard * local_cap + slot), padded
    with repeats (idempotent set). One tiny dispatch per remove()."""
    import jax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    sharding = NamedSharding(mesh, P(data_axis))

    @functools.partial(jax.jit, out_shardings=sharding)
    def run(bias, idx):
        return bias.at[idx].set(_TOMB)

    return run


@functools.lru_cache(maxsize=None)
def _dist_search_fn(mesh, data_axis: str, n_dev: int, k_local: int,
                    k: int, quantized: bool, use_pallas: bool,
                    interpret: bool):
    """One jitted program: per-shard masked ranking under shard_map,
    candidates all-gathered over ICI (the P(None, data) output), exact
    replicated merge — indices in GLOBAL striped numbering.

    ``use_pallas``: run the fused dot+running-top-k kernel
    (ops/pallas_topk) per shard instead of the full-sims XLA program —
    the striped layout's per-shard fill ceil((n − s)/n_dev) IS the
    kernel's n_valid contract, and the sharded tombstone bias rides in
    as the kernel's bias input. ``interpret`` runs the Mosaic
    interpreter (CPU-mesh tests)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from tf_face_toolbox_tpu.ops import pallas_topk

    @jax.jit
    def run(g, gs, bias, p, ps, n_valid):
        def local(g_s, gs_s, b_s, p_r, ps_r, nv):
            s_idx = jax.lax.axis_index(data_axis)
            if use_pallas:
                # striped per-shard fill: shard s holds global rows
                # s, s+n_dev, ... so slots [0, ceil((n-s)/n_dev)) are
                # valid — exactly the kernel's n_valid mask
                local_n = (nv[0] - s_idx + n_dev - 1) // n_dev
                if quantized:
                    sc, ix = pallas_topk.cosine_topk_q_impl(
                        g_s, gs_s, p_r, ps_r, local_n, k_local,
                        interpret=interpret, bias=b_s)
                else:
                    sc, ix = pallas_topk.cosine_topk_impl(
                        g_s, p_r, local_n, k_local,
                        interpret=interpret, bias=b_s)
            else:
                if quantized:
                    acc = jax.lax.dot_general(
                        p_r, g_s, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    sims = (acc.astype(jnp.float32)
                            * ps_r[:, None] * gs_s[None, :])
                else:
                    sims = jax.lax.dot_general(
                        p_r.astype(g_s.dtype), g_s,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                sims = sims + b_s[None, :]
                gidx = jnp.arange(g_s.shape[0]) * n_dev + s_idx
                sims = jnp.where(gidx[None, :] < nv[0], sims, -2e9)
                sc, ix = jax.lax.top_k(sims, k_local)
            return sc, (ix * n_dev + s_idx).astype(jnp.int32)

        gs_spec = P(data_axis) if quantized else P()
        sc, ix = shard_map(
            local, mesh=mesh,
            in_specs=(P(data_axis, None), gs_spec, P(data_axis), P(),
                      P(), P()),
            out_specs=(P(None, data_axis), P(None, data_axis)),
            check_vma=False,
        )(g, gs, bias, p, ps, n_valid)
        # merged candidate set (B, n_dev * k_local) replicates via one
        # ICI all-gather of k-scale rows; the final top-k is tiny
        ms, pos = jax.lax.top_k(sc, k)
        return ms, jnp.take_along_axis(ix, pos, axis=1)

    return run


class DistributedGallery:
    """Enroll/identify store sharded over a device mesh.

    Same public surface as
    :class:`~tf_face_toolbox_tpu.serving.gallery.DeviceGallery`
    (``enroll/search/remove/save/load``, ``device_bytes``, the daemon
    duck-types between them), with rows striped over ``mesh``'s
    ``data`` axis so resident capacity scales to n_dev x
    ``hbm_limit_gb``.

    ``mesh``: a :mod:`jax.sharding` Mesh with a ``data`` axis (default:
    ``parallel.mesh.create_mesh()`` over all visible devices). Axes
    other than ``data`` replicate the store.
    ``block``: PER-SHARD capacity granularity (rows); global capacity
    moves in ``n_dev * block`` steps.
    ``hbm_limit_gb``: PER-DEVICE store bound; ``overflow`` is always
    ``"refuse"`` (streamed overflow stays a single-device mode).
    """

    overflow = "refuse"

    def __init__(self, dim: int, *, mesh=None, block: int = 1024,
                 dtype: str = "float32", hbm_limit_gb: float = 8.0):
        if dim < 1 or block < 1:
            raise ValueError(f"bad dim={dim} / block={block}")
        if dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"dtype must be float32|bfloat16|int8, "
                             f"got {dtype!r}")
        if mesh is None:
            from tf_face_toolbox_tpu.parallel.mesh import create_mesh

            mesh = create_mesh()
        from tf_face_toolbox_tpu.parallel.mesh import DATA_AXIS

        if DATA_AXIS not in mesh.shape:
            raise ValueError(f"mesh has no {DATA_AXIS!r} axis: "
                             f"{dict(mesh.shape)}")
        self.mesh = mesh
        self.data_axis = DATA_AXIS
        self.n_dev = int(mesh.shape[DATA_AXIS])
        self.dim = int(dim)
        self.block = int(block)
        self.dtype = dtype
        self.itemsize = {"float32": 4, "bfloat16": 2, "int8": 1}[dtype]
        self.rescore_expand = 4
        self.hbm_limit_gb = float(hbm_limit_gb)
        # per-shard bytes past which block-boundary growth re-uploads
        # from host instead of copying on device (2x-HBM-peak
        # avoidance, same rule as DeviceGallery.grow_on_device_max
        # but per shard)
        self.grow_on_device_max = 2_000_000_000
        self.sims_bytes_guard = _SIMS_BYTES_GUARD
        # Pallas per-shard search: None = auto (TPU + kernel-shaped
        # local capacity), True forces it (CPU-mesh tests run the
        # Mosaic interpreter inside shard_map), False disables. Same
        # backoff policy as DeviceGallery.
        self.use_pallas = None
        self._pallas_fails = 0
        self._pallas_cooldown = 0
        # tombstones (see DeviceGallery): host bias mirrored on the
        # sharded device bias; compaction re-stripes past this fraction
        self.compact_frac = 0.25
        self._tomb = 0
        self._gate = _ReadersWriterGate()
        self._host = np.zeros((0, dim), np.float32)
        self._lab = np.zeros((0,), np.int64)
        self._bias = np.zeros((0,), np.float32)
        self._n = 0                 # fill (live + tombstoned rows)
        self._dev = None            # (n_dev * local_cap, D) sharded
        self._dev_scale = None      # (n_dev * local_cap,) f32, int8
        self._dev_bias = None       # (n_dev * local_cap,) f32 sharded

    # ------------------------------------------------------------ sizing

    def __len__(self) -> int:
        """LIVE enrollment count (fill minus tombstones)."""
        with self._gate.cond:
            return self._n - self._tomb

    @property
    def streaming(self) -> bool:
        return False

    def _local_cap_for(self, n: int) -> int:
        fill = -(-max(n, 1) // self.n_dev)      # fullest shard's rows
        return -(-fill // self.block) * self.block

    def _bytes_for(self, n: int) -> int:
        """PER-DEVICE store bytes at ``n`` fill (rows + int8 scales;
        the <1% f32 tombstone bias is not counted — see
        DeviceGallery._bytes_for)."""
        per_row = self.dim * self.itemsize
        if self.dtype == "int8":
            per_row += 4                        # the f32 per-row scale
        return self._local_cap_for(n) * per_row

    def device_bytes(self, rows: int | None = None) -> int:
        """TOTAL (all-shard) device footprint at ``rows`` fill
        (tombstoned rows occupy HBM until compaction)."""
        with self._gate.cond:
            n = self._n if rows is None else rows
        return self._bytes_for(n) * self.n_dev

    # ----------------------------------------------------------- enroll

    def enroll(self, embeddings: np.ndarray, labels) -> int:
        """Append embeddings (N, D) with int labels (N,); → new live
        size.

        Raises :class:`GalleryCapacityError` when any shard's grown
        store would exceed ``hbm_limit_gb`` (after reclaiming any
        tombstoned rows via compaction)."""
        embeddings = np.asarray(embeddings, np.float32)
        if embeddings.ndim == 1:
            embeddings = embeddings[None]
        labels = np.atleast_1d(np.asarray(labels, np.int64))
        if embeddings.shape != (labels.shape[0], self.dim):
            raise ValueError(
                f"embeddings {embeddings.shape} vs labels "
                f"{labels.shape} / dim {self.dim}")
        with self._gate.write():
            new_n = self._n + embeddings.shape[0]
            need = self._bytes_for(new_n)
            over = self.hbm_limit_gb and need > self.hbm_limit_gb * 1e9
            if over and self._tomb:
                self._compact_locked()      # reclaim before refusing
                new_n = self._n + embeddings.shape[0]
                need = self._bytes_for(new_n)
                over = need > self.hbm_limit_gb * 1e9
            if over:
                total = need * self.n_dev / 1e9
                raise GalleryCapacityError(
                    f"enrolling {embeddings.shape[0]} rows would grow "
                    f"each of the {self.n_dev} shards to "
                    f"{need / 1e9:.3g} GB (total {total:.3g} GB) > "
                    f"hbm_limit_gb={self.hbm_limit_gb:g}/device at "
                    f"dtype={self.dtype}. Options: dtype='bfloat16' "
                    f"(2x rows) or 'int8' (~4x, exact-rescored), a "
                    f"bigger mesh, raise hbm_limit_gb, or shard "
                    f"offline with cli.search")
            if new_n > self._host.shape[0]:
                new_cap = max(self.block * self.n_dev,
                              2 * self._host.shape[0], new_n)
                grown = np.zeros((new_cap, self.dim), np.float32)
                grown[:self._n] = self._host[:self._n]
                self._host = grown
                glab = np.zeros((new_cap,), np.int64)
                glab[:self._n] = self._lab[:self._n]
                self._lab = glab
                gbias = np.zeros((new_cap,), np.float32)
                gbias[:self._n] = self._bias[:self._n]
                self._bias = gbias
            offset = self._n
            self._host[offset:new_n] = embeddings
            self._lab[offset:new_n] = labels
            self._bias[offset:new_n] = 0.0
            self._n = new_n
            self._sync_locked(new_rows=embeddings, offset=offset)
            return self._n - self._tomb

    def _np_dtype(self):
        import jax.numpy as jnp

        return {"bfloat16": jnp.bfloat16, "int8": np.int8,
                "float32": np.float32}[self.dtype]

    def _stage(self, rows: np.ndarray, offset: int):
        """Route ``rows`` (global offset ``offset``) into the striped
        per-shard staging block: (n_dev, r_max, D) + per-shard write
        offsets + per-shard row counts. Slots past a shard's count are
        zero padding; the device scatter DROPS them (never written)."""
        n_dev = self.n_dev
        m = rows.shape[0]
        gidx = offset + np.arange(m)
        shard = gidx % n_dev
        slot = gidx // n_dev
        sidx = np.arange(n_dev)
        off = ((offset - sidx + n_dev - 1) // n_dev).astype(np.int32)
        cnt = ((offset + m - sidx + n_dev - 1) // n_dev
               ).astype(np.int32) - off
        r_max = int((slot - off[shard]).max()) + 1
        staged = np.zeros((n_dev, r_max, rows.shape[1]), rows.dtype)
        staged[shard, slot - off[shard]] = rows
        return staged, off, cnt

    def _sync_locked(self, new_rows: np.ndarray | None = None,
                     offset: int = 0) -> None:
        """Bring the sharded device store up to date. ``new_rows``
        enables the incremental path (striped append / on-device
        grow); None forces a full host re-upload (first sync,
        compaction, load). Caller must hold the write gate."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        dt = self._np_dtype()
        q8 = self.dtype == "int8"
        mesh, axis = self.mesh, self.data_axis
        n = self._n
        local_cap = self._local_cap_for(n)
        cur_local = (self._dev.shape[0] // self.n_dev
                     if self._dev is not None else -1)
        if new_rows is not None and self._dev is not None:
            if q8:
                qrows, qscale = _quantize_rows(new_rows)
                staged, off, cnt = self._stage(qrows, offset)
                sstage = np.zeros(staged.shape[:2], np.float32)
                gidx = offset + np.arange(new_rows.shape[0])
                sstage[gidx % self.n_dev,
                       gidx // self.n_dev - off[gidx % self.n_dev]] = \
                    qscale
            else:
                staged, off, cnt = self._stage(new_rows.astype(dt),
                                               offset)
            if local_cap == cur_local:      # in-place donated append
                self._dev = _dist_append_fn(mesh, axis)(
                    self._dev, staged, off, cnt)
                if q8:
                    self._dev_scale = _dist_append1_fn(mesh, axis)(
                        self._dev_scale, sstage, off, cnt)
                # fresh rows are live (bias 0 — the buffer value)
                return
            per_shard = local_cap * self.dim * self.itemsize
            if per_shard <= self.grow_on_device_max:
                self._dev = _dist_grow_fn(mesh, axis, local_cap)(
                    self._dev, staged, off, cnt, dt=dt)
                if q8:
                    self._dev_scale = _dist_grow1_fn(
                        mesh, axis, local_cap)(
                            self._dev_scale, sstage, off, cnt)
                self._dev_bias = _dist_growvec_fn(
                    mesh, axis, local_cap)(self._dev_bias)
                return
            self._dev = None                # free before the big alloc
            self._dev_scale = None
            self._dev_bias = None
        # full re-upload: stripe the host master into device layout
        # (device row s*local_cap + j  <-  host row j*n_dev + s), cast
        # (or quantize) on host so the transfer moves store-dtype bytes
        if n == 0:
            self._dev = None
            self._dev_scale = None
            self._dev_bias = None
            return
        self._dev = None                    # peak HBM = new store only
        self._dev_scale = None
        self._dev_bias = None
        sharding = NamedSharding(mesh, P(axis, None))
        v_sharding = NamedSharding(mesh, P(axis))
        if q8:
            qrows, qscale = _quantize_rows(self._host[:n])
            striped = self._stripe_full(qrows, local_cap)
            self._dev_scale = jax.device_put(
                jnp.asarray(self._stripe_vec(qscale, local_cap)),
                v_sharding)
            self._dev = jax.device_put(jnp.asarray(striped), sharding)
        else:
            striped = self._stripe_full(self._host[:n].astype(dt),
                                        local_cap)
            self._dev = jax.device_put(jnp.asarray(striped), sharding)
        self._dev_bias = jax.device_put(
            jnp.asarray(self._stripe_vec(self._bias[:n], local_cap)),
            v_sharding)

    def _stripe_full(self, rows: np.ndarray, local_cap: int):
        """(n, D) host-order rows → (n_dev*local_cap, D) striped device
        layout, zero-padded."""
        tmp = np.zeros((local_cap, self.n_dev, rows.shape[1]),
                       rows.dtype)
        tmp.reshape(-1, rows.shape[1])[:rows.shape[0]] = rows
        return np.ascontiguousarray(tmp.transpose(1, 0, 2)).reshape(
            self.n_dev * local_cap, rows.shape[1])

    def _stripe_vec(self, vals: np.ndarray, local_cap: int):
        """(n,) host-order per-row values → (n_dev*local_cap,) striped,
        zero-padded (scales / tombstone bias)."""
        tmp = np.zeros((local_cap, self.n_dev), vals.dtype)
        tmp.reshape(-1)[:vals.shape[0]] = vals
        return np.ascontiguousarray(tmp.T).reshape(-1)

    # ----------------------------------------------------------- search

    def search(self, embeddings: np.ndarray, k: int = 5):
        """Top-``k`` matches per probe → (labels (B,k) int64, scores
        (B,k) f32), exact at any fill. Probes and gallery are assumed
        L2-normalized; ``k`` clamps to the current live size."""
        with self._gate.read():
            n = self._n
            n_live = self._n - self._tomb
            dev = self._dev
            dev_scale = self._dev_scale
            dev_bias = self._dev_bias
            labels = self._lab[:n]
            host = self._host
            bias = self._bias
            if n_live == 0:
                raise ValueError("gallery is empty — enroll first")
            k = min(int(k), n_live)
            if k < 1:
                raise ValueError(f"k must be >= 1, got {k}")
            e = np.asarray(embeddings, np.float32)
            if e.ndim == 1:
                e = e[None]
            if e.shape[1] != self.dim:
                raise ValueError(
                    f"probe dim {e.shape[1]} != {self.dim}")
            local_cap = dev.shape[0] // self.n_dev
            use_pallas = self._pallas_ok(local_cap, e.shape[0])
            # exact probe-chunking OOM guard: bound the per-shard
            # (B, local_cap) sims matrix (XLA path) / the in-kernel
            # probe tile (Pallas path); each chunk is an independent
            # search
            chunk = e.shape[0]
            if chunk * local_cap * 4 > self.sims_bytes_guard:
                chunk = max(_PROBE_CHUNK_MIN,
                            self.sims_bytes_guard // (local_cap * 4))
            if use_pallas:
                chunk = min(chunk, _PALLAS_PROBE_CHUNK)
            out_l, out_s = [], []
            strikes0 = self._pallas_fails
            for i in range(0, e.shape[0], chunk):
                # one strike per SEARCH, not per chunk: once a chunk
                # trips the fallback, later chunks of the same request
                # must not retry the kernel (a single transient event
                # would otherwise burn all 3 strikes at once)
                if use_pallas and self._pallas_fails > strikes0:
                    use_pallas = False
                idx, sc = self._search_chunk(
                    dev, dev_scale, dev_bias, host, bias, n, n_live,
                    e[i:i + chunk], k, local_cap, use_pallas)
                out_l.append(labels[idx])
                out_s.append(sc)
            return np.concatenate(out_l), np.concatenate(out_s)

    def _pallas_ok(self, local_cap: int, batch: int) -> bool:
        from tf_face_toolbox_tpu.ops.pallas_topk import (
            BLK,
            default_blk,
        )

        if (self.use_pallas is False or local_cap % BLK
                or self._pallas_fails >= 3):
            return False
        if self._pallas_cooldown > 0:
            self._pallas_cooldown -= 1
            return False
        if self.use_pallas:
            return True
        import jax

        if jax.default_backend() != "tpu":
            return False
        blk = default_blk(local_cap, self.dim, self.itemsize)
        return blk >= 2048 or batch >= 8

    def _search_chunk(self, dev, dev_scale, dev_bias, host, bias,
                      n: int, n_live: int, e: np.ndarray, k: int,
                      local_cap: int, use_pallas: bool):
        import jax.numpy as jnp

        interpret = False
        if use_pallas:
            import jax

            interpret = jax.default_backend() != "tpu"
        if self.dtype == "int8":
            kc = min(k * self.rescore_expand, n_live)
            k_local = min(kc, local_cap)
            pq, ps = _quantize_rows(e)
            args = (dev, dev_scale, dev_bias, jnp.asarray(pq),
                    jnp.asarray(ps), jnp.asarray([n], np.int32))
            cand = self._dispatch(k_local, kc, True, use_pallas,
                                  interpret, args)[1]
            return _rescore(host, n, e, np.asarray(cand), k, bias)
        k_local = min(k, local_cap)
        dummy = jnp.zeros((1,), np.float32)
        args = (dev, dummy, dev_bias, jnp.asarray(e), dummy,
                jnp.asarray([n], np.int32))
        sc, ix = self._dispatch(k_local, k, False, use_pallas,
                                interpret, args)
        return np.asarray(ix), np.asarray(sc)

    def _dispatch(self, k_local: int, k: int, quantized: bool,
                  use_pallas: bool, interpret: bool, args):
        """Run the one-dispatch mesh search; Mosaic failures back off
        to the XLA program (32-search cooldown, permanent after 3
        strikes — DeviceGallery's policy)."""
        key = (self.mesh, self.data_axis, self.n_dev, k_local, k,
               quantized)
        if not use_pallas:
            return _dist_search_fn(*key, False, False)(*args)
        try:
            fn = _dist_search_fn(*key, True, interpret)
            sc, ix = fn(*args)
            # materialize inside the try: device-side failures only
            # surface at execution and must trip the fallback too
            return np.asarray(sc), np.asarray(ix)
        except Exception:
            from absl import logging

            self._pallas_fails += 1
            self._pallas_cooldown = 32
            logging.warning(
                "pallas sharded gallery search failed (strike %d/3); "
                "falling back to the XLA program%s", self._pallas_fails,
                " permanently" if self._pallas_fails >= 3
                else " for the next 32 searches", exc_info=True)
            return _dist_search_fn(*key, False, False)(*args)

    # ----------------------------------------------------------- remove

    def remove(self, label: int) -> int:
        """Drop every enrollment of ``label``; → rows removed.

        O(removed): tombstones the rows (host bias + one tiny sharded
        scatter) — every per-shard program masks them, so results are
        exact immediately. Compaction (the full host re-stripe, the
        pre-r5 cost of EVERY remove) is deferred until dead rows
        exceed ``compact_frac`` of the fill or the store empties."""
        with self._gate.write():
            fill = self._n
            hit = ((self._lab[:fill] == int(label))
                   & (self._bias[:fill] == 0.0))
            removed = int(hit.sum())
            if not removed:
                return 0
            idx = np.nonzero(hit)[0]
            self._bias[idx] = _TOMB
            self._tomb += removed
            if (fill == self._tomb
                    or self._tomb >= max(self.block,
                                         self.compact_frac * fill)):
                self._compact_locked()
            elif self._dev_bias is not None:
                import jax.numpy as jnp

                local_cap = self._dev.shape[0] // self.n_dev
                flat = ((idx % self.n_dev) * local_cap
                        + idx // self.n_dev)
                pad = 1 << (len(flat) - 1).bit_length()
                flatp = np.concatenate(
                    [flat,
                     np.full(pad - len(flat), flat[0], flat.dtype)])
                self._dev_bias = _dist_bias_set_fn(
                    self.mesh, self.data_axis)(
                        self._dev_bias, jnp.asarray(flatp, jnp.int32))
            return removed

    def _compact_locked(self) -> int:
        """Rebuild without tombstoned rows (in-place on the host
        buffers — the write gate drained all readers) and re-stripe
        the device store, old buffers freed first."""
        fill = self._n
        live = self._bias[:fill] == 0.0
        kept = int(live.sum())
        if kept != fill:
            self._host[:kept] = self._host[:fill][live]
            self._lab[:kept] = self._lab[:fill][live]
        self._bias[:fill] = 0.0
        self._n = kept
        self._tomb = 0
        self._sync_locked()
        return kept

    # ------------------------------------------------------ persistence

    def save(self, path: str) -> int:
        """Atomic snapshot (live rows only) → .npz (same format as
        DeviceGallery)."""
        with self._gate.read():
            n = self._n
            live = self._bias[:n] == 0.0
            emb = self._host[:n][live]
            labels = self._lab[:n][live]
        tmp = path + ".tmp.npz"
        np.savez(tmp, embeddings=emb, labels=labels)
        os.replace(tmp, path)
        return emb.shape[0]

    @classmethod
    def load(cls, path: str, *, mesh=None, block: int = 1024,
             dtype: str = "float32",
             hbm_limit_gb: float = 8.0) -> "DistributedGallery":
        data = np.load(path, allow_pickle=False)
        emb = np.asarray(data["embeddings"], np.float32)
        g = cls(emb.shape[1], mesh=mesh, block=block, dtype=dtype,
                hbm_limit_gb=hbm_limit_gb)
        if emb.shape[0]:
            g.enroll(emb, data["labels"])
        return g
