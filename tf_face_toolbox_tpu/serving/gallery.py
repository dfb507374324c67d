"""Device-resident enrollment gallery for the serving daemon.

The daemon's 1:N half (cli.search is the offline counterpart): enrolled
embeddings live on the device as one (capacity, D) array padded in
``block``-row steps, so the compiled cosine+top-k search program only
recompiles when capacity crosses a block boundary — enrolling is an
append, identifying is one MXU matmul.

Scale design (r4, VERDICT r3 #5):

- **Incremental device sync.** Enrolling appends ONLY the new rows to
  the device: within capacity, a donated ``dynamic_update_slice``
  updates the store in place; at a block boundary the grown array is
  built ON DEVICE from the old one + the new rows. Host→device traffic
  per enroll is the new rows, not the whole gallery — the difference
  between O(1) and O(n) per enroll at 10^6+ rows (the pre-r4 full
  re-upload cost ~2 s/enroll at 10^6 rows over this image's tunnel).
  The host keeps the f32 master copy for exact save/reload, itself in
  a doubling-capacity buffer so the host-side append is amortized O(1)
  too (a per-enroll ``np.concatenate`` is a 20 GB memcpy at 10^7 rows).
- **bf16 store.** ``dtype="bfloat16"`` halves HBM and doubles matmul
  rate; scores still accumulate in f32 (preferred_element_type).
  Measured on v5e (tools/gallery_bench.py): the bf16 store returns
  BIT-IDENTICAL scores to the f32 store — TPU matmuls run bf16×bf16
  passes at JAX's default precision either way, so f32 storage buys
  no numerics here, only 2× the HBM. (An f32 store would only differ
  under ``jax.default_matmul_precision('highest')``.)
- **int8 store (r4).** ``dtype="int8"`` quarters HBM vs f32 (a 10^7-row
  512-d gallery in 5.2 GB) and halves the bandwidth-bound search time
  vs bf16. Search is TWO-STAGE so accuracy is not traded away: the
  device runs an s8×s8 MXU coarse pass over the quantized store
  (per-row symmetric scales) keeping k×``rescore_expand`` candidates,
  then the host rescores ONLY those rows against the f32 master —
  final scores are exact f32 cosines, and the coarse stage only has to
  get the true top-k into a 4× candidate set (per-row int8 on unit
  vectors carries ~1e-2 worst-case cosine error vs typical top-1
  margins of ~0.3+).
- **Loud capacity bound.** ``hbm_limit_gb`` (default 8 — half a v5e
  chip, leaving room for the model and batches) refuses enrollments
  whose grown store would exceed it with :class:`GalleryCapacityError`
  (HTTP 507 at the daemon) instead of dying in the allocator mid-step.
  Past the bound: bf16 store (2x), ``overflow="stream"`` (below), or
  the sharded offline ``cli.search`` path, which scales over a mesh.
- **Streamed overflow (r4).** ``overflow="stream"`` turns the refusal
  into a mode switch: past ``hbm_limit_gb`` the device store is freed
  and /identify streams the host master through the chip in fixed
  ~0.5 GB slabs — per-slab MXU top-k (the same compiled program as the
  resident path, one compile total), exact global merge on host. HBM
  use drops to one slab; latency degrades from O(1) matmul to
  O(gallery bytes / PCIe bandwidth) per search — on directly-attached
  v5e (~100 GB/s DMA) that is ~0.2 s for a 20 GB f32 10^7-row store.
  Enroll in this mode is a pure host append (amortized O(1)); the
  store drops back to device residency when removals shrink it under
  the bound. Searches stay EXACT in every mode (tested equal).
- **O(1) deenroll: tombstones + deferred compaction (r5).** remove()
  marks rows dead in a per-row f32 ``bias`` vector (0 live, −2e9
  tombstoned) that EVERY search program — XLA plain/scan/streamed and
  both Pallas kernels — adds to the scores before selection, and that
  the int8 rescore adds on the host side, so removed rows can never
  surface in any mode. Per remove, the device work is one (removed,)-
  row bias scatter (ms at any scale) instead of the pre-r5 full
  re-stripe (minutes at 10^7 rows over this image's tunnel).
  Compaction (the full rebuild) is deferred until tombstones exceed
  ``compact_frac`` of the fill (or the store needs the room back:
  an enroll that would otherwise refuse, a streaming store shrinking
  under the residency bound, or the store emptying).

Thread-safety (r5, advisor findings): the HTTP front-end is threaded,
and the r4 incremental sync DONATES the live device buffers — an
enroll concurrent with a search used to delete the Array the search
had captured ("Array has been deleted", HTTP 500), and remove()
compacted the host master in place under a search reading it. Both
stores now use a write-preferring readers/writer gate: searches
register as readers and run lock-free on captured references; every
mutation (enroll's donation, remove, compaction) first drains in-
flight readers (new ones queue behind the writer), so donation and
in-place host edits are race-free by construction. Snapshots are
ordinary ``.npz`` (atomic tmp+rename) — the persistence model of the
reference era's "embeddings directory" workflows, one file instead.
"""

from __future__ import annotations

import contextlib
import functools
import os
import threading

import numpy as np


class GalleryCapacityError(RuntimeError):
    """Enrollment would grow the device store past ``hbm_limit_gb``."""


# probes per Pallas-kernel launch: bounds the in-kernel (B, blk) sims
# tile to ~4 MB of VMEM; bigger batches split and re-read the store,
# which is still far cheaper than an XLA (B, cap) sims matrix
_PROBE_CHUNK = 256

# tombstoned-row score bias; matches the padding mask value, so dead
# rows lose to every live row (cosines are >= -1) in every program
_TOMB = -2e9


class _ReadersWriterGate:
    """Write-preferring readers/writer gate.

    ``read()``: searches capture references and run concurrently.
    ``write()``: waits for in-flight readers to drain (new readers
    queue behind any waiting writer, so writers never starve), then
    holds exclusive access for the whole mutation — which makes the
    donated in-place device appends and the in-place host compaction
    safe: no captured reference can be live when a buffer is donated
    or rewritten."""

    def __init__(self):
        self.cond = threading.Condition()
        self._readers = 0
        self._writers_waiting = 0

    @contextlib.contextmanager
    def read(self):
        with self.cond:
            while self._writers_waiting:
                self.cond.wait()
            self._readers += 1
        try:
            yield
        finally:
            with self.cond:
                self._readers -= 1
                if not self._readers:
                    self.cond.notify_all()

    @contextlib.contextmanager
    def write(self):
        with self.cond:
            self._writers_waiting += 1
            try:
                while self._readers:
                    self.cond.wait()
                yield
            finally:
                self._writers_waiting -= 1
                self.cond.notify_all()


@functools.lru_cache(maxsize=None)
def _search_fn(k: int):
    """One cached jitted program per k (capacity/batch changes retrace
    inside jax's own cache; a fresh closure per call would not)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(g, bias, p, n_valid):
        # contract on dim 1 of BOTH operands (p @ g.T) via dot_general:
        # writing jnp.dot(p, g.T) materializes a full transpose copy of
        # the store at XLA's whim — a 2x-HBM spike that OOMs a 10 GB
        # gallery; the MXU contracts either layout natively
        sims = jax.lax.dot_general(
            p.astype(g.dtype), g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sims = sims + bias[None, :]        # tombstones → -2e9
        row = jnp.arange(g.shape[0])
        sims = jnp.where(row[None, :] < n_valid, sims, -2e9)
        return jax.lax.top_k(sims, k)

    return run


def _rescore(host: np.ndarray, n: int, probes: np.ndarray,
             cand: np.ndarray, k: int, bias: np.ndarray | None = None):
    """Exact f32 rescore of the int8 coarse candidates: gather the
    (B, kc) candidate rows from the host master, one small einsum,
    keep the true top-k. Final scores are exact f32 cosines.
    ``bias`` (the host tombstone vector) re-applies the dead-row mask
    — the coarse stage already excludes tombstones, but when kc
    exceeds the live count its padding candidates must not be
    resurrected by their (real, exact) host scores."""
    invalid = (cand < 0) | (cand >= n)     # belt-and-braces: masked
    cidx = np.clip(cand, 0, n - 1)         # winners can't surface, but
    gathered = host[cidx]                  # never index past the fill
    exact = np.einsum("bd,bkd->bk", probes, gathered,
                      optimize=True).astype(np.float32)
    if bias is not None:
        exact = exact + bias[cidx]
    exact[invalid] = -2e9
    rows = np.arange(exact.shape[0])[:, None]
    order = np.argsort(-exact, axis=1, kind="stable")[:, :k]
    return cidx[rows, order], exact[rows, order]


def _quantize_rows(rows: np.ndarray):
    """Per-row symmetric int8: scale = max|x|/127 (f32), q = x/scale.
    Unit embeddings quantize at ~1e-2 worst-case cosine error — the
    coarse stage of the int8 store; exactness comes from the f32
    rescore of the candidates (see DeviceGallery docstring)."""
    scale = np.abs(rows).max(axis=1) / 127.0
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    q = np.clip(np.rint(rows / scale[:, None]), -127, 127)
    return q.astype(np.int8), scale


@functools.lru_cache(maxsize=None)
def _search_q_fn(kc: int):
    """int8 coarse search: s8×s8 MXU dot → int32, column-rescaled by
    the per-row gallery scales × the per-probe scale, masked top-kc."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(gq, gs, bias, pq, ps, n_valid):
        acc = jax.lax.dot_general(
            pq, gq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        sims = acc.astype(jnp.float32) * ps[:, None] * gs[None, :]
        sims = sims + bias[None, :]
        row = jnp.arange(gq.shape[0])
        sims = jnp.where(row[None, :] < n_valid, sims, -2e9)
        return jax.lax.top_k(sims, kc)

    return run


@functools.lru_cache(maxsize=None)
def _search_scan_fn(k: int, chunk: int, quantized: bool):
    """Huge-batch OOM guard: lax.scan over ``chunk``-row gallery
    slices with a carried running top-k, bounding intermediates at
    (B, chunk) while the exact merge of per-chunk top-ks keeps results
    identical to the plain program (tests assert equality). Engaged
    only past ``scan_sims_bytes`` — measured at 10^7 rows it is NOT
    faster than the plain program (the search is top-k-bound, see
    DeviceGallery.__init__), but a (B, capacity) sims matrix at
    B=256 × 10^7 rows is 10 GB and would OOM without it."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(g, gs, gbias, p, ps, n_valid):
        cap, d = g.shape
        nblk = cap // chunk

        def sims_of(rows, scale, bias, start):
            if quantized:
                acc = jax.lax.dot_general(
                    p, rows, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                s = acc.astype(jnp.float32) * ps[:, None] * scale[None, :]
            else:
                s = jax.lax.dot_general(
                    p.astype(g.dtype), rows, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            s = s + bias[None, :]
            row = start + jnp.arange(rows.shape[0])
            return jnp.where(row[None, :] < n_valid, s, -2e9)

        def merge(carry, s, idx):
            bs, bi = carry
            ms, pos = jax.lax.top_k(
                jnp.concatenate([bs, s], axis=1), k)
            return ms, jnp.take_along_axis(
                jnp.concatenate([bi, idx], axis=1), pos, axis=1)

        bsz = p.shape[0]
        init = (jnp.full((bsz, k), -3e9, jnp.float32),
                jnp.zeros((bsz, k), jnp.int32))

        def step(carry, start):
            rows = jax.lax.dynamic_slice(g, (start, 0), (chunk, d))
            scale = (jax.lax.dynamic_slice(gs, (start,), (chunk,))
                     if quantized else None)
            bias = jax.lax.dynamic_slice(gbias, (start,), (chunk,))
            ts, ti = jax.lax.top_k(sims_of(rows, scale, bias, start),
                                   min(k, chunk))
            return merge(carry, ts, start + ti), None

        starts = jnp.arange(nblk, dtype=jnp.int32) * chunk
        carry, _ = jax.lax.scan(step, init, starts)
        tail = cap - nblk * chunk
        if tail:                        # static remainder block
            rows = jax.lax.slice(g, (nblk * chunk, 0), (cap, d))
            scale = (jax.lax.slice(gs, (nblk * chunk,), (cap,))
                     if quantized else None)
            bias = jax.lax.slice(gbias, (nblk * chunk,), (cap,))
            ts, ti = jax.lax.top_k(
                sims_of(rows, scale, bias, nblk * chunk),
                min(k, tail))
            carry = merge(carry, ts, nblk * chunk + ti)
        return carry

    return run


@functools.lru_cache(maxsize=None)
def _append_fn():
    """In-place (donated) row append inside the current capacity."""
    import jax

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(dev, rows, offset):
        return jax.lax.dynamic_update_slice(
            dev, rows.astype(dev.dtype), (offset, 0))

    return run


@functools.lru_cache(maxsize=None)
def _grow_fn(cap: int):
    """Grown store built ON DEVICE: zeros(cap) <- old <- new rows."""
    import jax
    import jax.numpy as jnp

    # no donation: the grown output has a different shape, so the old
    # buffer can't be reused anyway (it is freed right after)
    @functools.partial(jax.jit, static_argnames=("dt",))
    def run(old, rows, offset, dt):
        out = jnp.zeros((cap, rows.shape[1]), dt)
        out = jax.lax.dynamic_update_slice(
            out, old, (0, 0))
        return jax.lax.dynamic_update_slice(
            out, rows.astype(dt), (offset, 0))

    return run


@functools.lru_cache(maxsize=None)
def _append1_fn():
    """1-D twin of _append_fn, for the int8 store's per-row scales."""
    import jax

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(dev, vals, offset):
        return jax.lax.dynamic_update_slice(
            dev, vals.astype(dev.dtype), (offset,))

    return run


@functools.lru_cache(maxsize=None)
def _grow1_fn(cap: int):
    """1-D twin of _grow_fn: zero-extend a per-row vector (int8
    scales, tombstone bias) to the grown capacity."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(old):
        out = jnp.zeros((cap,), old.dtype)
        return jax.lax.dynamic_update_slice(out, old, (0,))

    return run


class DeviceGallery:
    """Enroll/identify store over L2-normalized embeddings.

    ``block``: device capacity granularity (rows). Searches mask the
    padded tail with −2e9, so scores are exact at any fill level.
    ``dtype``: "float32" | "bfloat16" | "int8" device store (host
    master stays f32; int8 searches are two-stage exact-rescored).
    ``hbm_limit_gb``: device-footprint bound (0 = unbounded) —
    enrollments past it either refuse loudly (``overflow="refuse"``)
    or flip the gallery into streamed-search mode
    (``overflow="stream"``, see module docstring).
    """

    def __init__(self, dim: int, *, block: int = 1024,
                 dtype: str = "float32", hbm_limit_gb: float = 8.0,
                 overflow: str = "refuse"):
        if dim < 1 or block < 1:
            raise ValueError(f"bad dim={dim} / block={block}")
        if dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"dtype must be float32|bfloat16|int8, "
                             f"got {dtype!r}")
        if overflow not in ("refuse", "stream"):
            raise ValueError(f"overflow must be refuse|stream, "
                             f"got {overflow!r}")
        self.dim = int(dim)
        self.block = int(block)
        self.dtype = dtype
        self.itemsize = {"float32": 4, "bfloat16": 2, "int8": 1}[dtype]
        # int8 search is two-stage: device coarse top-(k*rescore_expand)
        # on the quantized store, then exact f32 rescore of only those
        # candidates from the host master — final scores are exact
        self.rescore_expand = 4
        self.hbm_limit_gb = float(hbm_limit_gb)
        self.overflow = overflow
        self._streaming = False
        # past this store size, block-boundary growth re-uploads from
        # host instead of copying on device (2x-HBM-peak avoidance;
        # see _sync_locked)
        self.grow_on_device_max = 2_000_000_000
        # streamed-search slab footprint (bytes of store dtype);
        # tests shrink it to exercise the multi-slab merge
        self.stream_slab_bytes = 1 << 29
        # past this (B, capacity) f32 sims footprint, resident searches
        # switch to the lax.scan program (bounded intermediates, exact
        # merge). This is an OOM GUARD, not a speedup — measured at
        # 10^7 rows, B=64 (v5e): scan 54.2 ms vs plain 32.5 (bf16) and
        # 52.6 vs 52.7 (int8); the plain program is top-k-bound, not
        # intermediate-bound, so chunking only pays once the sims
        # matrix itself would exhaust HBM (e.g. B=256 x 10^7 = 10 GB).
        # Tests shrink it to exercise the chunked path.
        self.scan_sims_bytes = 3 << 30
        # Pallas fused dot+running-top-k for resident f32/bf16 multi-
        # probe searches (ops/pallas_topk.py): never materializes the
        # (B, cap) sims matrix, measured 1.7x the XLA program at
        # B=64 x 10^7 rows. None = auto (TPU, B >= 8); True forces it
        # (CPU tests run the Mosaic interpreter); False disables.
        # Mosaic failures back off (32-search cooldown, permanent
        # after 3 strikes) instead of the r4 one-strike permanent trip
        # — a transient VMEM squeeze must not cost the gallery its
        # fast path for life (advisor r4).
        self.use_pallas = None
        self._pallas_fails = 0
        self._pallas_cooldown = 0
        # tombstones: per-row f32 bias over the HOST fill (0 live,
        # -2e9 dead) mirrored on device; compaction rebuilds once dead
        # rows exceed this fraction of the fill (see remove())
        self.compact_frac = 0.25
        self._tomb = 0
        self._gate = _ReadersWriterGate()
        # host master: doubling-capacity buffers + fill count, so the
        # per-enroll host cost is the new rows (amortized), not a full
        # reallocation of the gallery
        self._host = np.zeros((0, dim), np.float32)
        self._lab = np.zeros((0,), np.int64)
        self._bias = np.zeros((0,), np.float32)
        self._n = 0                 # fill (live + tombstoned rows)
        self._dev = None            # (capacity, D) device array
        self._dev_scale = None      # (capacity,) f32, int8 store only
        self._dev_bias = None       # (capacity,) f32 tombstone bias

    def __len__(self) -> int:
        """LIVE enrollment count (fill minus tombstones)."""
        with self._gate.cond:
            return self._n - self._tomb

    def _capacity_for(self, n: int) -> int:
        return -(-max(n, 1) // self.block) * self.block

    def device_bytes(self, rows: int | None = None) -> int:
        """Device footprint at ``rows`` (default: current fill,
        INCLUDING tombstoned rows — they occupy HBM until compaction)."""
        with self._gate.cond:
            n = self._n if rows is None else rows
        return self._bytes_for(n)

    def _bytes_for(self, n: int) -> int:
        # store rows (+ the int8 per-row scale). The f32 tombstone
        # bias (4 B/row, <1% of any store) and transient score
        # matrices are NOT counted — hbm_limit_gb is a store-footprint
        # guard, not an allocator.
        per_row = self.dim * self.itemsize
        if self.dtype == "int8":
            per_row += 4
        return self._capacity_for(n) * per_row

    def enroll(self, embeddings: np.ndarray, labels) -> int:
        """Append embeddings (N, D) with int labels (N,); → new live
        size.

        Raises :class:`GalleryCapacityError` when the grown device
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
                # reclaim dead rows before refusing/streaming
                self._compact_locked()
                new_n = self._n + embeddings.shape[0]
                need = self._bytes_for(new_n)
                over = need > self.hbm_limit_gb * 1e9
            if over:
                if self.overflow == "stream":
                    if not self._streaming:
                        self._streaming = True
                        self._dev = None    # free the resident store
                        self._dev_scale = None
                        self._dev_bias = None
                else:
                    raise GalleryCapacityError(
                        f"enrolling {embeddings.shape[0]} rows would "
                        f"grow the device store to {need / 1e9:.2f} GB "
                        f"> hbm_limit_gb={self.hbm_limit_gb:g} at "
                        f"dtype={self.dtype}. Options: "
                        f"dtype='bfloat16' (2x rows) or 'int8' (~4x, "
                        f"exact-rescored), overflow='stream' (exact "
                        f"streamed search), raise hbm_limit_gb, or "
                        f"shard offline with cli.search")
            if new_n > self._host.shape[0]:
                new_cap = max(self.block, 2 * self._host.shape[0], new_n)
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
            if not self._streaming:
                self._sync_locked(new_rows=embeddings, offset=offset)
            return self._n - self._tomb

    @property
    def streaming(self) -> bool:
        """True once the store has overflowed into streamed search."""
        with self._gate.cond:
            return self._streaming

    def _np_dtype(self):
        import jax.numpy as jnp

        return {"bfloat16": jnp.bfloat16, "int8": np.int8,
                "float32": np.float32}[self.dtype]

    def _sync_locked(self, new_rows: np.ndarray | None = None,
                     offset: int = 0) -> None:
        """Bring the device array up to date. ``new_rows`` enables the
        incremental path (append/grow on device); None forces a full
        host upload (first sync, compaction, load). Caller must hold
        the write gate."""
        import jax
        import jax.numpy as jnp

        dt = self._np_dtype()
        q8 = self.dtype == "int8"
        n = self._n
        cap = self._capacity_for(n)
        cap_bytes = cap * self.dim * self.itemsize
        cur_cap = self._dev.shape[0] if self._dev is not None else -1
        if new_rows is not None and self._dev is not None:
            if q8:      # quantize on host; int8 rows move 1/4 the bytes
                qrows, qscale = _quantize_rows(new_rows)
                rows = jax.device_put(jnp.asarray(qrows))
                scale = jax.device_put(jnp.asarray(qscale))
            else:
                rows = jax.device_put(jnp.asarray(new_rows))
            if cap == cur_cap:          # in-place donated update
                self._dev = _append_fn()(self._dev, rows,
                                         np.int32(offset))
                if q8:
                    self._dev_scale = _append1_fn()(
                        self._dev_scale, scale, np.int32(offset))
                # bias for fresh rows is 0 — already the buffer value
                # (tombstoned slots live strictly below the old fill)
                return
            # Growing on device holds old + new stores concurrently
            # (~2x cap transient). Fine for small stores; past the
            # threshold, FREE the old array first and re-upload from
            # the host master so the HBM peak is the new cap alone —
            # a latency spike once per block boundary, never an OOM.
            if cap > cur_cap and cap_bytes <= self.grow_on_device_max:
                self._dev = _grow_fn(cap)(self._dev, rows,
                                          np.int32(offset), dt=dt)
                if q8:
                    grown_s = _grow1_fn(cap)(self._dev_scale)
                    self._dev_scale = _append1_fn()(
                        grown_s, scale, np.int32(offset))
                self._dev_bias = _grow1_fn(cap)(self._dev_bias)
                return
            self._dev = None            # free before the big alloc
            self._dev_scale = None
            self._dev_bias = None
        # Full sync streams the host master up in ~0.5 GB slabs into a
        # buffer allocated ON DEVICE (donated in-place appends): peak
        # HBM = cap + one slab. The obvious one-shot
        # device_put(asarray(padded, bf16)) of a 10^7-row store uploads
        # a 20 GB f32 mirror and converts on device — measured OOM on
        # a 16 GB v5e (r4); the slab path loads the same store in-cap.
        # Free the outgoing buffers FIRST for the same reason (advisor
        # r4: the remove/compaction path used to hold old + new).
        self._dev = None
        self._dev_scale = None
        self._dev_bias = None
        dev = jnp.zeros((cap, self.dim), dt)
        dscale = jnp.zeros((cap,), np.float32) if q8 else None
        slab = max(self.block, (1 << 29) // (self.dim * 4))
        for i in range(0, n, slab):
            j = min(i + slab, n)
            if q8:      # quantize, never cast: astype(int8) truncates
                qrows, qscale = _quantize_rows(self._host[i:j])
                dev = _append_fn()(dev, jnp.asarray(qrows), np.int32(i))
                dscale = _append1_fn()(dscale, jnp.asarray(qscale),
                                       np.int32(i))
            else:
                # cast on host: bf16 moves half the bytes over PCIe
                dev = _append_fn()(
                    dev, jnp.asarray(self._host[i:j].astype(dt)),
                    np.int32(i))
        self._dev = dev
        self._dev_scale = dscale
        # tombstone bias: tiny (cap × 4 B) — one padded upload. All-
        # zero after compaction/load, but the general grow-past-
        # grow_on_device_max path can carry live tombstones here.
        bias = np.zeros((cap,), np.float32)
        bias[:n] = self._bias[:n]
        self._dev_bias = jax.device_put(jnp.asarray(bias))

    def search(self, embeddings: np.ndarray, k: int = 5):
        """Top-``k`` matches per probe → (labels (B,k) int64,
        scores (B,k) f32). Probes and gallery are assumed
        L2-normalized (the extractor's output); ``k`` clamps to the
        current live size."""
        import jax.numpy as jnp

        with self._gate.read():
            n = self._n
            n_live = self._n - self._tomb
            dev = self._dev
            dev_scale = self._dev_scale
            dev_bias = self._dev_bias
            streaming = self._streaming
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
            if self.dtype == "int8":
                # two-stage: device coarse over the quantized store,
                # then exact f32 rescore of only the candidate rows —
                # final scores carry no quantization error
                kc = min(k * self.rescore_expand, n_live)
                if streaming:
                    cand, _ = self._stream_search(host, bias, n, e, kc)
                else:
                    pq, ps = _quantize_rows(e)
                    # the Pallas kernel never materializes the (B, cap)
                    # sims matrix, so it outranks the scan OOM guard —
                    # huge probe batches lax.map over VMEM-sized chunks
                    # inside one jit (each chunk re-reads the store;
                    # still far cheaper than the sims traffic)
                    if self._pallas_ok(dev, e.shape[0]):
                        cand = self._pallas_search_q(
                            dev, dev_scale, dev_bias, pq, ps, n, kc)
                    else:
                        chunk = self._scan_chunk(e.shape[0],
                                                 dev.shape[0])
                        fn = (_search_scan_fn(kc, chunk, True) if chunk
                              else _search_q_fn(kc))
                        _, ci = fn(dev, dev_scale, dev_bias,
                                   jnp.asarray(pq), jnp.asarray(ps),
                                   jnp.int32(n))
                        cand = np.asarray(ci)
                idx, scores = _rescore(host, n, e, cand, k, bias)
            elif streaming:
                idx, scores = self._stream_search(host, bias, n, e, k)
            elif self._pallas_ok(dev, e.shape[0]):
                # kernel outranks the scan guard: it never materializes
                # the (B, cap) sims matrix, so the guard's OOM cannot
                # happen; big batches lax.map over VMEM-sized probe
                # chunks INSIDE one jit (one dispatch, one tunnel RTT)
                scores, idx = self._pallas_search(dev, dev_bias, e, n,
                                                  k)
            else:
                chunk = self._scan_chunk(e.shape[0], dev.shape[0])
                if chunk:
                    dummy = jnp.zeros((1,), np.float32)
                    scores, idx = _search_scan_fn(k, chunk, False)(
                        dev, dummy, dev_bias, jnp.asarray(e), dummy,
                        jnp.int32(n))
                else:
                    scores, idx = _search_fn(k)(dev, dev_bias,
                                                jnp.asarray(e),
                                                jnp.int32(n))
                idx = np.asarray(idx)
            return labels[idx], np.asarray(scores)

    def _pallas_ok(self, dev, batch: int) -> bool:
        from tf_face_toolbox_tpu.ops.pallas_topk import (
            BLK,
            default_blk,
        )

        if (self.use_pallas is False or dev.shape[0] % BLK
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
        # measured at 10^7 bf16 rows (v5e): blk>=2048 runs 750 GB/s at
        # ANY batch (B=1 13.6 ms vs XLA 13.7; B=64 13.6 vs 31.7); a
        # 1024-only capacity is slower than XLA at B=1 (17.5 ms) but
        # still 1.6x XLA at B>=8
        blk = default_blk(dev.shape[0], dev.shape[1],
                          dev.dtype.itemsize)
        return blk >= 2048 or batch >= 8

    def _pallas_backoff(self, what: str) -> None:
        """Mosaic failure: 32-search cooldown; permanent only after 3
        strikes (advisor r4 — one transient VMEM squeeze must not
        disable the kernel for the gallery's lifetime)."""
        from absl import logging

        self._pallas_fails += 1
        self._pallas_cooldown = 32
        logging.warning(
            "pallas %s failed (strike %d/3); falling back to the XLA "
            "program%s", what, self._pallas_fails,
            " permanently" if self._pallas_fails >= 3
            else " for the next 32 searches", exc_info=True)

    def _pallas_search(self, dev, dev_bias, e, n: int, k: int):
        import jax
        import jax.numpy as jnp

        from tf_face_toolbox_tpu.ops import pallas_topk

        try:
            if jax.default_backend() == "tpu":
                s, i = pallas_topk.cosine_topk_batched(
                    dev, jnp.asarray(e), jnp.int32(n), k,
                    bias=dev_bias)
            else:
                # interpret path (CPU tests): host-side chunk loop —
                # the Mosaic interpreter can't run under the batched
                # wrapper's jit
                parts = [pallas_topk.cosine_topk_impl(
                    dev, jnp.asarray(e[i:i + _PROBE_CHUNK]),
                    jnp.int32(n), k, interpret=True, bias=dev_bias)
                    for i in range(0, e.shape[0], _PROBE_CHUNK)]
                s = jnp.concatenate([p[0] for p in parts])
                i = jnp.concatenate([p[1] for p in parts])
            # materialize INSIDE the try: device-side failures only
            # surface at execution, and must trip the fallback too
            return np.asarray(s), np.asarray(i)
        except Exception:       # Mosaic shape/VMEM edge: fall back
            self._pallas_backoff("gallery search")
            s, i = _search_fn(k)(dev, dev_bias, jnp.asarray(e),
                                 jnp.int32(n))
            return np.asarray(s), np.asarray(i)

    def _pallas_search_q(self, dev, dev_scale, dev_bias, pq, ps,
                         n: int, kc: int):
        import jax
        import jax.numpy as jnp

        from tf_face_toolbox_tpu.ops import pallas_topk

        try:
            if jax.default_backend() == "tpu":
                _, ci = pallas_topk.cosine_topk_q_batched(
                    dev, dev_scale, jnp.asarray(pq), jnp.asarray(ps),
                    jnp.int32(n), kc, bias=dev_bias)
            else:
                parts = [pallas_topk.cosine_topk_q_impl(
                    dev, dev_scale,
                    jnp.asarray(pq[i:i + _PROBE_CHUNK]),
                    jnp.asarray(ps[i:i + _PROBE_CHUNK]),
                    jnp.int32(n), kc, interpret=True,
                    bias=dev_bias)[1]
                    for i in range(0, pq.shape[0], _PROBE_CHUNK)]
                ci = jnp.concatenate(parts)
            return np.asarray(ci)
        except Exception:       # Mosaic shape/VMEM edge: fall back
            self._pallas_backoff("int8 gallery search")
            _, ci = _search_q_fn(kc)(dev, dev_scale, dev_bias,
                                     jnp.asarray(pq), jnp.asarray(ps),
                                     jnp.int32(n))
            return np.asarray(ci)

    def _scan_chunk(self, batch: int, cap: int) -> int:
        """Chunk rows for the scanned search, or 0 for the plain
        program. Chunk size keeps the per-step (B, chunk) sims near
        ``scan_sims_bytes``; scanning only pays off once the full
        (B, cap) sims would exceed that budget."""
        if batch * cap * 4 <= self.scan_sims_bytes:
            return 0
        r = max(self.block,
                min(self.scan_sims_bytes // (4 * batch), 1 << 21))
        r = (r // self.block) * self.block
        return r if cap > r else 0

    def _slab_rows(self) -> int:
        """Streaming slab size: ~0.5 GB of store dtype, block-aligned
        (one shape → one compiled per-slab program per probe batch)."""
        r = max(self.block,
                self.stream_slab_bytes // (self.dim * self.itemsize))
        return -(-r // self.block) * self.block

    def _stream_search(self, host: np.ndarray, bias: np.ndarray,
                       n: int, probes: np.ndarray, k: int):
        """Exact top-k over a store larger than the device bound:
        stream fixed slabs through the chip (same compiled program as
        the resident path), merge the per-slab winners on host. Device
        HBM peak = one slab + (B, slab) scores; every slab contributes
        its own top-k, so the merged result equals the resident
        search's bit for bit (tests/test_gallery.py)."""
        import jax.numpy as jnp

        slab = self._slab_rows()
        # a slab can't contribute more rows than it has, so per-slab
        # top-min(k, slab) still merges to the exact global top-k
        ks = min(k, slab)
        dt = self._np_dtype()
        q8 = self.dtype == "int8"
        if q8:
            fn = _search_q_fn(ks)
            pq, ps = _quantize_rows(probes)
            p, p_s = jnp.asarray(pq), jnp.asarray(ps)
        else:
            fn = _search_fn(ks)
            p = jnp.asarray(probes)
        parts_s, parts_i = [], []
        for i in range(0, n, slab):
            j = min(i + slab, n)
            if q8:
                chunk, cscale = _quantize_rows(host[i:j])
            else:
                chunk = host[i:j].astype(dt)
            bslab = bias[i:j]
            if j - i < slab:            # pad the tail: shape-stable jit
                pad = np.zeros((slab, self.dim), dt)
                pad[:j - i] = chunk
                chunk = pad
                bpad = np.zeros((slab,), np.float32)
                bpad[:j - i] = bslab
                bslab = bpad
                if q8:
                    spad = np.zeros((slab,), np.float32)
                    spad[:j - i] = cscale
                    cscale = spad
            if q8:
                s, ix = fn(jnp.asarray(chunk), jnp.asarray(cscale),
                           jnp.asarray(bslab), p, p_s,
                           jnp.int32(j - i))
            else:
                s, ix = fn(jnp.asarray(chunk), jnp.asarray(bslab), p,
                           jnp.int32(j - i))
            parts_s.append(np.asarray(s))
            parts_i.append(np.asarray(ix) + i)
        all_s = np.concatenate(parts_s, axis=1)
        all_i = np.concatenate(parts_i, axis=1)
        top = np.argpartition(-all_s, k - 1, axis=1)[:, :k]
        rows = np.arange(all_s.shape[0])[:, None]
        sel_s = all_s[rows, top]
        order = np.argsort(-sel_s, axis=1, kind="stable")
        return all_i[rows, top][rows, order], sel_s[rows, order]

    def remove(self, label: int) -> int:
        """Drop every enrollment of ``label``; → rows removed.

        O(removed): marks the rows in the tombstone bias (host + one
        small device scatter) — every search program masks them, so
        results are exact immediately. The full rebuild (compaction)
        is deferred until tombstones exceed ``compact_frac`` of the
        fill, the store empties, or a streaming store shrinks back
        under the residency bound."""
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
            n_live = fill - self._tomb
            live_bytes = self._bytes_for(n_live)
            fits = (not self.hbm_limit_gb
                    or live_bytes <= self.hbm_limit_gb * 1e9)
            if (n_live == 0
                    or (self._streaming and fits)
                    or self._tomb >= max(self.block,
                                         self.compact_frac * fill)):
                self._compact_locked()
            elif self._dev_bias is not None:
                import jax.numpy as jnp

                # pad the scatter indices to the next power of two
                # (repeats are idempotent) so the op-by-op compile
                # cache sees a bounded set of shapes
                pad = 1 << (len(idx) - 1).bit_length()
                idxp = np.concatenate(
                    [idx, np.full(pad - len(idx), idx[0], idx.dtype)])
                self._dev_bias = self._dev_bias.at[
                    jnp.asarray(idxp, jnp.int32)].set(_TOMB)
            return removed

    def _compact_locked(self) -> int:
        """Rebuild without tombstoned rows; → live count. In-place on
        the host buffers (safe: the write gate drained all readers),
        full device re-upload with the old store freed first. A
        streaming store that now fits the bound resumes residency."""
        fill = self._n
        live = self._bias[:fill] == 0.0
        kept = int(live.sum())
        if kept != fill:
            self._host[:kept] = self._host[:fill][live]
            self._lab[:kept] = self._lab[:fill][live]
        self._bias[:fill] = 0.0
        self._n = kept
        self._tomb = 0
        self._dev = None
        self._dev_scale = None
        self._dev_bias = None
        if self._streaming:
            need = self._bytes_for(kept)
            if (not self.hbm_limit_gb
                    or need <= self.hbm_limit_gb * 1e9):
                self._streaming = False     # residency resumes
        if kept and not self._streaming:
            self._sync_locked()
        return kept

    # ------------------------------------------------------ persistence

    def save(self, path: str) -> int:
        """Atomic snapshot (live rows only) → .npz; returns the row
        count written."""
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
    def load(cls, path: str, *, block: int = 1024,
             dtype: str = "float32", hbm_limit_gb: float = 8.0,
             overflow: str = "refuse") -> "DeviceGallery":
        data = np.load(path, allow_pickle=False)
        emb = np.asarray(data["embeddings"], np.float32)
        g = cls(emb.shape[1], block=block, dtype=dtype,
                hbm_limit_gb=hbm_limit_gb, overflow=overflow)
        if emb.shape[0]:
            g.enroll(emb, data["labels"])
        return g
