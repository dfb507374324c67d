"""Host-side input pipeline: shuffle, decode, batch, device prefetch.

Rebuild of the reference's queue-runner input stage (ref: upstream
data/*.py [UPSTREAM-K]; TF1 filename-queue → reader → shuffle_batch
idiom) as an explicit, deterministic pipeline:

- **Global shuffle by index**: FaceShard's contiguous index makes an
  epoch a seeded permutation of record ids — no filename queues, exactly
  reproducible from (seed, epoch, step), which is what checkpoint/resume
  needs (SURVEY.md §5: "deterministic resume ... data position").
- **Per-host sharding**: each JAX process takes ids where
  ``id % num_hosts == host``; per-host batches feed that host's local
  devices (the multi-host story of SURVEY.md §2b).
- **Threaded decode**: JPEG decode on host CPU threads (PIL/libjpeg) —
  the equivalent of TF's C++ decode ops; the native C++ loader
  (native/faceshard) replaces this on production hosts.
- **Device prefetch**: a depth-2 queue of batches already transferred
  with ``jax.device_put`` so H2D overlaps the train step — the
  double-buffering BASELINE.json asks for.

Augmentation (crop/flip/standardize) deliberately does NOT happen here:
it runs on-device inside the jitted train step (ops/preprocess.py +
ops/pallas_preprocess.py), keeping the host loop to decode+batch only.
"""

from __future__ import annotations

import collections
import io
import queue
import threading
from typing import Callable, Iterator

import numpy as np

from tf_face_toolbox_tpu.data.format import (
    PAYLOAD_RAW,
    ShardReader,
    read_index,
)


def _decode_jpeg(blob: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(blob))
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, np.uint8)


class FaceShardSource:
    """Deterministic, shardable record source over one FaceShard file."""

    def __init__(self, path: str, *, seed: int = 0,
                 host_index: int = 0, host_count: int = 1):
        self.index = read_index(path)
        self.reader = ShardReader(self.index)
        self.seed = seed
        self.host_index = host_index
        self.host_count = host_count
        ids = np.arange(self.index.count)
        self._host_ids = ids[ids % host_count == host_index]

    @property
    def num_records(self) -> int:
        return len(self._host_ids)

    @property
    def num_classes(self) -> int:
        return int(self.index.labels.max()) + 1 if self.index.count else 0

    def epoch_order(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng((self.seed, epoch))
        return rng.permutation(self._host_ids)

    def record(self, rid: int) -> tuple[np.ndarray, int]:
        if self.index.payload == PAYLOAD_RAW:
            img = self.reader.raw(rid)
        else:
            img = _decode_jpeg(self.reader.blob(rid))
        return img, self.reader.label(rid)


def _resize_u8(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Half-pixel bilinear resize — the SAME math as the device resize
    (ops/preprocess) and the native C++ loader, so the loader choice
    never changes training pixels. (PIL's BILINEAR antialiases on
    downscale and diverges badly — don't substitute it.)"""
    if img.shape[0] == h and img.shape[1] == w:
        return img
    from tf_face_toolbox_tpu.ops.preprocess import _bilinear_matrix
    rh = _bilinear_matrix(h, img.shape[0])          # (h, H)
    rw = _bilinear_matrix(w, img.shape[1])          # (w, W)
    out = np.einsum("oh,hwc->owc", rh, img.astype(np.float32))
    out = np.einsum("pw,owc->opc", rw, out)
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def batch_iterator(source: FaceShardSource, batch_size: int, *,
                   start_epoch: int = 0, start_step: int = 0,
                   num_threads: int = 4,
                   resize_to: tuple[int, int] | None = None) -> Iterator[dict]:
    """Infinite (epoch-cycling) iterator of {'image','label','epoch','step'}.

    Resume: pass the (epoch, step-within-epoch) recorded in the
    checkpoint and the stream continues exactly where it left off.

    ``resize_to=(h, w)``: resize decodes to a fixed geometry — REQUIRED
    for mixed-size JPEG datasets (np.stack needs uniform shapes) and
    keeps pixel semantics identical to the native loader, which always
    resizes to its output geometry.
    """
    steps_per_epoch = source.num_records // batch_size
    if steps_per_epoch == 0:
        raise ValueError(
            f"dataset has {source.num_records} records (per host) — "
            f"smaller than one batch of {batch_size}")
    epoch, step = start_epoch, start_step

    pool = _DecodePool(source, num_threads) if num_threads > 1 else None
    try:
        while True:
            order = source.epoch_order(epoch)
            while step < steps_per_epoch:
                ids = order[step * batch_size:(step + 1) * batch_size]
                transform = ((lambda im: _resize_u8(im, *resize_to))
                             if resize_to is not None else None)
                if pool is not None:
                    records = pool.decode(ids, transform)
                else:
                    records = [source.record(int(i)) for i in ids]
                    if transform is not None:
                        records = [(transform(img), lab)
                                   for img, lab in records]
                images = np.stack([r[0] for r in records])
                labels = np.asarray([r[1] for r in records], np.int32)
                yield {"image": images, "label": labels,
                       "epoch": epoch, "step": step}
                step += 1
            epoch, step = epoch + 1, 0
    finally:
        if pool is not None:
            pool.close()


class _DecodePool:
    """Fixed thread pool that decodes a batch of record ids in parallel."""

    def __init__(self, source: FaceShardSource, num_threads: int):
        self.source = source
        self._in: queue.Queue = queue.Queue()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_threads)]
        for t in self._threads:
            t.start()

    def _worker(self):
        while True:
            item = self._in.get()
            if item is None:
                return
            slot, rid, out, done, transform = item
            # A raising record (corrupt JPEG, bad id) must not kill the
            # worker silently — that would deadlock decode() forever.
            try:
                img, lab = self.source.record(rid)
                if transform is not None:
                    img = transform(img)
                out[slot] = (img, lab)
                done.put((slot, None))
            except Exception as e:  # noqa: BLE001 — reraised in decode()
                done.put((slot, e))

    def decode(self, ids, transform=None) -> list:
        out = [None] * len(ids)
        done: queue.Queue = queue.Queue()
        for i, rid in enumerate(ids):
            self._in.put((i, int(rid), out, done, transform))
        error = None
        for _ in ids:
            _, err = done.get()
            error = error or err
        if error is not None:
            raise error
        return out

    def close(self):
        for _ in self._threads:
            self._in.put(None)


def balanced_batch_iterator(source: FaceShardSource, *,
                            ids_per_batch: int, images_per_id: int,
                            start_step: int = 0,
                            num_threads: int = 4,
                            resize_to: tuple[int, int] | None = None,
                            ) -> Iterator[dict]:
    """P×K identity-balanced batches (P ids × K images each).

    The standard sampler for metric-learning losses: every batch
    contains several images of each sampled identity, so the margin
    objective always sees positive pairs. Deterministic from
    (source.seed, step) — resumable by ``start_step`` alone.

    ``resize_to=(h, w)``: same fixed-geometry decode transform as
    ``batch_iterator`` (REQUIRED for mixed-size datasets).
    """
    labels = source.index.labels
    by_id: dict[int, np.ndarray] = {}
    host_set = set(source._host_ids.tolist())
    for rid, lab in enumerate(labels):
        if rid in host_set:
            by_id.setdefault(int(lab), []).append(rid)
    eligible = [lab for lab, rids in by_id.items()
                if len(rids) >= images_per_id]
    if len(eligible) < ids_per_batch:
        raise ValueError(
            f"only {len(eligible)} identities have >= {images_per_id} "
            f"images; need {ids_per_batch}")
    eligible = np.asarray(sorted(eligible))
    id_arrays = {lab: np.asarray(by_id[lab]) for lab in eligible}

    pool = _DecodePool(source, num_threads) if num_threads > 1 else None
    transform = ((lambda im: _resize_u8(im, *resize_to))
                 if resize_to is not None else None)
    step = start_step
    try:
        while True:
            rng = np.random.default_rng((source.seed, step))
            chosen = rng.choice(eligible, ids_per_batch, replace=False)
            ids = np.concatenate([
                rng.choice(id_arrays[lab], images_per_id, replace=False)
                for lab in chosen])
            if pool is not None:
                records = pool.decode(ids, transform=transform)
            else:
                records = [source.record(int(i)) for i in ids]
                if transform is not None:
                    records = [(transform(im), lab)
                               for im, lab in records]
            yield {"image": np.stack([r[0] for r in records]),
                   "label": np.asarray([r[1] for r in records], np.int32),
                   "epoch": 0, "step": step}
            step += 1
    finally:
        if pool is not None:
            pool.close()


def _native_epoch_batches(source: FaceShardSource, batch_size: int, *,
                          start_epoch: int, start_step: int,
                          num_threads: int, fetch) -> Iterator[dict]:
    """Shared epoch/ordering/resume/prefetch loop of the native-loader
    iterators; ``fetch(reader, ids)`` produces the batch's image value.
    ONE copy of the resume semantics — both public iterators must stay
    behaviorally identical to ``batch_iterator``."""
    from tf_face_toolbox_tpu.data.native import NativeShardReader

    reader = NativeShardReader(source.index.path, num_threads=num_threads)
    steps_per_epoch = source.num_records // batch_size
    if steps_per_epoch == 0:
        reader.close()
        raise ValueError(
            f"dataset has {source.num_records} records (per host) — "
            f"smaller than one batch of {batch_size}")
    epoch, step = start_epoch, start_step
    try:
        while True:
            order = source.epoch_order(epoch)
            while step < steps_per_epoch:
                ids = order[step * batch_size:(step + 1) * batch_size]
                if step + 1 < steps_per_epoch:
                    # IO lookahead: page in batch k+1's records while
                    # batch k decodes (madvise WILLNEED — overlaps
                    # cold-shard read latency with decode).
                    reader.prefetch(
                        order[(step + 1) * batch_size:
                              (step + 2) * batch_size])
                yield {"image": fetch(reader, ids),
                       "label": reader.labels[ids],
                       "epoch": epoch, "step": step}
                step += 1
            epoch, step = epoch + 1, 0
    finally:
        reader.close()


def native_batch_iterator(source: FaceShardSource, batch_size: int, *,
                          out_h: int, out_w: int,
                          start_epoch: int = 0, start_step: int = 0,
                          num_threads: int = 4) -> Iterator[dict]:
    """batch_iterator with decode+resize in the native C++ loader.

    Identical ordering/labels/resume semantics to ``batch_iterator``
    (same FaceShardSource drives the shuffle); only the pixel path runs
    through native/faceshard's mmap + libjpeg thread pool. Output
    images are fixed (batch, out_h, out_w, 3) uint8.
    """
    return _native_epoch_batches(
        source, batch_size, start_epoch=start_epoch,
        start_step=start_step, num_threads=num_threads,
        fetch=lambda reader, ids: reader.decode_batch(ids, out_h, out_w))


def native_dct_batch_iterator(source: FaceShardSource, batch_size: int, *,
                              size: int, start_epoch: int = 0,
                              start_step: int = 0,
                              num_threads: int = 4) -> Iterator[dict]:
    """``native_batch_iterator`` with host entropy-decode only: yields
    ``image`` as a (coef, qtab) tuple for the train step's on-device
    JPEG completion (ops/jpeg_tpu.decode_dct — zero device cost,
    ~4x the host decode rate; docs/design.md). Needs a uniform 4:4:4
    shard of exactly ``size``² geometry (cli.pack --recode_size=size,
    with size = cfg.crop_from). Same ordering/resume semantics as the
    other iterators.
    """
    return _native_epoch_batches(
        source, batch_size, start_epoch=start_epoch,
        start_step=start_step, num_threads=num_threads,
        fetch=lambda reader, ids: reader.dct_batch(ids, size, size))


def mixture_sources(paths, *, seed: int = 0, host_index: int = 0,
                    host_count: int = 1) -> list[FaceShardSource]:
    """Open the per-source readers for a shard mixture, with the
    distinct per-source shuffle seeds ``mixed_batch_iterator`` expects
    (decorrelated permutations). Callers that need source metadata
    (num_classes sums) pass the result back via ``sources=`` so each
    index is opened exactly once."""
    return [FaceShardSource(p, seed=seed + 9973 * i,
                            host_index=host_index,
                            host_count=host_count)
            for i, p in enumerate(paths)]


def mixed_batch_iterator(paths, batch_size: int, *,
                         weights=None, seed: int = 0,
                         start_step: int = 0,
                         resize_to: tuple[int, int] | None = None,
                         num_threads: int = 4,
                         host_index: int = 0,
                         host_count: int = 1,
                         sources: list[FaceShardSource] | None = None,
                         ) -> Iterator[dict]:
    """Weighted online mixture over several FaceShards.

    The production multi-dataset recipe (clean + web-noisy sources at a
    chosen ratio — the companion to the adaface_noisy_data preset)
    without an offline re-pack: each STEP draws its whole batch from
    one source, picked by ``weights`` from a deterministic per-seed
    choice stream, so the augment/step program is identical to
    single-source training. Identity spaces are DISJOINT: source i's
    labels are offset by the summed ``num_classes`` of sources before
    it, and the caller trains with ``sum(num_classes)`` classes (the
    same relabeling cli.merge applies offline).

    Resume: pass the global step; the choice stream's first
    ``start_step`` draws are replayed in one vectorized call and each
    per-source iterator fast-forwards through its own seeded
    permutation (the single-source deterministic-resume contract,
    per source).

    ``sources``: pre-opened ``mixture_sources(paths, ...)`` (the caller
    keeps them for num_classes etc. without a second index open). A
    plain function (not a generator), so argument errors raise at call
    time, not at the first ``next()`` out of a prefetch thread.
    """
    if isinstance(paths, str):
        paths = [p for p in paths.split(",") if p]
    n = len(paths)
    if n < 2:
        raise ValueError("mixed_batch_iterator needs >= 2 shards; "
                         "use batch_iterator for one")
    w = np.asarray([1.0] * n if weights is None else weights, np.float64)
    if len(w) != n or (w <= 0).any():
        raise ValueError(f"need {n} positive weights, got {list(w)}")
    cum = np.cumsum(w / w.sum())

    if sources is None:
        sources = mixture_sources(paths, seed=seed,
                                  host_index=host_index,
                                  host_count=host_count)
    offsets = np.concatenate(
        [[0], np.cumsum([s.num_classes for s in sources])[:-1]]
    ).astype(np.int64)

    # One deterministic choice stream; resume replays the prefix in one
    # vectorized draw (~ns/step) instead of stepping an RNG in Python.
    choice_rng = np.random.default_rng((seed, 0x313E))
    consumed = [0] * n
    if start_step:
        prefix = np.searchsorted(cum, choice_rng.random(start_step),
                                 side="right").clip(0, n - 1)
        for i in range(n):
            consumed[i] = int((prefix == i).sum())

    iters = []
    for i, s in enumerate(sources):
        spe = s.num_records // batch_size
        if spe == 0:
            raise ValueError(
                f"{paths[i]}: {s.num_records} records (per host) — "
                f"smaller than one batch of {batch_size}")
        iters.append(batch_iterator(
            s, batch_size, start_epoch=consumed[i] // spe,
            start_step=consumed[i] % spe, num_threads=num_threads,
            resize_to=resize_to))

    def gen():
        t = start_step
        while True:
            i = int(np.searchsorted(cum, choice_rng.random(),
                                    side="right").clip(0, n - 1))
            b = next(iters[i])
            yield {"image": b["image"],
                   "label": (b["label"].astype(np.int64)
                             + offsets[i]).astype(np.int32),
                   "source": i, "step": t}
            t += 1

    return gen()


def host_prefetch(it: Iterator[dict], *, depth: int = 2) -> Iterator[dict]:
    """Run the upstream iterator (decode+batch) in a background thread.

    Without this, each ``next()`` decodes synchronously on the training
    thread — the decode pool parallelizes within a batch but still sits
    on the critical path. A bounded queue keeps ``depth`` batches ready.
    Exceptions (e.g. corrupt records) propagate to the consumer.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def producer():
        try:
            for item in it:
                q.put(item)
        except Exception as e:  # noqa: BLE001 — reraised below
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, Exception):
            raise item
        yield item


def device_prefetch(it: Iterator[dict], *, depth: int = 2,
                    put: Callable | None = None) -> Iterator[dict]:
    """Overlap H2D transfer with compute: keep ``depth`` batches in
    flight on device (the TF queue-runner prefetch equivalent)."""
    import jax

    put = put or jax.device_put
    buf = collections.deque()

    def puttable(v):
        return isinstance(v, np.ndarray) or (
            isinstance(v, tuple)  # e.g. the DCT path's (coef, qtab)
            and all(isinstance(x, np.ndarray) for x in v))

    for item in it:
        buf.append({k: (put(v) if puttable(v) else v)
                    for k, v in item.items()})
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
