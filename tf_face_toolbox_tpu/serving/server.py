"""Embedding serving daemon: dynamic batching over the jitted extractor.

The reference era served face embeddings by wrapping ``features.py`` in
ad-hoc scripts (SURVEY.md §3.2 — batch extraction only). Production
serving on TPU wants one resident compiled program and request
coalescing, so this module provides the missing deployment piece:

- ``EmbeddingService``: owns the variables + ONE jitted fixed-batch
  flip-averaged forward (pad-to-batch; XLA never recompiles), the eval
  preprocess chain, and host JPEG decode for single-image requests.
- ``DynamicBatcher``: lock-free-enough request queue; a worker thread
  drains up to ``max_batch`` requests or waits ``max_wait_ms`` for
  stragglers, runs the device once, and resolves per-request futures.
  Coalescing is what keeps a v5e chip at its ~30k faces/sec batch rate
  instead of the ~100/sec a batch=1 loop would manage.
- ``serve()``: a threaded HTTP front-end (stdlib http.server — no new
  dependencies): POST /embed (body: JPEG or raw npy) → JSON embedding;
  POST /embed_batch (npy (N, H, W, 3) → N embeddings, chunks
  pipeline-dispatched); ``Accept: application/x-npy`` on either POST
  returns the embeddings as a binary .npy body instead of JSON (the
  JSON float encode dominates bulk responses); GET /healthz; GET
  /stats (requests, device
  calls, mean batch fill, p50/p95/p99 latency — overall and split per
  endpoint, since coalesced singles and bulk sweeps have different
  latency regimes).
- ``grpc_server.serve_grpc()``: the same service over gRPC (see
  serving/grpc_server.py) for deployments fronted by gRPC load
  balancers.

CLI: ``python -m tf_face_toolbox_tpu.cli.serve --checkpoint_dir=... --port=...``
"""

from __future__ import annotations

import collections
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp


class EmbeddingService:
    """Fixed-batch jitted extraction service.

    The pixel chain is EXACTLY extract_shard's eval chain, so an
    embedding served online is comparable with one extracted offline
    (and with the scales static-int8 calibration fits): host decode +
    half-pixel bilinear resize to ``crop_from`` (data.pipeline's
    ``_resize_u8`` — NOT PIL's antialiasing resample), then on-device
    center-crop to ``image_size`` + standardize (``preprocess_eval``).
    ``apply_fn(variables, images) -> embeddings`` is the eval forward
    (net.apply or a serving-engine fold). Images enter
    :meth:`embed_batch` as uint8 ``(crop_from, crop_from, 3)``;
    :meth:`decode_request` produces that from raw JPEG/npy bytes.
    """

    def __init__(self, net, variables, *, image_size: int = 112,
                 crop_from: int = 0, batch: int = 32,
                 apply_fn: Callable | None = None, dtype=jnp.bfloat16,
                 norm: str = "per_image", step: int | None = None):
        self._net = net
        self._dtype = dtype
        # "per_image" | "fixed" — imported InsightFace-ecosystem
        # checkpoints serve with the fixed norm they trained with
        # (ops/preprocess.py); wrong norm silently destroys accuracy.
        self.norm = norm
        self.batch = int(batch)
        self.image_size = int(image_size)
        self.crop_from = int(crop_from) or image_size + 8
        if self.crop_from < image_size:
            raise ValueError(f"crop_from ({self.crop_from}) must be "
                             f">= image_size ({image_size})")
        # (forward, variables) swap as ONE reference so a hot reload
        # can never pair a new program with old weights mid-dispatch
        self._model = (self._build_forward(apply_fn), variables)
        # a custom apply_fn (the folded engine) bakes weights into its
        # closure and IGNORES the variables argument — reload() must
        # refuse a bare variable swap on such a service (it would
        # advance step/reloads while embeddings stay stale)
        self._weights_baked = apply_fn is not None
        # serving metadata: checkpoint step currently live (None =
        # fresh init / .npz source) and hot-reload count — both
        # surfaced on /healthz and /stats
        self.step = step
        self.reloads = 0

    def _build_forward(self, apply_fn: Callable | None) -> Callable:
        from tf_face_toolbox_tpu.extract import flip_averaged_embeddings
        from tf_face_toolbox_tpu.ops.preprocess import preprocess_eval

        net, dtype, image_size = self._net, self._dtype, self.image_size
        norm = self.norm
        if apply_fn is None:
            def apply_fn(v, x):
                return net.apply(v, x, train=False)

        @jax.jit
        def forward(variables, images_u8):
            x = preprocess_eval(images_u8, image_size, image_size, norm)
            x = x.astype(dtype)
            # quality (pre-normalization feature magnitude — MagFace's
            # signal) always rides along: one (N,) scalar per face is
            # free next to the embedding, and a resident program can't
            # be re-specialized per request
            return flip_averaged_embeddings(apply_fn, variables, x,
                                            with_quality=True)

        return forward

    @property
    def _variables(self):
        return self._model[1]

    @property
    def _forward(self):
        return self._model[0]

    def warmup(self) -> None:
        """Compile the fixed-batch program before accepting traffic."""
        forward, variables = self._model
        dummy = np.zeros(
            (self.batch, self.crop_from, self.crop_from, 3), np.uint8)
        jax.block_until_ready(forward(variables, jnp.asarray(dummy)))

    def reload(self, variables, *, apply_fn: Callable | None | type(...) = ...,
               step: int | None = None) -> None:
        """Hot-swap the served weights without dropping traffic.

        The TF-Serving-style version-advance the reference era got from
        pointing the serving binary at a SavedModel dir [TF1-IDIOM]:

        - ``apply_fn`` omitted (the flax / int8 paths, where weights
          are a real argument of the compiled program): the new tree is
          validated leaf-by-leaf against the live one (same structure,
          shapes, dtypes — anything else would silently retrace the
          warmed program) and swapped in with ZERO recompilation.
        - ``apply_fn`` passed (the folded engine bakes weights into the
          closure): a new forward is built and warmed HERE, off the
          request path, before the atomic swap.

        In-flight batches finish on whichever (forward, variables) pair
        they dispatched with; there is no torn state because the pair
        swaps as one reference.
        """
        live = jax.tree.map(
            lambda a: (getattr(a, "shape", ()), str(getattr(a, "dtype", ""))),
            self._model[1])
        new = jax.tree.map(
            lambda a: (getattr(a, "shape", ()), str(getattr(a, "dtype", ""))),
            variables)
        if live != new:
            raise ValueError(
                "reload variables do not match the live tree "
                "(structure/shape/dtype); a mismatched swap would "
                "recompile the warmed program — refuse instead")
        if apply_fn is ...:
            if self._weights_baked:
                raise ValueError(
                    "this service's forward bakes weights into its "
                    "closure (custom apply_fn / folded engine); a bare "
                    "variable swap would be a silent no-op — pass the "
                    "rebuilt apply_fn to reload()")
            forward = self._model[0]          # same jitted program
        else:
            forward = self._build_forward(apply_fn)
            dummy = np.zeros(
                (self.batch, self.crop_from, self.crop_from, 3), np.uint8)
            jax.block_until_ready(
                forward(variables, jnp.asarray(dummy)))  # warm
            self._weights_baked = apply_fn is not None
        self._model = (forward, variables)
        self.step = step
        self.reloads += 1

    def validate(self, image: "np.ndarray") -> None:
        """Raise unless `image` is one service-ready frame."""
        if (getattr(image, "shape", None)
                != (self.crop_from, self.crop_from, 3)):
            raise ValueError(
                f"image must be ({self.crop_from}, {self.crop_from}, 3) "
                f"uint8 (got {getattr(image, 'shape', type(image))}); "
                "use decode_request for raw bytes")
        # dtype too: a float frame would upcast the whole padded batch
        # in dispatch_batch and silently recompile the warmed uint8
        # program with different standardization semantics
        if getattr(image, "dtype", None) != np.uint8:
            raise ValueError(
                f"image dtype must be uint8 "
                f"(got {getattr(image, 'dtype', type(image))})")

    def dispatch_batch(self, images: "np.ndarray"):
        """Async half of embed_batch: pad, enqueue the device call, and
        return the (not-yet-materialized) ``(embeddings, quality)``
        device arrays — jax dispatch is asynchronous, so the caller can
        overlap collection of the next batch with this one's device
        round trip. Finish with ``np.asarray(...)[:n]`` per element."""
        n = images.shape[0]
        if n > self.batch:
            raise ValueError(f"{n} > service batch {self.batch}")
        if images.shape[1:3] != (self.crop_from, self.crop_from):
            raise ValueError(
                f"images must arrive at the eval source scale "
                f"{self.crop_from}² (got {images.shape[1:3]}); "
                "decode_request produces it from raw bytes")
        if n < self.batch:
            pad = np.zeros((self.batch - n,) + images.shape[1:], np.uint8)
            images = np.concatenate([images, pad])
        forward, variables = self._model   # one read: reload-atomic
        return forward(variables, jnp.asarray(images))

    def embed_batch(self, images: "np.ndarray",
                    with_quality: bool = False):
        """(N<=batch, crop_from, crop_from, 3) uint8 → (N, D) f32
        unit-norm embeddings (plus (N,) quality scores when asked).
        Pads to the fixed batch so the compiled program is reused."""
        n = images.shape[0]
        emb, q = self.dispatch_batch(images)
        emb = np.asarray(emb)[:n]
        return (emb, np.asarray(q)[:n]) if with_quality else emb

    def decode_request(self, body: bytes) -> np.ndarray:
        """One request body → (crop_from, crop_from, 3) uint8, through
        the SAME host chain as extract (PIL decode + half-pixel
        bilinear ``_resize_u8``; PIL's antialiasing resample would
        diverge from the training/eval pixels). Accepts JPEG/PNG bytes
        or a .npy payload (magic-sniffed)."""
        from tf_face_toolbox_tpu.data.pipeline import _decode_jpeg

        if body[:6] == b"\x93NUMPY":
            arr = np.load(io.BytesIO(body), allow_pickle=False)
            if arr.ndim != 3 or arr.shape[-1] != 3:
                raise ValueError(f"npy payload must be (H, W, 3), "
                                 f"got {arr.shape}")
        else:
            arr = _decode_jpeg(body)
        return self.decode_array(arr)

    def decode_array(self, arr: "np.ndarray") -> np.ndarray:
        """(H, W, 3) array → service-ready (crop_from, crop_from, 3)
        uint8 via the extract-chain host resize."""
        from tf_face_toolbox_tpu.data.pipeline import _resize_u8

        return _resize_u8(np.asarray(arr, np.uint8),
                          self.crop_from, self.crop_from)


def bulk_embed(batcher: "DynamicBatcher", images: "np.ndarray",
               with_quality: bool = False):
    """Bulk path shared by every transport front-end: chunk ``images``
    (already decoded to the service scale) through the fixed-batch
    program, dispatching every chunk BEFORE materializing any so the
    device round trips overlap (the batcher's own dispatch→resolve
    split), and fold the work into the batcher's stats."""
    service = batcher.service
    t0 = time.monotonic()
    spans = [(i, min(i + service.batch, len(images)))
             for i in range(0, len(images), service.batch)]
    outs = [service.dispatch_batch(images[a:b]) for a, b in spans]
    embs = np.concatenate([np.asarray(o[0])[:b - a]
                           for o, (a, b) in zip(outs, spans)])
    quals = (np.concatenate([np.asarray(o[1])[:b - a]
                             for o, (a, b) in zip(outs, spans)])
             if with_quality else None)
    batcher.record_bulk(images=len(images), device_calls=len(spans),
                        elapsed=time.monotonic() - t0)
    return (embs, quals) if with_quality else embs


def health_payload(service: EmbeddingService) -> dict:
    """GET /healthz == tfft.Embedding/Health body."""
    return {"status": "ok", "batch": service.batch,
            "image_size": service.image_size,
            "serving_step": service.step}


def stats_payload(batcher: "DynamicBatcher") -> dict:
    """GET /stats == tfft.Embedding/Stats body."""
    s = dict(batcher.stats)
    calls = max(s["device_calls"], 1)
    s["mean_batch_fill"] = round(s["images"] / calls, 2)
    s["serving_step"] = batcher.service.step
    s["reloads"] = batcher.service.reloads
    return s


@dataclass
class _Pending:
    image: np.ndarray
    event: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Exception | None = None


class DynamicBatcher:
    """Coalesce concurrent single-image requests into device batches.

    Two-stage pipeline: the *dispatch* worker drains the queue up to
    ``service.batch`` items (after the first item of a batch it waits at
    most ``max_wait_ms`` for stragglers — the classic latency-vs-fill
    knob), pads, and enqueues the device call WITHOUT blocking (jax
    dispatch is async); the *resolve* worker materializes results and
    completes futures. Up to ``depth`` batches stay in flight, so the
    next batch's collection and H2D overlap the previous batch's device
    round trip — on remote/tunneled TPUs (RTT ≫ compute) this pipelining
    is worth ~depth× sustained throughput; on a local chip it hides H2D.
    """

    def __init__(self, service: EmbeddingService, *,
                 max_wait_ms: float = 5.0, depth: int = 2):
        self.service = service
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._inflight: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._stats_mu = threading.Lock()
        self._stats = {"requests": 0, "device_calls": 0, "images": 0}
        # rings of recent request latencies (seconds), split by
        # endpoint: coalesced singles vs bulk have very different
        # latency regimes (straggler wait vs chunked device sweeps),
        # so one merged percentile hides both
        self._latencies: dict[str, collections.deque] = {
            "embed": collections.deque(maxlen=2048),
            "embed_batch": collections.deque(maxlen=2048),
        }
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._resolver = threading.Thread(target=self._resolve_loop,
                                          daemon=True)
        self._dispatcher.start()
        self._resolver.start()

    @property
    def stats(self) -> dict:
        with self._stats_mu:
            out = dict(self._stats)
            by_ep = {ep: sorted(d)
                     for ep, d in self._latencies.items() if d}

        def pcts(lats: list) -> dict:
            pick = lambda q: lats[min(len(lats) - 1,  # noqa: E731
                                      int(q * len(lats)))]
            return {"p50": round(1e3 * pick(0.50), 2),
                    "p95": round(1e3 * pick(0.95), 2),
                    "p99": round(1e3 * pick(0.99), 2)}

        merged = sorted(lat for lats in by_ep.values() for lat in lats)
        if merged:
            out["latency_ms"] = pcts(merged)
            out["latency_ms_by_endpoint"] = {
                ep: pcts(lats) for ep, lats in by_ep.items()}
        return out

    def _count(self, **deltas) -> None:
        with self._stats_mu:
            for key, d in deltas.items():
                self._stats[key] += d

    def submit(self, image: np.ndarray,
               timeout: float = 30.0,
               with_quality: bool = False):
        # validate BEFORE coalescing: a malformed request must fail
        # alone, not poison the batch it would have joined
        self.service.validate(image)
        if self._stop.is_set():
            raise RuntimeError("batcher is closed")
        p = _Pending(image=image)
        self._count(requests=1)
        t0 = time.monotonic()
        self._q.put(p)
        # re-check AFTER the put: close() drains the queue once, so a
        # request enqueued concurrently with that drain would otherwise
        # block out its full timeout instead of failing fast
        if self._stop.is_set() and not p.event.is_set():
            p.error = RuntimeError("batcher is closed")
            p.event.set()
        ok = p.event.wait(timeout)
        # record latency for EVERY outcome: a timed-out request is
        # exactly the tail p99 must expose, not a survivorship gap
        with self._stats_mu:
            self._latencies["embed"].append(time.monotonic() - t0)
        if not ok:
            raise TimeoutError("embedding request timed out")
        if p.error is not None:
            raise p.error
        return p.result if with_quality else p.result[0]

    def record_bulk(self, *, images: int, device_calls: int,
                    elapsed: float) -> None:
        """Fold a bulk (/embed_batch) request into the stats so /stats
        reflects bulk traffic too."""
        self._count(requests=1, images=images,
                    device_calls=device_calls)
        with self._stats_mu:
            self._latencies["embed_batch"].append(elapsed)

    def close(self) -> None:
        self._stop.set()
        self._dispatcher.join(timeout=10)
        self._resolver.join(timeout=10)
        # fail anything still pending instead of leaving callers to
        # block out their submit timeouts
        for q in (self._q, self._inflight):
            while True:
                try:
                    item = q.get_nowait()
                except queue.Empty:
                    break
                pendings = [item] if isinstance(item, _Pending) else item[0]
                for p in pendings:
                    p.error = RuntimeError("batcher closed")
                    p.event.set()

    def _dispatch_loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.service.batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                images = np.stack([p.image for p in batch])
                device_out = self.service.dispatch_batch(images)
            except Exception as e:  # surface per-request, keep serving
                for p in batch:
                    p.error = e
                    p.event.set()
                continue
            self._count(device_calls=1, images=len(batch))
            # bounded put = backpressure at `depth` in-flight batches;
            # poll so shutdown can't wedge on a full queue
            while True:
                try:
                    self._inflight.put((batch, device_out), timeout=0.1)
                    break
                except queue.Full:
                    if self._stop.is_set() and not \
                            self._resolver.is_alive():
                        for p in batch:
                            p.error = RuntimeError("batcher closed")
                            p.event.set()
                        break

    def _resolve_loop(self) -> None:
        while True:
            try:
                batch, device_out = self._inflight.get(timeout=0.1)
            except queue.Empty:
                # exit only when no more batches can arrive: stop set
                # AND the dispatcher is done (else a just-dispatched
                # batch could be orphaned between put and our get)
                if self._stop.is_set() and not self._dispatcher.is_alive():
                    return
                continue
            try:
                embs = np.asarray(device_out[0])[:len(batch)]
                quals = np.asarray(device_out[1])[:len(batch)]
                for p, e, q in zip(batch, embs, quals):
                    p.result = (e, q)
            except Exception as e:
                for p in batch:
                    p.error = e
            for p in batch:
                p.event.set()


def serve(batcher: "DynamicBatcher | dict[str, DynamicBatcher]", *,
          host: str = "127.0.0.1",
          port: int = 0, unix_socket: str | None = None,
          max_body_mb: int = 64,
          gallery=None, enroll_min_quality: float = 0.0):
    """Start the HTTP front-end; returns the (running) HTTPServer.
    Caller owns shutdown(); call ``server.wait_idle(timeout)`` after
    shutdown() to let in-flight handlers finish (the stdlib's
    ``server_close`` does NOT join daemon handler threads — verified on
    py3.12). Endpoints: POST /embed, POST /embed_batch (npy
    (N, H, W, 3); bodies over ``max_body_mb`` get 413; send
    ``Accept: application/x-npy`` for a binary .npy response instead
    of JSON), GET /healthz, GET /stats.

    **Multi-model**: pass ``{name: DynamicBatcher}`` instead of one
    batcher (TF-Serving's multi-model server, rebuilt for resident
    compiled programs — e.g. a high-QPS mobilefacenet next to an
    accuracy-grade ResNet, each with its own geometry/norm/quant).
    Requests pick a model with ``?model=<name>`` on any endpoint; the
    FIRST entry is the default, so single-model clients keep working.
    /healthz and /stats without ``?model=`` report all models keyed by
    name. Unknown names get 404 with the model list. The batchers
    share the one device — concurrent dispatches serialize there, the
    same property the in-flight pipeline already rides.

    ``unix_socket``: serve HTTP over an AF_UNIX socket at this path
    instead of TCP — the rolling-restart/reverse-proxy transport
    (docs/ROADMAP r2 #5): no TCP handshake/TIME_WAIT per request, and
    the next daemon takes the path over atomically (bind to a temp
    name + rename) so a proxy never sees connection-refused between
    generations. A stale path from a dead process is replaced.

    ``gallery``: a serving.gallery.DeviceGallery enables the daemon's
    1:N endpoints against the DEFAULT model's embedding space:
    POST /enroll?label=<int> (image body → embed → store; an
    ``enroll_min_quality`` floor — overridable per request with
    &min_quality= — gates low-quality enrollments using the feature-
    norm score), POST /identify?k=5[&threshold=t] (image body →
    matches [{label, score}], plus "unknown": true when the top score
    is below t — the open-set decision), GET /gallery (size), and
    POST /gallery/save?path= (atomic snapshot). Multi-model daemons
    refuse gallery calls with ?model= other than the default (one
    gallery, one embedding space)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlsplit

    if isinstance(batcher, DynamicBatcher):
        batchers = {None: batcher}
    else:
        if not batcher:
            raise ValueError("serve() got an empty model map")
        batchers = dict(batcher)
    default_name = next(iter(batchers))
    multi = default_name is not None
    max_body = max_body_mb * (1 << 20)
    inflight = {"n": 0}
    inflight_cv = threading.Condition()

    def route(raw_path: str):
        """→ (path, batcher | None, model_name, want_quality, qs)."""
        parts = urlsplit(raw_path)
        qs = parse_qs(parts.query)
        name = qs.get("model", [default_name])[0]
        quality = qs.get("quality", ["0"])[0] not in ("0", "", "false")
        return parts.path, batchers.get(name, None), name, quality, qs

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet; stats endpoint instead
            pass

        def _reply(self, code: int, payload: dict) -> None:
            try:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except (BrokenPipeError, ConnectionError):
                pass  # client went away; nothing to tell it

        def _wants_npy(self) -> bool:
            # content negotiation for the embedding payload: JSON text
            # is the compatible default, but at 512 floats/face its
            # encode dominates bulk responses (serve_bench
            # --transports: 4.9x) — a binary .npy body closes that gap
            # without switching transports
            accept = self.headers.get("Accept", "")
            return ("application/x-npy" in accept
                    or "application/octet-stream" in accept)

        def _reply_npy(self, arr: "np.ndarray") -> None:
            try:
                buf = io.BytesIO()
                np.save(buf, np.ascontiguousarray(arr),
                        allow_pickle=False)
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "application/x-npy")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except (BrokenPipeError, ConnectionError):
                pass  # client went away; nothing to tell it

        def do_GET(self):
            path, b, name, _, _qs = route(self.path)
            if path == "/gallery":
                if gallery is None:
                    self._reply(404, {"error": "no gallery configured "
                                               "(cli.serve --gallery)"})
                elif name != default_name:
                    self._reply(404, {"error": "gallery is bound to the "
                                               "default model"})
                else:
                    self._reply(200, {
                        "size": len(gallery),
                        "dim": gallery.dim,
                        "dtype": gallery.dtype,
                        "device_mb": round(
                            gallery.device_bytes() / 1e6, 1),
                        "hbm_limit_gb": gallery.hbm_limit_gb,
                        "overflow": gallery.overflow,
                        "streaming": gallery.streaming})
                return
            if path not in ("/healthz", "/stats"):
                self._reply(404, {"error": "unknown path"})
                return
            if b is None:
                self._reply(404, {
                    "error": f"unknown model {name!r}",
                    "models": sorted(k for k in batchers if k)})
                return
            if path == "/healthz":
                payload = health_payload(b.service)
                if multi and "model=" not in self.path:
                    payload = {"status": "ok", "models": {
                        k: health_payload(v.service)
                        for k, v in batchers.items()}}
                self._reply(200, payload)
            else:
                payload = stats_payload(b)
                if multi and "model=" not in self.path:
                    payload = {"models": {k: stats_payload(v)
                                          for k, v in batchers.items()}}
                self._reply(200, payload)

        def do_POST(self):
            with inflight_cv:
                inflight["n"] += 1
            try:
                self._do_post()
            finally:
                with inflight_cv:
                    inflight["n"] -= 1
                    inflight_cv.notify_all()

        def _do_gallery(self, path, b, name, qs):
            """/enroll, /identify, /gallery/save — the daemon's 1:N
            endpoints over the device-resident gallery."""
            if gallery is None:
                self._reply(404, {"error": "no gallery configured "
                                           "(cli.serve --gallery)"})
                return
            if b is None or name != default_name:
                self._reply(404, {"error": "gallery endpoints are bound "
                                           "to the default model"})
                return
            if path == "/gallery/save":
                target = qs.get("path", [""])[0]
                if not target:
                    self._reply(400, {"error": "need ?path="})
                    return
                try:
                    n = gallery.save(target)
                except OSError as e:
                    self._reply(500, {"error": f"{e}"})
                    return
                self._reply(200, {"saved": n, "path": target})
                return
            if path == "/deenroll":
                try:
                    label = int(qs.get("label", [""])[0])
                except ValueError:
                    self._reply(400, {"error": "need ?label=<int>"})
                    return
                removed = gallery.remove(label)
                self._reply(200, {"removed": removed,
                                  "size": len(gallery)})
                return
            svc = b.service
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body:
                    self._reply(413, {"error": "body too large"})
                    return
                image = svc.decode_request(self.rfile.read(n))
                if path == "/enroll":
                    label = int(qs.get("label", [""])[0])
                min_q = float(qs.get("min_quality",
                                     [str(enroll_min_quality)])[0])
            except Exception as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                emb, qual = b.submit(image, with_quality=True)
                if path == "/enroll":
                    if float(qual) < min_q:
                        self._reply(422, {
                            "error": "quality below enrollment floor",
                            "quality": float(qual),
                            "min_quality": min_q})
                        return
                    size = gallery.enroll(emb, [label])
                    self._reply(200, {"enrolled": True, "label": label,
                                      "quality": float(qual),
                                      "size": size})
                else:                                   # /identify
                    k = int(qs.get("k", ["5"])[0])
                    thr = float(qs.get("threshold", ["-1e9"])[0])
                    try:
                        labs, scores = gallery.search(emb, k=k)
                    except ValueError as e:
                        self._reply(409, {"error": f"{e}"})
                        return
                    matches = [{"label": int(l), "score": float(s)}
                               for l, s in zip(labs[0], scores[0])]
                    self._reply(200, {
                        "matches": matches,
                        "quality": float(qual),
                        "unknown": bool(scores[0][0] < thr)})
            except Exception as e:
                from tf_face_toolbox_tpu.serving.gallery import (
                    GalleryCapacityError)

                if isinstance(e, GalleryCapacityError):
                    code = 507        # Insufficient Storage, retryable
                elif isinstance(e, TimeoutError):
                    code = 503
                else:
                    code = 500
                self._reply(code, {"error": f"{type(e).__name__}: {e}"})

        def _do_post(self):
            path, b, name, want_quality, qs = route(self.path)
            if path in ("/enroll", "/identify", "/gallery/save",
                        "/deenroll"):
                self._do_gallery(path, b, name, qs)
                return
            if path not in ("/embed", "/embed_batch"):
                self._reply(404, {"error": "unknown path"})
                return
            if b is None:
                self._reply(404, {
                    "error": f"unknown model {name!r}",
                    "models": sorted(k for k in batchers if k)})
                return
            if want_quality and self._wants_npy():
                # checked BEFORE decode/dispatch: the binary .npy body
                # carries one array, and finding that out after a full
                # device round trip would waste the batch
                self._reply(400, {"error": "quality=1 is JSON-only; "
                                           "drop the x-npy Accept "
                                           "header"})
                return
            svc = b.service
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body:
                    # drain in bounded chunks (never materialized) so
                    # the client can finish sending and read the 413
                    # instead of hitting a broken pipe
                    remaining = n
                    while remaining > 0:
                        chunk = self.rfile.read(min(1 << 20, remaining))
                        if not chunk:
                            break
                        remaining -= len(chunk)
                    self._reply(413, {"error": f"body {n} bytes > "
                                               f"{max_body_mb} MiB cap"})
                    return
                body = self.rfile.read(n)
                if path == "/embed_batch":
                    # bulk: .npy (N, H, W, 3) uint8 — the client
                    # already batched, so no coalescing needed
                    arr = np.load(io.BytesIO(body), allow_pickle=False)
                    if arr.ndim != 4 or arr.shape[-1] != 3:
                        raise ValueError(
                            f"npy payload must be (N, H, W, 3), "
                            f"got {arr.shape}")
                    images = np.stack([
                        svc.decode_array(a) for a in arr])
                else:
                    images = svc.decode_request(body)[None]
            except Exception as e:  # malformed payload → client error
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                if path == "/embed_batch":
                    out = bulk_embed(b, images,
                                     with_quality=want_quality)
                    embs, quals = out if want_quality else (out, None)
                    if self._wants_npy():
                        self._reply_npy(embs.astype(np.float32))
                    else:
                        payload = {"embeddings": embs.tolist()}
                        if want_quality:
                            payload["qualities"] = quals.tolist()
                        self._reply(200, payload)
                else:
                    out = b.submit(images[0], with_quality=want_quality)
                    emb, qual = out if want_quality else (out, None)
                    if self._wants_npy():
                        self._reply_npy(np.asarray(emb, np.float32))
                    else:
                        payload = {"embedding": emb.tolist()}
                        if want_quality:
                            payload["quality"] = float(qual)
                        self._reply(200, payload)
            except Exception as e:  # device/backlog fault → server error
                self._reply(503 if isinstance(e, TimeoutError) else 500,
                            {"error": f"{type(e).__name__}: {e}"})

    if unix_socket:
        import os
        import socket as socket_mod

        class UnixHTTPServer(ThreadingHTTPServer):
            address_family = socket_mod.AF_UNIX

            def server_bind(self):
                # bind a unique temp name, then rename over the target:
                # atomic takeover — clients connecting to the path get
                # either the old (draining) or the new server, never a
                # refused window
                self._tmp_path = f"{unix_socket}.{os.getpid()}.tmp"
                try:
                    os.unlink(self._tmp_path)
                except FileNotFoundError:
                    pass
                self.socket.bind(self._tmp_path)
                os.rename(self._tmp_path, unix_socket)
                self.server_address = unix_socket

            def get_request(self):
                # AF_UNIX peers have no (host, port); give the handler
                # the tuple shape BaseHTTPRequestHandler expects
                sock, _ = super().get_request()
                return sock, ("unix", 0)

        server = UnixHTTPServer(unix_socket, Handler,
                                bind_and_activate=True)
    else:
        server = ThreadingHTTPServer((host, port), Handler)

    def wait_idle(timeout: float = 30.0) -> bool:
        """Block until no handler is mid-request (call after
        shutdown()); True if drained within `timeout`."""
        deadline = time.monotonic() + timeout
        with inflight_cv:
            while inflight["n"] > 0:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
                inflight_cv.wait(remaining)
        return True

    server.wait_idle = wait_idle
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
