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
  GET /healthz; GET /stats (requests, device calls, mean batch fill).

CLI: ``python -m tf_face_toolbox_tpu.cli.serve --checkpoint_dir=... --port=...``
"""

from __future__ import annotations

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

    ``apply_fn(variables, images) -> embeddings`` is the eval forward
    (net.apply or a serving-engine fold); images enter as uint8
    ``(H, W, 3)`` of any size and are resized+standardized on device
    (the eval chain of extract.py).
    """

    def __init__(self, net, variables, *, image_size: int = 112,
                 batch: int = 32, apply_fn: Callable | None = None,
                 dtype=jnp.bfloat16):
        from tf_face_toolbox_tpu.extract import flip_averaged_embeddings
        from tf_face_toolbox_tpu.ops.preprocess import (
            preprocess_eval_resize)

        if apply_fn is None:
            def apply_fn(v, x):
                return net.apply(v, x, train=False)
        self.batch = int(batch)
        self.image_size = int(image_size)
        self._variables = variables

        @jax.jit
        def forward(variables, images_u8):
            x = preprocess_eval_resize(images_u8, image_size, image_size)
            x = x.astype(dtype)
            return flip_averaged_embeddings(apply_fn, variables, x)

        self._forward = forward

    def warmup(self) -> None:
        """Compile the fixed-batch program before accepting traffic."""
        dummy = np.zeros(
            (self.batch, self.image_size, self.image_size, 3), np.uint8)
        np.asarray(self._forward(self._variables, jnp.asarray(dummy)))

    def dispatch_batch(self, images: "np.ndarray"):
        """Async half of embed_batch: pad, enqueue the device call, and
        return the (not-yet-materialized) device array — jax dispatch is
        asynchronous, so the caller can overlap collection of the next
        batch with this one's device round trip. Finish with
        ``np.asarray(result)[:n]``."""
        n = images.shape[0]
        if n > self.batch:
            raise ValueError(f"{n} > service batch {self.batch}")
        if images.shape[1:3] != (self.image_size, self.image_size):
            raise ValueError(
                f"images must arrive pre-sized {self.image_size}² "
                f"(got {images.shape[1:3]}); the HTTP layer resizes")
        if n < self.batch:
            pad = np.zeros((self.batch - n,) + images.shape[1:], np.uint8)
            images = np.concatenate([images, pad])
        return self._forward(self._variables, jnp.asarray(images))

    def embed_batch(self, images: "np.ndarray") -> np.ndarray:
        """(N<=batch, H, W, 3) uint8 → (N, D) f32 unit-norm embeddings.
        Pads to the fixed batch so the compiled program is reused."""
        n = images.shape[0]
        return np.asarray(self.dispatch_batch(images))[:n]

    def decode_request(self, body: bytes) -> np.ndarray:
        """One request body → (H, W, 3) uint8. JPEG/PNG bytes (PIL) or
        a .npy payload (magic-sniffed)."""
        from PIL import Image

        if body[:6] == b"\x93NUMPY":
            arr = np.load(io.BytesIO(body), allow_pickle=False)
            if arr.ndim != 3 or arr.shape[-1] != 3:
                raise ValueError(f"npy payload must be (H, W, 3), "
                                 f"got {arr.shape}")
            img = Image.fromarray(arr.astype(np.uint8))
        else:
            img = Image.open(io.BytesIO(body)).convert("RGB")
        if img.size != (self.image_size, self.image_size):
            img = img.resize((self.image_size, self.image_size),
                             Image.BILINEAR)
        return np.asarray(img, np.uint8)


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
        self.stats = {"requests": 0, "device_calls": 0, "images": 0}
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._resolver = threading.Thread(target=self._resolve_loop,
                                          daemon=True)
        self._dispatcher.start()
        self._resolver.start()

    def submit(self, image: np.ndarray,
               timeout: float = 30.0) -> np.ndarray:
        p = _Pending(image=image)
        self.stats["requests"] += 1
        self._q.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("embedding request timed out")
        if p.error is not None:
            raise p.error
        return p.result

    def close(self) -> None:
        self._stop.set()
        self._dispatcher.join(timeout=5)
        self._resolver.join(timeout=5)

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
            self.stats["device_calls"] += 1
            self.stats["images"] += len(batch)
            self._inflight.put((batch, device_out))  # bounded: applies
            # backpressure when `depth` batches are already in flight

    def _resolve_loop(self) -> None:
        while not (self._stop.is_set() and self._inflight.empty()):
            try:
                batch, device_out = self._inflight.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                embs = np.asarray(device_out)[:len(batch)]
                for p, e in zip(batch, embs):
                    p.result = e
            except Exception as e:
                for p in batch:
                    p.error = e
            for p in batch:
                p.event.set()


def serve(batcher: DynamicBatcher, *, host: str = "127.0.0.1",
          port: int = 0):
    """Start the HTTP front-end; returns the (running) HTTPServer.
    Caller owns shutdown(). Endpoints: POST /embed, GET /healthz,
    GET /stats."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    service = batcher.service

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet; stats endpoint instead
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "batch": service.batch,
                                  "image_size": service.image_size})
            elif self.path == "/stats":
                s = dict(batcher.stats)
                calls = max(s["device_calls"], 1)
                s["mean_batch_fill"] = round(s["images"] / calls, 2)
                self._reply(200, s)
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/embed":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                image = service.decode_request(self.rfile.read(n))
                emb = batcher.submit(image)
                self._reply(200, {"embedding": emb.tolist()})
            except Exception as e:  # noqa: BLE001 — per-request error
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
