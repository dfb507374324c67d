"""Serving daemon: fixed-batch service, dynamic batcher, HTTP e2e."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tf_face_toolbox_tpu.models import create_network, init_variables
from tf_face_toolbox_tpu.serving.server import (
    DynamicBatcher,
    EmbeddingService,
    serve,
)

SIZE, DIM, BATCH = 16, 8, 4


def _wait_serving(proc, deadline_s):
    """Read the child's stdout from a side thread so a silent wedge
    fails at the deadline instead of hanging readline() forever."""
    import queue as queue_mod
    import time

    lines: "queue_mod.Queue[str]" = queue_mod.Queue()
    proc.captured = []  # the reader owns the pipe; tests read this

    def reader():
        for line in proc.stdout:
            proc.captured.append(line)
            lines.put(line)

    threading.Thread(target=reader, daemon=True).start()
    end = time.time() + deadline_s
    while time.time() < end:
        try:
            line = lines.get(timeout=1)
        except queue_mod.Empty:
            if proc.poll() is not None:
                break
            continue
        if "serving on" in line:
            return line
    raise AssertionError(
        f"daemon not serving within {deadline_s}s; "
        f"output: {proc.captured[-8:]}")


@pytest.fixture(scope="module")
def service():
    net = create_network("resnet_tiny", embedding_dim=DIM,
                         dtype=jnp.float32)
    variables = init_variables(net, jax.random.key(0), (1, SIZE, SIZE, 3))
    svc = EmbeddingService(net, variables, image_size=SIZE,
                           crop_from=SIZE, batch=BATCH,
                           dtype=jnp.float32)
    svc.warmup()
    return svc


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, SIZE, SIZE, 3), dtype=np.uint8)


def test_padding_does_not_leak_between_rows(service):
    imgs = _images(4)
    full = service.embed_batch(imgs)
    np.testing.assert_allclose(np.linalg.norm(full, axis=1), 1.0,
                               atol=1e-5)
    two = service.embed_batch(imgs[:2])  # padded internally to 4
    np.testing.assert_allclose(two, full[:2], atol=1e-5)
    with pytest.raises(ValueError, match="service batch"):
        service.embed_batch(_images(BATCH + 1))


def test_dynamic_batcher_coalesces(service):
    batcher = DynamicBatcher(service, max_wait_ms=100.0)
    try:
        imgs = _images(8, seed=1)
        want = np.concatenate([service.embed_batch(imgs[:4]),
                               service.embed_batch(imgs[4:])])
        results = [None] * 8

        def work(i):
            results[i] = batcher.submit(imgs[i])

        threads = [threading.Thread(target=work, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        got = np.stack(results)
        # compare set-wise row to row (order of arrival is scheduler-
        # dependent; rows themselves must match their own image)
        np.testing.assert_allclose(got, want, atol=1e-5)
        s = batcher.stats
        assert s["requests"] == 8 and s["images"] == 8
        assert s["device_calls"] < 8  # coalescing actually happened
    finally:
        batcher.close()


def test_http_server_e2e(service):
    from PIL import Image

    batcher = DynamicBatcher(service, max_wait_ms=1.0)
    server = serve(batcher, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(f"{base}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["batch"] == BATCH

        img = _images(1, seed=2)[0]
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=95)
        req = urllib.request.Request(f"{base}/embed", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            emb_jpeg = np.asarray(json.loads(r.read())["embedding"])
        assert emb_jpeg.shape == (DIM,)
        np.testing.assert_allclose(np.linalg.norm(emb_jpeg), 1.0,
                                   atol=1e-4)

        # npy payload path must agree with direct service output
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(f"{base}/embed", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            emb_npy = np.asarray(json.loads(r.read())["embedding"])
        want = service.embed_batch(img[None])[0]
        np.testing.assert_allclose(emb_npy, want, atol=1e-5)

        # ?quality=1: per-face feature-norm quality score rides along
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(f"{base}/embed?quality=1",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            payload = json.loads(r.read())
        assert payload["quality"] > 0
        np.testing.assert_allclose(np.asarray(payload["embedding"]),
                                   want, atol=1e-5)
        _, want_q = service.embed_batch(img[None], with_quality=True)
        np.testing.assert_allclose(payload["quality"], want_q[0],
                                   rtol=1e-4)

        # bulk + quality
        buf = io.BytesIO()
        np.save(buf, _images(3, seed=4))
        req = urllib.request.Request(f"{base}/embed_batch?quality=1",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            payload = json.loads(r.read())
        assert len(payload["qualities"]) == 3
        assert all(q > 0 for q in payload["qualities"])

        # malformed body → 400, server keeps serving
        req = urllib.request.Request(f"{base}/embed", data=b"not an image",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400

        with urllib.request.urlopen(f"{base}/stats") as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 2
        lat = stats["latency_ms"]
        assert 0 < lat["p50"] <= lat["p95"] <= lat["p99"]
    finally:
        server.shutdown()
        batcher.close()


def test_http_multi_model_routing(service):
    """serve({name: batcher}) routes by ?model=, defaults to the first
    entry, reports all models on bare /healthz//stats, and 404s unknown
    names with the model list (the TF-Serving multi-model surface)."""
    net_b = create_network("resnet_tiny", embedding_dim=DIM + 2,
                           dtype=jnp.float32)
    vars_b = init_variables(net_b, jax.random.key(7),
                            (1, SIZE, SIZE, 3))
    svc_b = EmbeddingService(net_b, vars_b, image_size=SIZE,
                             crop_from=SIZE, batch=BATCH,
                             dtype=jnp.float32, step=11)
    svc_b.warmup()
    ba = DynamicBatcher(service, max_wait_ms=1.0)
    bb = DynamicBatcher(svc_b, max_wait_ms=1.0)
    server = serve({"big": ba, "small": bb}, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        buf = io.BytesIO()
        np.save(buf, _images(1, seed=5)[0])
        body = buf.getvalue()

        def post(path):
            req = urllib.request.Request(base + path, data=body,
                                         method="POST")
            return json.loads(urllib.request.urlopen(req,
                                                     timeout=30).read())

        # explicit routing hits the right model (dims differ)
        assert len(post("/embed?model=big")["embedding"]) == DIM
        assert len(post("/embed?model=small")["embedding"]) == DIM + 2
        # no ?model= → the FIRST entry (single-model clients just work)
        assert len(post("/embed")["embedding"]) == DIM
        # unknown model → 404 with the model list
        req = urllib.request.Request(base + "/embed?model=nope",
                                     data=body, method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 404
        assert json.loads(exc.value.read())["models"] == ["big", "small"]
        # bare healthz/stats report every model; ?model= scopes to one
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert set(health["models"]) == {"big", "small"}
        assert health["models"]["small"]["serving_step"] == 11
        with urllib.request.urlopen(base + "/stats?model=big",
                                    timeout=30) as r:
            stats = json.loads(r.read())
        assert "requests" in stats and "models" not in stats
    finally:
        server.shutdown()
        server.server_close()
        ba.close()
        bb.close()


@pytest.mark.slow
def test_cli_serve_multi_model_bundles(tmp_path):
    """cli.serve --bundle=a=...,b=... serves two models from one
    daemon, each with its own geometry/config."""
    import os
    import re
    import subprocess
    import sys

    from tf_face_toolbox_tpu.serving.bundle import write_bundle

    paths = {}
    for name, dim in (("big", DIM), ("small", DIM + 2)):
        net = create_network("resnet_tiny", embedding_dim=dim,
                             dtype=jnp.float32)
        variables = init_variables(net, jax.random.key(dim),
                                   (1, SIZE, SIZE, 3))
        paths[name] = str(tmp_path / f"{name}.bundle.npz")
        write_bundle(paths[name], variables, dict(
            network="resnet_tiny", embedding_dim=dim, image_size=SIZE,
            crop_from=SIZE, input_norm="per_image", quant_mode="none",
            stem="face", head_variant="gap", step=dim))

    env = dict(os.environ, TFFT_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.serve",
         f"--bundle=big={paths['big']},small={paths['small']}",
         "--nobf16", "--engine=flax", "--port=0", "--max_batch=2",
         "--max_wait_ms=1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
    try:
        line = _wait_serving(proc, 120)
        assert "models=big,small" in line, line
        m = re.search(r"http://[\d.]+:(\d+)", line)
        port = int(m.group(1))
        buf = io.BytesIO()
        np.save(buf, _images(1, seed=3)[0])
        for name, dim in (("big", DIM), ("small", DIM + 2)):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/embed?model={name}",
                data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=30) as r:
                emb = np.asarray(json.loads(r.read())["embedding"])
            assert emb.shape == (dim,)
        proc.terminate()
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)


@pytest.mark.slow
def test_cli_serve_from_bundle(tmp_path):
    """cli.serve --bundle boots with zero config flags: network/geometry/
    norm come from the artifact's meta record (serving/bundle.py)."""
    import os
    import re
    import subprocess
    import sys

    from tf_face_toolbox_tpu.serving.bundle import write_bundle

    net = create_network("resnet_tiny", embedding_dim=DIM,
                         dtype=jnp.float32)
    variables = init_variables(net, jax.random.key(0), (1, SIZE, SIZE, 3))
    bundle = str(tmp_path / "m.bundle.npz")
    write_bundle(bundle, variables, dict(
        network="resnet_tiny", embedding_dim=DIM, image_size=SIZE,
        crop_from=SIZE, input_norm="per_image", quant_mode="none",
        stem="face", head_variant="gap", step=3))

    env = dict(os.environ, TFFT_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.serve",
         f"--bundle={bundle}", "--nobf16", "--engine=flax", "--port=0",
         "--max_batch=2", "--max_wait_ms=1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
    try:
        line = _wait_serving(proc, 120)
        m = re.search(r"http://[\d.]+:(\d+)", line)
        assert m, f"no serving line: {line!r}"
        port = int(m.group(1))
        buf = io.BytesIO()
        np.save(buf, _images(1, seed=3)[0])
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            emb = np.asarray(json.loads(r.read())["embedding"])
        assert emb.shape == (DIM,)
        # /healthz reports the bundle's exported step
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health.get("serving_step") == 3
        proc.terminate()
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)


@pytest.mark.slow
def test_cli_serve_from_npz(tmp_path):
    """cli.serve boots from an imported .npz and answers HTTP."""
    import os
    import re
    import subprocess
    import sys
    import time

    from tf_face_toolbox_tpu.interop.port import save_variables_npz

    net = create_network("resnet_tiny", embedding_dim=DIM,
                         dtype=jnp.float32)
    variables = init_variables(net, jax.random.key(0), (1, SIZE, SIZE, 3))
    npz = str(tmp_path / "vars.npz")
    save_variables_npz(npz, variables)

    env = dict(os.environ, TFFT_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.serve",
         f"--variables_npz={npz}", "--network=resnet_tiny",
         f"--embedding_dim={DIM}", f"--image_size={SIZE}",
         "--nobf16", "--engine=flax", "--port=0", "--max_batch=2",
         f"--crop_from={SIZE}", "--max_wait_ms=1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
    try:
        line = _wait_serving(proc, 120)
        m = re.search(r"http://[\d.]+:(\d+)", line)
        assert m, f"no serving line: {line!r}"
        port = int(m.group(1))
        buf = io.BytesIO()
        np.save(buf, _images(1, seed=3)[0])
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            emb = np.asarray(json.loads(r.read())["embedding"])
        assert emb.shape == (DIM,)
        # graceful drain: SIGTERM completes in-flight work and exits 0
        proc.terminate()
        assert proc.wait(timeout=30) == 0
        deadline = time.time() + 5  # reader thread flushes the tail
        while time.time() < deadline and not any(
                "drained; bye" in ln for ln in proc.captured):
            time.sleep(0.1)
        assert any("drained; bye" in ln for ln in proc.captured), (
            proc.captured[-8:])
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)


@pytest.mark.slow
def test_cli_serve_grpc_transport(tmp_path):
    """cli.serve --transport=grpc boots, answers RPCs, and drains
    cleanly on SIGTERM."""
    import os
    import re
    import subprocess
    import sys
    import time

    from tf_face_toolbox_tpu.interop.port import save_variables_npz
    from tf_face_toolbox_tpu.serving.grpc_server import (
        GrpcEmbeddingClient,
    )

    net = create_network("resnet_tiny", embedding_dim=DIM,
                         dtype=jnp.float32)
    variables = init_variables(net, jax.random.key(0), (1, SIZE, SIZE, 3))
    npz = str(tmp_path / "vars.npz")
    save_variables_npz(npz, variables)

    env = dict(os.environ, TFFT_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.serve",
         f"--variables_npz={npz}", "--network=resnet_tiny",
         f"--embedding_dim={DIM}", f"--image_size={SIZE}",
         "--nobf16", "--engine=flax", "--port=0", "--max_batch=2",
         f"--crop_from={SIZE}", "--max_wait_ms=1",
         "--transport=grpc"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
    try:
        line = _wait_serving(proc, 120)
        m = re.search(r"grpc://[\d.]+:(\d+)", line)
        assert m, f"no serving line: {line!r}"
        with GrpcEmbeddingClient(f"127.0.0.1:{m.group(1)}") as client:
            assert client.health()["status"] == "ok"
            emb = client.embed(_images(1, seed=3)[0])
            assert emb.shape == (DIM,)
            embs = client.embed_batch(_images(3, seed=4))
            assert embs.shape == (3, DIM)
            stats = client.stats()
            assert stats["requests"] >= 2
        proc.terminate()
        assert proc.wait(timeout=45) == 0
        deadline = time.time() + 5
        while time.time() < deadline and not any(
                "drained; bye" in ln for ln in proc.captured):
            time.sleep(0.1)
        assert any("drained; bye" in ln for ln in proc.captured), (
            proc.captured[-8:])
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)


@pytest.mark.slow
def test_cli_serve_static_int8(tmp_path):
    """Daemon boots with --quant_mode=static: calibrates scales from a
    shard at startup, serves int8, answers within cosine tolerance of
    the fp service."""
    import os
    import re
    import subprocess
    import sys
    import time

    from PIL import Image

    from tf_face_toolbox_tpu.data.format import pack_image_list
    from tf_face_toolbox_tpu.interop.port import save_variables_npz

    net = create_network("resnet_tiny", embedding_dim=DIM,
                         dtype=jnp.float32)
    variables = init_variables(net, jax.random.key(0), (1, SIZE, SIZE, 3))
    npz = str(tmp_path / "vars.npz")
    save_variables_npz(npz, variables)

    rng = np.random.default_rng(5)
    lines = []
    for i in range(8):
        arr = rng.integers(0, 256, (SIZE + 8, SIZE + 8, 3), np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"c{i}.jpg"), "JPEG")
        lines.append(f"c{i}.jpg 0\n")
    (tmp_path / "list.txt").write_text("".join(lines))
    shard = str(tmp_path / "cal.faceshard")
    pack_image_list(str(tmp_path / "list.txt"), shard, root=str(tmp_path))

    env = dict(os.environ, TFFT_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.serve",
         f"--variables_npz={npz}", "--network=resnet_tiny",
         f"--embedding_dim={DIM}", f"--image_size={SIZE}",
         "--nobf16", "--port=0", "--max_batch=2", "--max_wait_ms=1",
         f"--crop_from={SIZE}",
         "--quant_mode=static", f"--calibrate_data={shard}",
         "--calibrate_batches=2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
    try:
        line = _wait_serving(proc, 180)
        m = re.search(r"http://[\d.]+:(\d+)", line)
        assert m, f"no serving line: {line!r}"
        port = int(m.group(1))
        img = _images(1, seed=6)[0]
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            emb8 = np.asarray(json.loads(r.read())["embedding"])
        # int8-served embedding stays close to the fp service's
        svc = EmbeddingService(net, variables, image_size=SIZE,
                               crop_from=SIZE, batch=2,
                               dtype=jnp.float32)
        fp = svc.embed_batch(img[None])[0]
        assert float(np.dot(emb8, fp)) > 0.97
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_served_pixels_match_extract_chain(service):
    """decode_request + embed_batch reproduces extract_shard's eval
    chain exactly — an online embedding is comparable with an offline
    one of the same source bytes (review regression: PIL's
    antialiasing resample had crept into the HTTP layer)."""
    from PIL import Image

    from tf_face_toolbox_tpu.data.pipeline import _resize_u8

    rng = np.random.default_rng(9)
    src = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(src).save(buf, "JPEG", quality=95)
    frame = service.decode_request(buf.getvalue())
    # same bytes through the offline host chain
    decoded = np.asarray(Image.open(io.BytesIO(buf.getvalue()))
                         .convert("RGB"), np.uint8)
    want = _resize_u8(decoded, service.crop_from, service.crop_from)
    np.testing.assert_array_equal(frame, want)


def test_submit_validates_before_coalescing(service):
    """A malformed request fails alone instead of poisoning the batch
    it would have joined."""
    batcher = DynamicBatcher(service, max_wait_ms=50.0)
    try:
        bad_sent = threading.Event()
        good_result = []

        def good():
            bad_sent.wait()
            good_result.append(batcher.submit(_images(1, seed=4)[0]))

        t = threading.Thread(target=good)
        t.start()
        with pytest.raises(ValueError, match="decode_request"):
            bad_sent.set()
            batcher.submit(np.zeros((7, 7, 3), np.uint8))
        t.join()
        assert len(good_result) == 1  # the good request still served
    finally:
        batcher.close()


@pytest.mark.mid
def test_close_fails_pending_requests(service):
    """close() resolves queued requests with an error instead of
    leaving callers to block out their timeouts."""
    batcher = DynamicBatcher(service, max_wait_ms=5000.0)  # long window
    errors = []

    def work():
        try:
            batcher.submit(_images(1, seed=5)[0], timeout=10)
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=work) for _ in range(3)]
    for t in threads:
        t.start()
    import time
    time.sleep(0.2)  # let them coalesce into the wait window
    t0 = time.time()
    batcher.close()
    for t in threads:
        t.join(timeout=10)
    assert time.time() - t0 < 8, "close did not unblock submitters"
    # every request finished — either served (dispatcher won the race)
    # or failed with the explicit closed error, never a hang
    assert all(not t.is_alive() for t in threads)


def test_http_embed_batch_endpoint(service):
    """/embed_batch: bulk npy (N,H,W,3) in, N embeddings out, chunked
    through the fixed-batch program; agrees with per-image /embed."""
    batcher = DynamicBatcher(service, max_wait_ms=1.0)
    server = serve(batcher, port=0, max_body_mb=1)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        imgs = _images(BATCH + 3, seed=8)  # forces chunking
        buf = io.BytesIO()
        np.save(buf, imgs)
        req = urllib.request.Request(f"{base}/embed_batch",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            embs = np.asarray(json.loads(r.read())["embeddings"])
        assert embs.shape == (BATCH + 3, DIM)
        want = np.concatenate([service.embed_batch(imgs[:BATCH]),
                               service.embed_batch(imgs[BATCH:])])
        np.testing.assert_allclose(embs, want, atol=1e-5)
        # content negotiation: Accept: application/x-npy returns the
        # same embeddings as a binary .npy body (bulk JSON encode is
        # the HTTP bottleneck — serve_bench --transports)
        buf = io.BytesIO()
        np.save(buf, imgs)
        req = urllib.request.Request(
            f"{base}/embed_batch", data=buf.getvalue(), method="POST",
            headers={"Accept": "application/x-npy"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.headers["Content-Type"] == "application/x-npy"
            npy_embs = np.load(io.BytesIO(r.read()), allow_pickle=False)
        assert npy_embs.dtype == np.float32
        np.testing.assert_allclose(npy_embs, want, atol=1e-5)
        # the single-frame endpoint honors the same Accept header
        buf = io.BytesIO()
        np.save(buf, imgs[0])
        req = urllib.request.Request(
            f"{base}/embed", data=buf.getvalue(), method="POST",
            headers={"Accept": "application/x-npy"})
        with urllib.request.urlopen(req, timeout=30) as r:
            one = np.load(io.BytesIO(r.read()), allow_pickle=False)
        np.testing.assert_allclose(one, want[0], atol=1e-5)
        # malformed: 3-d payload is a client error
        buf = io.BytesIO()
        np.save(buf, imgs[0])
        req = urllib.request.Request(f"{base}/embed_batch",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
        # bulk traffic shows up in /stats (requests, images, latency)
        with urllib.request.urlopen(f"{base}/stats") as r:
            stats = json.loads(r.read())
        assert stats["images"] >= BATCH + 3 and "latency_ms" in stats
        # body cap: an over-limit payload gets 413, not an OOM attempt
        big = np.zeros((40, 128, 128, 3), np.uint8)  # ~1.9 MB > 1 MB
        buf = io.BytesIO()
        np.save(buf, big)
        req = urllib.request.Request(f"{base}/embed_batch",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 413
    finally:
        server.shutdown()
        batcher.close()


def test_validate_rejects_non_uint8(service):
    """ADVICE r2: a float frame would upcast the padded batch and
    silently recompile the warmed uint8 program."""
    bad = _images(1)[0].astype(np.float32)
    with pytest.raises(ValueError, match="uint8"):
        service.validate(bad)
    batcher = DynamicBatcher(service)
    try:
        with pytest.raises(ValueError, match="uint8"):
            batcher.submit(bad)
    finally:
        batcher.close()


def test_submit_racing_close_fails_fast(service):
    """ADVICE r2: a request enqueued concurrently with close()'s drain
    must fail promptly, not block out its full submit timeout."""
    import time

    batcher = DynamicBatcher(service)
    batcher.close()  # workers gone, queue drained
    t0 = time.monotonic()
    with pytest.raises((RuntimeError, TimeoutError)) as e:
        batcher.submit(_images(1)[0], timeout=30.0)
    # the post-put _stop re-check must fire: well under the timeout
    assert time.monotonic() - t0 < 5.0
    assert "closed" in str(e.value)


def _unix_post(path, route, body, timeout=30.0):
    """Minimal HTTP POST over an AF_UNIX socket."""
    import http.client
    import socket

    class _Conn(http.client.HTTPConnection):
        def __init__(self):
            super().__init__("localhost", timeout=timeout)

        def connect(self):
            self.sock = socket.socket(socket.AF_UNIX,
                                      socket.SOCK_STREAM)
            self.sock.settimeout(self.timeout)
            self.sock.connect(path)

    conn = _Conn()
    try:
        conn.request("POST", route, body=body,
                     headers={"Content-Length": str(len(body))})
        r = conn.getresponse()
        return r.status, json.loads(r.read())
    finally:
        conn.close()


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_unix_socket_serving(service, tmp_path):
    """HTTP over AF_UNIX: same endpoints, no TCP."""
    sock_path = str(tmp_path / "embed.sock")
    batcher = DynamicBatcher(service)
    server = serve(batcher, unix_socket=sock_path)
    try:
        status, out = _unix_post(sock_path, "/embed",
                                 _npy_bytes(_images(1)[0]))
        assert status == 200 and len(out["embedding"]) == DIM
    finally:
        server.shutdown()
        server.wait_idle(10)
        server.server_close()
        batcher.close()


def test_rolling_restart_zero_dropped_requests(service, tmp_path):
    """Rolling restart over one unix-socket path (VERDICT r2 #8): the
    new server takes the path over atomically; the old one drains its
    in-flight requests. Every client request — including those accepted
    by the OLD server at switchover — must succeed; retries only cover
    the instant between old-close and new-rename."""
    import threading
    import time

    sock_path = str(tmp_path / "roll.sock")
    payloads = [_npy_bytes(img) for img in _images(8, seed=3)]

    batcher_a = DynamicBatcher(service)
    server_a = serve(batcher_a, unix_socket=sock_path)

    results = []
    results_mu = threading.Lock()
    stop_clients = threading.Event()

    def client(idx):
        k = 0
        while not stop_clients.is_set():
            body = payloads[(idx + k) % len(payloads)]
            k += 1
            for attempt in range(50):
                try:
                    status, _ = _unix_post(sock_path, "/embed", body)
                    with results_mu:
                        results.append(status)
                    break
                except (ConnectionRefusedError, FileNotFoundError,
                        ConnectionResetError, BrokenPipeError):
                    time.sleep(0.05)
            else:
                with results_mu:
                    results.append(-1)  # permanently failed
            time.sleep(0.01)

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(4)]
    for t in threads:
        t.start()
    time.sleep(0.8)  # traffic flowing against server A

    # --- rolling restart: B takes the path over, A drains ---
    batcher_b = DynamicBatcher(service)
    server_b = serve(batcher_b, unix_socket=sock_path)
    server_a.shutdown()                # A: stop accepting
    assert server_a.wait_idle(30)      # A: in-flight completed
    server_a.server_close()
    batcher_a.close()

    time.sleep(0.8)  # traffic flowing against server B
    stop_clients.set()
    for t in threads:
        t.join(timeout=60)
    server_b.shutdown()
    server_b.wait_idle(10)
    server_b.server_close()
    batcher_b.close()

    assert results, "no requests completed"
    bad = [r for r in results if r != 200]
    assert not bad, f"{len(bad)} non-200 of {len(results)}: {bad[:10]}"


# --------------------------------------------------------------- gRPC


@pytest.fixture(scope="module")
def grpc_stack(service):
    from tf_face_toolbox_tpu.serving.grpc_server import (
        GrpcEmbeddingClient,
        serve_grpc,
    )

    batcher = DynamicBatcher(service, max_wait_ms=1.0)
    server = serve_grpc(batcher, port=0)
    client = GrpcEmbeddingClient(f"127.0.0.1:{server.bound_port}")
    yield client, batcher
    client.close()
    server.stop(grace=5).wait()
    batcher.close()


def test_grpc_embed_matches_service(grpc_stack, service):
    from PIL import Image

    client, _ = grpc_stack
    img = _images(1, seed=3)[0]
    want = service.embed_batch(img[None])[0]
    # npy frame body
    np.testing.assert_allclose(client.embed(img), want, atol=1e-5)
    # JPEG body goes through the same decode_request sniffing
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    emb = client.embed(buf.getvalue())
    assert emb.shape == (DIM,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-4)


def test_grpc_embed_batch_and_stats(grpc_stack, service):
    client, _ = grpc_stack
    imgs = _images(BATCH + 2, seed=4)
    got = client.embed_batch(imgs)
    want = np.concatenate([service.embed_batch(imgs[:BATCH]),
                           service.embed_batch(imgs[BATCH:])])
    np.testing.assert_allclose(got, want, atol=1e-5)
    health = client.health()
    assert health["status"] == "ok" and health["batch"] == BATCH
    stats = client.stats()
    assert stats["images"] >= BATCH + 2
    # the r3 per-endpoint latency split: bulk and coalesced singles
    # are reported separately
    assert "embed_batch" in stats["latency_ms_by_endpoint"]


def test_grpc_multi_model_routing(service):
    """serve_grpc({name: batcher}) routes by the tfft-model metadata
    key, defaults to the first entry, reports all models on bare
    Health/Stats, and NOT_FOUNDs unknown names — the same surface the
    HTTP front-end serves via ?model= (VERDICT r3 #8)."""
    import grpc

    from tf_face_toolbox_tpu.serving.grpc_server import (
        GrpcEmbeddingClient,
        serve_grpc,
    )

    net_b = create_network("resnet_tiny", embedding_dim=DIM + 2,
                           dtype=jnp.float32)
    vars_b = init_variables(net_b, jax.random.key(7),
                            (1, SIZE, SIZE, 3))
    svc_b = EmbeddingService(net_b, vars_b, image_size=SIZE,
                             crop_from=SIZE, batch=BATCH,
                             dtype=jnp.float32, step=11)
    svc_b.warmup()
    ba = DynamicBatcher(service, max_wait_ms=1.0)
    bb = DynamicBatcher(svc_b, max_wait_ms=1.0)
    server = serve_grpc({"big": ba, "small": bb}, port=0)
    client = GrpcEmbeddingClient(f"127.0.0.1:{server.bound_port}")
    try:
        img = _images(1, seed=5)[0]
        # explicit routing hits the right model (dims differ)
        assert client.embed(img, model="big").shape == (DIM,)
        assert client.embed(img, model="small").shape == (DIM + 2,)
        assert client.embed_batch(img[None],
                                  model="small").shape == (1, DIM + 2)
        # no metadata -> the FIRST entry (single-model clients work)
        assert client.embed(img).shape == (DIM,)
        # unknown model -> NOT_FOUND with the model list
        with pytest.raises(grpc.RpcError) as exc:
            client.embed(img, model="nope")
        assert exc.value.code() == grpc.StatusCode.NOT_FOUND
        assert "big" in exc.value.details()
        # bare Health/Stats report every model; metadata scopes to one
        health = client.health()
        assert set(health["models"]) == {"big", "small"}
        assert health["models"]["small"]["serving_step"] == 11
        assert client.health(model="small")["serving_step"] == 11
        stats = client.stats(model="big")
        assert "requests" in stats and "models" not in stats
        assert set(client.stats()["models"]) == {"big", "small"}
    finally:
        client.close()
        server.stop(grace=5).wait()
        ba.close()
        bb.close()


def test_grpc_malformed_is_invalid_argument(grpc_stack):
    import grpc

    client, _ = grpc_stack
    with pytest.raises(grpc.RpcError) as exc:
        client.embed(b"not an image")
    assert exc.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    with pytest.raises(grpc.RpcError) as exc:
        client.embed_batch(_images(2)[0])  # (H, W, 3): missing N axis
    assert exc.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_grpc_body_over_4mib_reaches_our_guard(grpc_stack):
    """gRPC's transport default is a 4 MiB message cap, which would
    reject big-but-legal bodies BEFORE the server's max_body guard
    (as a retryable-looking RESOURCE_EXHAUSTED). The server must own
    the limit: a >4 MiB malformed payload has to come back as our
    INVALID_ARGUMENT (shape guard), proving the transport let it in."""
    import grpc

    client, _ = grpc_stack
    with pytest.raises(grpc.RpcError) as exc:
        client.embed_batch(np.zeros(5 << 20, np.uint8))  # 5 MiB, 1-d
    assert exc.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    assert "must be (N, H, W, 3)" in exc.value.details()


def test_grpc_unix_takeover_survives_old_server_drain(service,
                                                      tmp_path):
    """Rolling restart over one socket path: after the NEW server
    takes the path over, the OLD server's stop() must not delete it
    (grpc core unlinks its own bound path on stop — the temp+rename
    bind keeps that unlink off the live target)."""
    import os

    from tf_face_toolbox_tpu.serving.grpc_server import (
        GrpcEmbeddingClient,
        serve_grpc,
    )

    path = str(tmp_path / "tfft.sock")
    old_b = DynamicBatcher(service, max_wait_ms=1.0)
    new_b = DynamicBatcher(service, max_wait_ms=1.0)
    old = serve_grpc(old_b, unix_socket=path)
    new = None
    try:
        with GrpcEmbeddingClient(f"unix:{path}") as client:
            assert client.health()["status"] == "ok"
        new = serve_grpc(new_b, unix_socket=path)  # atomic takeover
        old.stop(grace=5).wait()                   # old drains away
        assert os.path.exists(path), \
            "old server's stop() unlinked the new server's socket"
        img = _images(1, seed=9)[0]
        want = service.embed_batch(img[None])[0]
        with GrpcEmbeddingClient(f"unix:{path}") as client:
            np.testing.assert_allclose(client.embed(img), want,
                                       atol=1e-5)
            assert new_b.stats["requests"] >= 1  # served by NEW
    finally:
        if new is not None:
            new.stop(grace=5).wait()
        old_b.close()
        new_b.close()


def test_grpc_unix_socket(service, tmp_path):
    from tf_face_toolbox_tpu.serving.grpc_server import (
        GrpcEmbeddingClient,
        serve_grpc,
    )

    path = str(tmp_path / "tfft.sock")
    batcher = DynamicBatcher(service, max_wait_ms=1.0)
    server = serve_grpc(batcher, unix_socket=path)
    try:
        with GrpcEmbeddingClient(f"unix:{path}") as client:
            img = _images(1, seed=5)[0]
            want = service.embed_batch(img[None])[0]
            np.testing.assert_allclose(client.embed(img), want,
                                       atol=1e-5)
    finally:
        server.stop(grace=5).wait()
        batcher.close()


def test_grpc_drain_refuses_new_completes_inflight(service):
    """server.stop(grace) is the gRPC drain: new RPCs are refused
    while in-flight ones finish — the rolling-restart contract."""
    import grpc

    from tf_face_toolbox_tpu.serving.grpc_server import (
        GrpcEmbeddingClient,
        serve_grpc,
    )

    batcher = DynamicBatcher(service, max_wait_ms=50.0)
    server = serve_grpc(batcher, port=0)
    client = GrpcEmbeddingClient(f"127.0.0.1:{server.bound_port}")
    try:
        client.health()  # channel connects lazily; force it up first
        seen = batcher.stats["requests"]
        results = []

        def work():
            results.append(client.embed(_images(1, seed=6)[0]))

        t = threading.Thread(target=work)
        t.start()
        # wait until the RPC is truly in-flight (in the batcher's
        # straggler wait), THEN flip the server to draining
        import time as time_mod
        deadline = time_mod.monotonic() + 10
        while (batcher.stats["requests"] <= seen
               and time_mod.monotonic() < deadline):
            time_mod.sleep(0.005)
        assert batcher.stats["requests"] > seen, "RPC never arrived"
        ev = server.stop(grace=10)
        t.join(timeout=10)
        assert results and results[0].shape == (DIM,)
        assert ev.wait(timeout=10), "drain did not complete"
        with pytest.raises(grpc.RpcError):
            client.embed(_images(1, seed=7)[0], timeout=5)
    finally:
        client.close()
        batcher.close()


def test_service_serves_dct_backbone():
    """The daemon's pixel chain feeds stem='dct' nets unchanged (the
    in-net blockwise DCT is part of the forward)."""
    from tf_face_toolbox_tpu.models import create_network, init_variables

    net = create_network("dct_resnet_50", embedding_dim=DIM,
                         dtype=jnp.float32, stage_sizes=(1, 1, 1),
                         stage_widths=(8, 16, 32), dct_stem_features=8)
    variables = init_variables(net, jax.random.key(0), (1, 16, 16, 3))
    svc = EmbeddingService(net, variables, image_size=16, crop_from=16,
                           batch=2, dtype=jnp.float32)
    svc.warmup()
    out = svc.embed_batch(_images(2, seed=9))
    assert out.shape == (2, DIM)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# Hot model reload (serving/reload.py + EmbeddingService.reload)
# ---------------------------------------------------------------------------

def _net_and_variables(seed, dim=DIM, **kw):
    from tf_face_toolbox_tpu.models import create_network, init_variables

    net = create_network("resnet_tiny", embedding_dim=dim,
                         dtype=jnp.float32, **kw)
    return net, init_variables(net, jax.random.key(seed),
                               (1, SIZE, SIZE, 3))


def _service(net, variables, **kw):
    svc = EmbeddingService(net, variables, image_size=SIZE,
                           crop_from=SIZE, batch=BATCH,
                           dtype=jnp.float32, **kw)
    svc.warmup()
    return svc


def test_reload_swaps_weights_without_recompile():
    from tf_face_toolbox_tpu.serving.server import (
        health_payload,
        stats_payload,
    )

    net, v0 = _net_and_variables(0)
    _, v1 = _net_and_variables(1)
    svc = _service(net, v0)
    imgs = _images(2, seed=3)
    before = svc.embed_batch(imgs)
    fwd = svc._forward
    svc.reload(v1, step=7)
    after = svc.embed_batch(imgs)
    assert svc._forward is fwd          # same compiled program
    assert svc.step == 7 and svc.reloads == 1
    assert not np.allclose(before, after)
    assert health_payload(svc)["serving_step"] == 7
    batcher = DynamicBatcher(svc, max_wait_ms=1.0)
    try:
        s = stats_payload(batcher)
        assert s["serving_step"] == 7 and s["reloads"] == 1
    finally:
        batcher.close()


def test_reload_refuses_mismatched_tree():
    net, v0 = _net_and_variables(0)
    _, bad = _net_and_variables(1, dim=DIM * 2)
    svc = _service(net, v0)
    imgs = _images(1, seed=4)
    before = svc.embed_batch(imgs)
    with pytest.raises(ValueError, match="do not match"):
        svc.reload(bad)
    # old model still live, untouched
    np.testing.assert_array_equal(svc.embed_batch(imgs), before)
    assert svc.reloads == 0


def test_reload_bare_swap_refused_when_weights_baked():
    """A folded-engine forward ignores its variables argument; a bare
    variable swap on such a service would be a silent no-op that still
    advances step/reloads — it must be refused instead."""
    from tf_face_toolbox_tpu.serving import make_serving_apply

    net, v0 = _net_and_variables(0, stem="imagenet")
    _, v1 = _net_and_variables(1, stem="imagenet")
    svc = _service(net, v0, apply_fn=make_serving_apply(net, v0))
    with pytest.raises(ValueError, match="bakes weights"):
        svc.reload(v1, step=9)
    assert svc.reloads == 0 and svc.step is None


def test_reload_folded_engine_rebuilds_and_matches_flax():
    from tf_face_toolbox_tpu.serving import make_serving_apply

    net, v0 = _net_and_variables(0, stem="imagenet")
    _, v1 = _net_and_variables(1, stem="imagenet")
    svc = _service(net, v0, apply_fn=make_serving_apply(net, v0))
    imgs = _images(2, seed=5)
    fwd = svc._forward
    svc.reload(v1, apply_fn=make_serving_apply(net, v1), step=3)
    assert svc._forward is not fwd      # rebuilt + rewarmed
    flax_svc = _service(net, v1)
    np.testing.assert_allclose(svc.embed_batch(imgs),
                               flax_svc.embed_batch(imgs),
                               rtol=2e-4, atol=2e-4)


def test_reload_does_not_drop_inflight_requests():
    net, v0 = _net_and_variables(0)
    _, v1 = _net_and_variables(1)
    svc = _service(net, v0)
    batcher = DynamicBatcher(svc, max_wait_ms=1.0)
    errors: list = []

    def client(seed):
        img = _images(1, seed=seed)[0]
        for _ in range(15):
            try:
                e = batcher.submit(img, timeout=30)
                assert np.isfinite(e).all()
            except Exception as exc:  # noqa: BLE001 — collect, assert after
                errors.append(exc)

    threads = [threading.Thread(target=client, args=(s,))
               for s in range(3)]
    for t in threads:
        t.start()
    for i in range(10):
        svc.reload(v1 if i % 2 == 0 else v0)
    for t in threads:
        t.join()
    batcher.close()
    assert not errors
    assert svc.reloads == 10


@pytest.mark.mid
def test_checkpoint_watcher_hot_reloads(tmp_path):
    """TF-Serving-style polling: train → serve → train more → the
    watcher swaps the daemon onto the new step without a restart."""
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    from tf_face_toolbox_tpu.pretrained import load_variables
    from tf_face_toolbox_tpu.serving.reload import CheckpointWatcher
    from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager
    from tf_face_toolbox_tpu.train.loop import train_loop
    from tf_face_toolbox_tpu.train.trainer import TrainConfig

    cfg = TrainConfig(network="resnet_tiny", num_classes=12,
                      embedding_dim=DIM, image_size=SIZE,
                      global_batch=8, augment=False,
                      dtype=jnp.float32, weight_decay=0.0,
                      warmup_steps=0, base_lr=0.05)
    mesh = create_mesh()

    def batches():
        rng = np.random.default_rng(0)
        while True:
            yield {"image": rng.normal(
                       size=(8, SIZE, SIZE, 3)).astype(np.float32),
                   "label": (np.arange(8) % 12).astype(np.int32)}

    train_dir = str(tmp_path / "run")
    train_loop(cfg, mesh, batches(), num_steps=1, train_dir=train_dir,
               save_every=1, log_every=1)

    net, variables = load_variables(train_dir, "resnet_tiny", DIM,
                                    SIZE, jnp.float32)
    svc = _service(net, variables, step=1)

    def rebuild():
        step = CheckpointManager(train_dir).latest_step()
        _, v = load_variables(train_dir, "resnet_tiny", DIM, SIZE,
                              jnp.float32)
        return v, None, step

    watcher = CheckpointWatcher(svc, train_dir, rebuild, interval=3600)
    assert watcher.poll_once() is False         # nothing new yet
    imgs = _images(2, seed=9)
    before = svc.embed_batch(imgs)

    train_loop(cfg, mesh, batches(), num_steps=3, train_dir=train_dir,
               save_every=1, log_every=1)       # resumes 1 → 3
    assert watcher.poll_once() is True
    assert svc.step == 3 and svc.reloads == 1
    np.testing.assert_allclose(svc.embed_batch(imgs), before, atol=1e-3)
    # served weights are now EXACTLY the step-3 checkpoint's (embedding
    # deltas after 2 tiny steps are sub-1e-5 — tree equality is the
    # real contract, not a visible output change)
    want, _, _ = rebuild()
    live = jax.tree.leaves(svc._variables)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(live, jax.tree.leaves(want)))
    booted = jax.tree.leaves(variables)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(live, booted))
    assert watcher.poll_once() is False         # idempotent at latest


@pytest.mark.slow
def test_cli_serve_watch_hot_reload(tmp_path):
    """cli.serve --watch_interval: a training process writes a newer
    checkpoint and the live daemon advances to it (TF-Serving-style
    version polling) without a restart."""
    import os
    import re
    import subprocess
    import sys
    import time

    from PIL import Image

    rng = np.random.default_rng(0)
    lines = []
    for i in range(12):
        arr = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"img{i}.jpg"),
                                  "JPEG", quality=95)
        lines.append(f"img{i}.jpg {i % 4}")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")

    env = dict(os.environ, TFFT_PLATFORM="cpu")
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8"
                        ).strip()

    def run(args):
        r = subprocess.run([sys.executable, "-m"] + args,
                           capture_output=True, text=True, env=env)
        assert r.returncode == 0, f"{args}:\n{r.stdout}\n{r.stderr}"

    shard = str(tmp_path / "data.faceshard")
    run(["tf_face_toolbox_tpu.cli.pack",
         f"--list={tmp_path/'list.txt'}", f"--root={tmp_path}",
         f"--output={shard}"])
    train = ["tf_face_toolbox_tpu.cli.train", f"--data={shard}",
             f"--train_dir={tmp_path/'run'}", "--network=resnet_tiny",
             "--embedding_dim=16", "--image_size=12", "--crop_from=16",
             "--global_batch=8", "--nobf16", "--save_every=2",
             "--log_every=1"]
    run(train + ["--num_steps=2"])

    proc = subprocess.Popen(
        [sys.executable, "-m", "tf_face_toolbox_tpu.cli.serve",
         f"--checkpoint_dir={tmp_path/'run'}", "--network=resnet_tiny",
         "--embedding_dim=16", "--image_size=12", "--crop_from=16",
         "--nobf16", "--engine=flax", "--port=0", "--max_batch=2",
         "--max_wait_ms=1", "--watch_interval=0.5"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
    try:
        line = _wait_serving(proc, 180)
        port = int(re.search(r"http://[\d.]+:(\d+)", line).group(1))

        def serving_step():
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
                return json.loads(r.read())["serving_step"]

        assert serving_step() == 2
        run(train + ["--num_steps=4"])      # resume 2 -> 4, new ckpt
        deadline = time.time() + 90
        while time.time() < deadline and serving_step() != 4:
            time.sleep(0.5)
        assert serving_step() == 4, proc.captured[-8:]
        # the daemon still answers embedding traffic after the swap
        buf = io.BytesIO()
        np.save(buf, rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            emb = np.asarray(json.loads(r.read())["embedding"])
        assert emb.shape == (16,)
        proc.terminate()
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)


def test_fixed_norm_service_matches_offline_chain(service):
    """norm='fixed' serves the imported-checkpoint convention and must
    equal the offline extract chain (preprocess_eval fixed + flip avg)."""
    from tf_face_toolbox_tpu.extract import flip_averaged_embeddings
    from tf_face_toolbox_tpu.ops.preprocess import preprocess_eval

    net = create_network("resnet_tiny", embedding_dim=DIM,
                         dtype=jnp.float32)
    variables = init_variables(net, jax.random.key(0),
                               (1, SIZE, SIZE, 3))
    svc = EmbeddingService(net, variables, image_size=SIZE,
                           crop_from=SIZE, batch=BATCH,
                           dtype=jnp.float32, norm="fixed")
    imgs = _images(BATCH, seed=3)
    got = svc.embed_batch(imgs)
    x = preprocess_eval(jnp.asarray(imgs), SIZE, SIZE, "fixed")
    want = flip_averaged_embeddings(
        lambda v, xx: net.apply(v, xx, train=False), variables, x)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)
    # and it is NOT the per-image serving (same weights, same pixels)
    assert not np.allclose(got, service.embed_batch(imgs), atol=1e-3)


# ---------------------------------------------------------------- gallery

def test_device_gallery_enroll_search_and_growth():
    from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

    rng = np.random.default_rng(0)

    def unit(n):
        e = rng.normal(size=(n, DIM)).astype(np.float32)
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    g = DeviceGallery(DIM, block=4)
    base = unit(6)
    assert g.enroll(base, np.arange(6)) == 6          # crosses block 4
    labs, scores = g.search(base[2], k=3)
    assert labs[0, 0] == 2 and scores[0, 0] == pytest.approx(1.0, abs=1e-5)
    # grow past another block boundary; old entries still found
    g.enroll(unit(5), 100 + np.arange(5))
    assert len(g) == 11
    labs, _ = g.search(base[5], k=1)
    assert labs[0, 0] == 5
    # k clamps to size; empty probe dim mismatch is loud
    labs, scores = g.search(base[0], k=99)
    assert labs.shape == (1, 11)
    assert np.all(np.diff(scores[0]) <= 1e-6)         # descending
    with pytest.raises(ValueError, match="dim"):
        g.search(np.zeros((1, DIM + 1), np.float32))


def test_device_gallery_incremental_matches_bulk():
    """The r4 incremental device sync (in-place append + on-device
    grow) must produce search results identical to one bulk enroll —
    H2D traffic per enroll is only the new rows now, so the device
    copy is built through a different path than the host master."""
    from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

    rng = np.random.default_rng(5)
    e = rng.normal(size=(23, DIM)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    bulk = DeviceGallery(DIM, block=8)
    bulk.enroll(e, np.arange(23))
    inc = DeviceGallery(DIM, block=8)
    for i in range(0, 23, 3):                 # crosses two boundaries
        inc.enroll(e[i:i + 3], np.arange(i, min(i + 3, 23)))
    for probe in (e[0], e[11], e[22]):
        lb, sb = bulk.search(probe, k=5)
        li, si = inc.search(probe, k=5)
        np.testing.assert_array_equal(lb, li)
        np.testing.assert_allclose(sb, si, atol=1e-6)
    # remove() re-syncs from host; results stay exact after it
    inc.remove(11)
    labs, _ = inc.search(e[12], k=1)
    assert labs[0, 0] == 12


def test_device_gallery_bf16_store():
    from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

    rng = np.random.default_rng(6)
    e = rng.normal(size=(12, DIM)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    g32 = DeviceGallery(DIM, block=8)
    g16 = DeviceGallery(DIM, block=8, dtype="bfloat16")
    g32.enroll(e, np.arange(12))
    g16.enroll(e, np.arange(12))
    assert g16.device_bytes() == g32.device_bytes() // 2
    l32, s32 = g32.search(e[7], k=3)
    l16, s16 = g16.search(e[7], k=3)
    assert l16[0, 0] == l32[0, 0] == 7
    np.testing.assert_allclose(s16, s32, atol=5e-3)   # bf16 mantissa
    with pytest.raises(ValueError, match="dtype"):
        DeviceGallery(DIM, dtype="f8")


def test_device_gallery_capacity_refusal():
    from tf_face_toolbox_tpu.serving.gallery import (
        DeviceGallery,
        GalleryCapacityError,
    )

    # limit = one block exactly: the first block fits, growing refuses
    limit_gb = 8 * DIM * 4 / 1e9
    g = DeviceGallery(DIM, block=8, hbm_limit_gb=limit_gb)
    e = np.eye(8, DIM, dtype=np.float32)
    g.enroll(e, np.arange(8))
    with pytest.raises(GalleryCapacityError, match="bfloat16"):
        g.enroll(e[:1], [99])
    assert len(g) == 8                     # refused enroll left no rows
    # bf16 halves the footprint: the same limit now admits 16 rows
    g16 = DeviceGallery(DIM, block=8, dtype="bfloat16",
                        hbm_limit_gb=limit_gb)
    g16.enroll(e, np.arange(8))
    g16.enroll(e, 100 + np.arange(8))
    assert len(g16) == 16
    # hbm_limit_gb=0 disables the bound
    g0 = DeviceGallery(DIM, block=8, hbm_limit_gb=0)
    g0.enroll(e, np.arange(8))
    g0.enroll(e, np.arange(8))
    assert len(g0) == 16


def test_device_gallery_streaming_overflow_exact():
    """overflow='stream': past the bound the gallery keeps enrolling
    and searches by streaming slabs through the device — results must
    EQUAL the resident path's (same compiled program per slab, exact
    host merge), and removals that shrink under the bound must resume
    residency."""
    from tf_face_toolbox_tpu.serving.gallery import (
        DeviceGallery,
        GalleryCapacityError,
    )

    rng = np.random.default_rng(9)
    e = rng.normal(size=(40, DIM)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)

    limit_gb = 8 * DIM * 4 / 1e9               # one 8-row block
    g = DeviceGallery(DIM, block=8, hbm_limit_gb=limit_gb,
                      overflow="stream")
    g.stream_slab_bytes = 8 * DIM * 4          # 8-row slabs → 5 slabs
    ref = DeviceGallery(DIM, block=8, hbm_limit_gb=0)

    g.enroll(e[:8], np.arange(8))
    assert not g.streaming
    g.enroll(e[8:], np.arange(8, 40))          # overflows → streams
    assert g.streaming and len(g) == 40
    ref.enroll(e, np.arange(40))

    for probe in (e[0], e[19], e[39], e[:6]):
        ls, ss = g.search(probe, k=5)
        lr, sr = ref.search(probe, k=5)
        np.testing.assert_array_equal(ls, lr)
        np.testing.assert_allclose(ss, sr, atol=1e-6)
        assert np.all(np.diff(ss, axis=1) <= 1e-6)    # sorted desc

    # enroll while streaming is host-append only; still exact
    extra = rng.normal(size=(3, DIM)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    g.enroll(extra, [100, 101, 102])
    labs, _ = g.search(extra[1], k=1)
    assert labs[0, 0] == 101

    # shrink back under the bound → residency resumes, results exact
    for lab in range(8, 40):
        g.remove(lab)
    g.remove(100), g.remove(101), g.remove(102)
    assert not g.streaming and len(g) == 8
    labs, scores = g.search(e[3], k=1)
    assert labs[0, 0] == 3
    assert scores[0, 0] == pytest.approx(1.0, abs=1e-5)

    # refuse mode is untouched by the new machinery
    r = DeviceGallery(DIM, block=8, hbm_limit_gb=limit_gb)
    r.enroll(e[:8], np.arange(8))
    with pytest.raises(GalleryCapacityError, match="stream"):
        r.enroll(e[8:9], [8])
    with pytest.raises(ValueError, match="overflow"):
        DeviceGallery(DIM, overflow="spill")


def test_device_gallery_int8_two_stage_exact():
    """int8 store: coarse s8 device pass + exact f32 rescore. Final
    labels AND scores must match the f32 gallery on well-separated
    data, through enroll-growth, streaming overflow, and remove."""
    from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

    rng = np.random.default_rng(11)
    e = rng.normal(size=(50, DIM)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)

    ref = DeviceGallery(DIM, block=8)
    g8 = DeviceGallery(DIM, block=8, dtype="int8")
    ref.enroll(e[:30], np.arange(30))
    g8.enroll(e[:20], np.arange(20))
    g8.enroll(e[20:30], np.arange(20, 30))     # growth path
    assert g8.device_bytes() == 32 * (DIM + 4)  # int8 rows + f32 scale
    for probe in (e[0], e[17], e[:5]):
        lr, sr = ref.search(probe, k=4)
        l8, s8 = g8.search(probe, k=4)
        np.testing.assert_array_equal(l8, lr)
        # rescore is exact f32 host math; the f32 device path matmuls
        # at default (bf16-pass) precision — allow that gap only
        np.testing.assert_allclose(s8, sr, atol=5e-3)
        assert s8[0 if probe.ndim == 1 else 0, 0] == pytest.approx(
            1.0, abs=1e-6)                     # self-match exact 1.0

    # streaming overflow keeps the two-stage contract
    gs = DeviceGallery(DIM, block=8, dtype="int8",
                       hbm_limit_gb=8 * (DIM + 4) / 1e9,
                       overflow="stream")
    gs.stream_slab_bytes = 8 * DIM             # 8-row slabs
    gs.enroll(e, np.arange(50))
    assert gs.streaming
    full = DeviceGallery(DIM, block=8)
    full.enroll(e, np.arange(50))
    for probe in (e[3], e[49], e[:7]):
        lf, sf = full.search(probe, k=5)
        l8, s8 = gs.search(probe, k=5)
        np.testing.assert_array_equal(l8, lf)
        np.testing.assert_allclose(s8, sf, atol=5e-3)

    # remove re-syncs through the quantizing full-upload path
    g8.remove(17)
    labs, _ = g8.search(e[18], k=1)
    assert labs[0, 0] == 18


def test_device_gallery_scan_search_equals_plain():
    """The lax.scan large-batch search (bounded intermediates) must
    return exactly what the plain full-sims program returns, for both
    f32 and int8 stores, including the non-divisible tail chunk."""
    from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

    rng = np.random.default_rng(13)
    e = rng.normal(size=(37, DIM)).astype(np.float32)  # cap 40, tail 5
    e /= np.linalg.norm(e, axis=1, keepdims=True)

    for dtype in ("float32", "int8"):
        plain = DeviceGallery(DIM, block=8, dtype=dtype)
        scan = DeviceGallery(DIM, block=8, dtype=dtype)
        scan.scan_sims_bytes = 8 * 4        # chunk = one 8-row block
        plain.enroll(e, np.arange(37))
        scan.enroll(e, np.arange(37))
        assert scan._scan_chunk(4, 40) == 8
        assert plain._scan_chunk(4, 40) == 0
        for probe in (e[0], e[:6], e[13:14]):
            lp, sp = plain.search(probe, k=5)
            ls, ss = scan.search(probe, k=5)
            np.testing.assert_array_equal(ls, lp)
            np.testing.assert_allclose(ss, sp, atol=1e-6)


def test_device_gallery_save_load_roundtrip(tmp_path):
    from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

    rng = np.random.default_rng(1)
    e = rng.normal(size=(5, DIM)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    g = DeviceGallery(DIM)
    g.enroll(e, [7, 8, 9, 10, 11])
    p = str(tmp_path / "gal.npz")
    assert g.save(p) == 5
    g2 = DeviceGallery.load(p)
    assert len(g2) == 5 and g2.dim == DIM
    labs, scores = g2.search(e[3], k=1)
    assert labs[0, 0] == 10
    # empty gallery refuses search
    with pytest.raises(ValueError, match="empty"):
        DeviceGallery(DIM).search(e[:1])


def test_http_gallery_enroll_identify(service):
    from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

    gallery = DeviceGallery(DIM, block=4)
    batcher = DynamicBatcher(service, max_wait_ms=1.0)
    server = serve(batcher, port=0, gallery=gallery,
                   enroll_min_quality=0.0)
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def post(path, img):
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(f"{base}{path}",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    try:
        imgs = _images(3, seed=9)
        for i, img in enumerate(imgs):
            out = post(f"/enroll?label={100 + i}", img)
            assert out["enrolled"] and out["size"] == i + 1
            assert out["quality"] > 0

        with urllib.request.urlopen(f"{base}/gallery") as r:
            assert json.loads(r.read())["size"] == 3

        out = post("/identify?k=2", imgs[1])
        assert out["matches"][0]["label"] == 101
        assert out["matches"][0]["score"] == pytest.approx(1.0, abs=1e-4)
        assert not out["unknown"]

        # open-set: impossible threshold marks it unknown
        out = post("/identify?k=1&threshold=2.0", imgs[1])
        assert out["unknown"]

        # quality floor refuses enrollment (422)
        req_img = imgs[0]
        buf = io.BytesIO()
        np.save(buf, req_img)
        req = urllib.request.Request(
            f"{base}/enroll?label=7&min_quality=1e9",
            data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 422

        # /gallery/save writes a loadable snapshot
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            p = f"{td}/g.npz"
            req = urllib.request.Request(
                f"{base}/gallery/save?path={p}", data=b"",
                method="POST")
            with urllib.request.urlopen(req) as r:
                assert json.loads(r.read())["saved"] == 3
            assert len(DeviceGallery.load(p)) == 3
    finally:
        server.shutdown()
        batcher.close()


def test_gallery_deenroll(service):
    from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

    gallery = DeviceGallery(DIM, block=4)
    batcher = DynamicBatcher(service, max_wait_ms=1.0)
    server = serve(batcher, port=0, gallery=gallery)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        imgs = _images(3, seed=11)
        for i, img in enumerate(imgs):
            buf = io.BytesIO()
            np.save(buf, img)
            req = urllib.request.Request(
                f"{base}/enroll?label={5 if i < 2 else 6}",
                data=buf.getvalue(), method="POST")
            urllib.request.urlopen(req).read()
        req = urllib.request.Request(f"{base}/deenroll?label=5",
                                     data=b"", method="POST")
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out == {"removed": 2, "size": 1}
        # remaining identity still identifiable
        buf = io.BytesIO()
        np.save(buf, imgs[2])
        req = urllib.request.Request(f"{base}/identify?k=1",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            assert json.loads(r.read())["matches"][0]["label"] == 6
    finally:
        server.shutdown()
        batcher.close()


def test_http_gallery_sharded_store(service):
    """The daemon duck-types gallery stores: the mesh-sharded
    DistributedGallery serves the same /enroll → /identify →
    /gallery/save surface (capacity = shards x hbm_limit_gb)."""
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    from tf_face_toolbox_tpu.serving.distributed_gallery import (
        DistributedGallery,
    )
    from tf_face_toolbox_tpu.serving.gallery import DeviceGallery

    gallery = DistributedGallery(DIM, mesh=create_mesh(), block=4)
    batcher = DynamicBatcher(service, max_wait_ms=1.0)
    server = serve(batcher, port=0, gallery=gallery,
                   enroll_min_quality=0.0)
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def post(path, img):
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(f"{base}{path}",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    try:
        imgs = _images(3, seed=13)
        for i, img in enumerate(imgs):
            out = post(f"/enroll?label={200 + i}", img)
            assert out["enrolled"] and out["size"] == i + 1
        with urllib.request.urlopen(f"{base}/gallery") as r:
            info = json.loads(r.read())
        assert info["size"] == 3 and not info["streaming"]
        out = post("/identify?k=2", imgs[2])
        assert out["matches"][0]["label"] == 202
        assert out["matches"][0]["score"] == pytest.approx(1.0,
                                                           abs=1e-4)
        # snapshot round-trips into the single-device store
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            p = f"{td}/g.npz"
            req = urllib.request.Request(
                f"{base}/gallery/save?path={p}", data=b"",
                method="POST")
            with urllib.request.urlopen(req) as r:
                assert json.loads(r.read())["saved"] == 3
            assert len(DeviceGallery.load(p)) == 3
    finally:
        server.shutdown()
        batcher.close()
