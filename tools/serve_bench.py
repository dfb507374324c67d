"""Serving-daemon throughput study (reproduces docs/design.md numbers).

Measures four layers of the serving stack on the current device:

1. serial round trips — embed_batch in a loop (each call blocks on
   D2H before the next dispatch): what a naive serving loop gets;
2. pipelined dispatch — dispatch_batch for all batches, then
   materialize (the DynamicBatcher's dispatch→resolve split);
3. batcher end-to-end — concurrent client threads through
   DynamicBatcher.submit (adds coalescing + future overhead);
4. transport front-ends (``--transports``) — the same batcher behind
   the HTTP and gRPC servers, driven via bulk ``embed_batch`` from a
   loopback client: isolates wire + (de)serialization overhead.
   Three rows: HTTP returning JSON embeddings (default), HTTP with
   ``Accept: application/x-npy`` (binary body), gRPC (``.npy`` frame).

On this image the TPU tunnel makes 1 and 3 RTT-bound (~100 ms/round
trip) — the interesting column locally is the RELATIVE gain of 2.
On a directly-attached host all three approach the compiled program's
chained-timing batch rate (bench.py). Layer 4 is device-independent
overhead; run it with TFFT_PLATFORM=cpu and a tiny net to isolate the
transports themselves.

Run: python tools/serve_bench.py [--batch 64] [--network resnet_v1_50]
     [--transports]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--network", default="resnet_v1_50")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--image_size", type=int, default=112)
    p.add_argument("--transports", action="store_true",
                   help="also measure the HTTP vs gRPC front-ends "
                        "over the same batcher (bulk embed_batch)")
    args = p.parse_args()

    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()  # honors TFFT_PLATFORM=cpu like the CLIs

    import jax
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.models import create_network, init_variables
    from tf_face_toolbox_tpu.serving import make_serving_apply
    from tf_face_toolbox_tpu.serving.server import (
        DynamicBatcher,
        EmbeddingService,
    )

    s = args.image_size
    net = create_network(args.network, dtype=jnp.bfloat16)
    variables = init_variables(create_network(args.network),
                               jax.random.key(0), (1, s, s, 3))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    try:
        apply_fn = make_serving_apply(net, variables)
    except ValueError:
        apply_fn = None  # outside the folded engine's scope
    svc = EmbeddingService(net, variables, image_size=s, crop_from=s,
                           batch=args.batch, apply_fn=apply_fn)
    t0 = time.perf_counter()
    svc.warmup()
    print(f"# {args.network} b{args.batch} warmup "
          f"{time.perf_counter() - t0:.1f}s "
          f"(device={jax.devices()[0].platform})")
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (args.batch, s, s, 3), dtype=np.uint8)

    svc.embed_batch(imgs)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        svc.embed_batch(imgs)
    serial = args.reps * args.batch / (time.perf_counter() - t0)
    print(f"serial round trips:  {serial:10,.0f} faces/sec")

    t0 = time.perf_counter()
    outs = [svc.dispatch_batch(imgs) for _ in range(args.reps)]
    for o in outs:
        np.asarray(o[0])
    pipe = args.reps * args.batch / (time.perf_counter() - t0)
    print(f"pipelined dispatch:  {pipe:10,.0f} faces/sec "
          f"({pipe / serial:.2f}x)")

    batcher = DynamicBatcher(svc, max_wait_ms=5.0)
    try:
        per_client = max(1, args.reps * args.batch // args.clients // 4)

        def client(k):
            frame = imgs[k % args.batch]
            for _ in range(per_client):
                batcher.submit(frame)

        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        n = per_client * args.clients
        stats = batcher.stats
        print(f"batcher e2e:         {n / dt:10,.0f} faces/sec "
              f"({args.clients} clients, mean fill "
              f"{stats['images'] / max(stats['device_calls'], 1):.1f}, "
              f"p50 {stats.get('latency_ms', {}).get('p50', '?')} ms)")

        if args.transports:
            _bench_transports(batcher, imgs, args.reps, pipe)
    finally:
        batcher.close()


def _bench_transports(batcher, imgs, reps, pipe):
    """Layer 4: drive bulk embed_batch through each wire front-end.

    Both servers share ``batcher`` (and therefore the same compiled
    program), so any throughput difference is transport + marshalling:
    HTTP serializes embeddings as JSON text, gRPC as a binary ``.npy``
    frame — at 512 floats/face the JSON encode is the dominant cost.
    """
    import io
    import json
    import urllib.request

    import numpy as np

    from tf_face_toolbox_tpu.serving.grpc_server import (
        GrpcEmbeddingClient,
        serve_grpc,
    )
    from tf_face_toolbox_tpu.serving.server import serve

    buf = io.BytesIO()
    np.save(buf, imgs)
    body = buf.getvalue()
    n = len(imgs)

    http_srv = serve(batcher, port=0, max_body_mb=256)
    grpc_srv = serve_grpc(batcher, port=0, max_body_mb=256)
    client = GrpcEmbeddingClient(f"127.0.0.1:{grpc_srv.bound_port}")
    try:
        url = (f"http://127.0.0.1:{http_srv.server_address[1]}"
               "/embed_batch")

        def http_once():
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                return np.asarray(json.loads(r.read())["embeddings"])

        def http_npy_once():
            req = urllib.request.Request(
                url, data=body, method="POST",
                headers={"Accept": "application/x-npy"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return np.load(io.BytesIO(r.read()),
                               allow_pickle=False)

        for name, once in (("http json", http_once),
                           ("http npy ", http_npy_once),
                           ("grpc     ", lambda: client.embed_batch(imgs))):
            once()  # warm the connection/codec path
            t0 = time.perf_counter()
            for _ in range(reps):
                out = once()
            dt = time.perf_counter() - t0
            assert out.shape[0] == n
            rate = reps * n / dt
            print(f"transport {name}:      {rate:10,.0f} faces/sec "
                  f"({rate / pipe:.2f}x of pipelined dispatch)")
    finally:
        client.close()
        grpc_srv.stop(grace=5).wait()
        http_srv.shutdown()
        http_srv.server_close()


if __name__ == "__main__":
    main()
