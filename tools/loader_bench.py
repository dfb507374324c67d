"""Input-stage benchmark: native C++ loader vs the Python decode path.

Builds a synthetic JPEG FaceShard, then measures host decode+resize
throughput (images/sec) for the native loader across thread counts and
for the Python (PIL) pool — the numbers that size the input stage
against the device's faces/sec (a single v5e chip consumes ~30k
112x112 faces/sec at the bf16 extraction headline, so the host must
sustain that rate per chip).

Usage: python tools/loader_bench.py [--count 2048] [--size 120]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def build_shard(path: str, count: int, size: int,
                subsampling: int = 2) -> None:
    from PIL import Image

    from tf_face_toolbox_tpu.data.format import PAYLOAD_JPEG, write_shard

    rng = np.random.default_rng(0)
    blobs = []
    for _ in range(count):
        # low-frequency content: realistic JPEG entropy, not noise
        base = rng.integers(0, 256, (size // 8, size // 8, 3),
                            dtype=np.uint8)
        img = Image.fromarray(base).resize((size, size), Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=90, subsampling=subsampling)
        blobs.append(buf.getvalue())
    write_shard(path, blobs, [i % 100 for i in range(count)],
                payload=PAYLOAD_JPEG)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--count", type=int, default=2048)
    p.add_argument("--size", type=int, default=120)
    p.add_argument("--out", type=int, default=112,
                   help="decode+resize target size")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--threads", default="1,4,8,16")
    args = p.parse_args()

    from tf_face_toolbox_tpu.data import native

    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "bench.faceshard")
    t0 = time.perf_counter()
    build_shard(path, args.count, args.size)
    print(f"# built {args.count} x {args.size}^2 jpeg shard "
          f"in {time.perf_counter()-t0:.1f}s "
          f"({os.path.getsize(path)/1e6:.1f} MB)")

    ids = np.arange(args.count, dtype=np.int64)

    def run_native(threads: int, prefetch: bool) -> float:
        r = native.NativeShardReader(path, num_threads=threads)
        # warm page cache out of the measurement
        r.decode_batch(ids[:args.batch], args.out, args.out)
        t0 = time.perf_counter()
        for lo in range(0, args.count - args.batch, args.batch):
            if prefetch:
                r.prefetch(ids[lo + args.batch:lo + 2 * args.batch])
            r.decode_batch(ids[lo:lo + args.batch], args.out, args.out)
        dt = time.perf_counter() - t0
        r.close()
        return (args.count - args.batch) / dt

    for t in [int(x) for x in args.threads.split(",")]:
        rate = run_native(t, prefetch=True)
        print(f"native  threads={t:2d}  {rate:10,.0f} images/sec")

    # DCT path: entropy decode only on host (IDCT/color move to the
    # TPU — ops/jpeg_tpu.py). Needs a 4:4:4 uniform shard; note 4:4:4
    # also carries ~2x the chroma entropy of the 4:2:0 shard above, so
    # this rate UNDERSTATES the like-for-like win.
    dct_path = os.path.join(tmp, "bench444.faceshard")
    build_shard(dct_path, args.count, args.size, subsampling=0)

    def run_dct(threads: int) -> float:
        r = native.NativeShardReader(dct_path, num_threads=threads)
        r.dct_batch(ids[:args.batch], args.size, args.size)  # warm
        t0 = time.perf_counter()
        for lo in range(0, args.count - args.batch, args.batch):
            r.prefetch(ids[lo + args.batch:lo + 2 * args.batch])
            r.dct_batch(ids[lo:lo + args.batch], args.size, args.size)
        dt = time.perf_counter() - t0
        r.close()
        return (args.count - args.batch) / dt

    def run_full_444(threads: int) -> float:
        r = native.NativeShardReader(dct_path, num_threads=threads)
        r.decode_batch(ids[:args.batch], args.out, args.out)
        t0 = time.perf_counter()
        for lo in range(0, args.count - args.batch, args.batch):
            r.prefetch(ids[lo + args.batch:lo + 2 * args.batch])
            r.decode_batch(ids[lo:lo + args.batch], args.out, args.out)
        dt = time.perf_counter() - t0
        r.close()
        return (args.count - args.batch) / dt

    for t in [int(x) for x in args.threads.split(",")]:
        full = run_full_444(t)
        dct = run_dct(t)
        print(f"4:4:4   threads={t:2d}  full {full:10,.0f}  "
              f"entropy-only {dct:10,.0f} images/sec  "
              f"({dct / full:.2f}x)")

    # Python reference path (PIL decode pool, pipeline._DecodePool)
    from tf_face_toolbox_tpu.data.pipeline import (
        FaceShardSource, _DecodePool, _resize_u8)

    src = FaceShardSource(path)
    pool = _DecodePool(src, 8)
    tr = lambda im: _resize_u8(im, args.out, args.out)  # noqa: E731
    pool.decode(list(range(args.batch)), tr)  # warm
    t0 = time.perf_counter()
    n = 0
    for lo in range(0, args.count - args.batch, args.batch):
        pool.decode(list(range(lo, lo + args.batch)), tr)
        n += args.batch
    dt = time.perf_counter() - t0
    pool.close()
    print(f"python  threads= 8  {n/dt:10,.0f} images/sec")


if __name__ == "__main__":
    main()
