"""Gallery scale bench: capacity / latency curves (VERDICT r3 #5).

Measures the daemon's 1:N store (serving/gallery.py DeviceGallery) at
10^5 / 10^6 / 10^7 rows on the attached TPU:

- bulk-load time (boot / --gallery=path.npz restore path: one upload),
- incremental single-row /enroll latency p50/p99 (the steady-state
  daemon path: donated in-place dynamic_update_slice),
- /identify search latency p50/p99 at probe batch 1 and 64 (k=5),
- device HBM footprint,
- bf16-vs-f32 score delta on identical data (the store-dtype gate),
- the loud GalleryCapacityError past hbm_limit_gb.

Results go into docs/design.md's gallery table.  Run:

    python tools/gallery_bench.py [--rows 100000,1000000,10000000]
"""
import argparse
import gc
import time

import numpy as np

from tf_face_toolbox_tpu.serving.gallery import (
    DeviceGallery,
    GalleryCapacityError,
)

DIM = 512


def make_rows(n: int, seed: int = 0) -> np.ndarray:
    """L2-normalized f32 rows, generated in chunks (f64 transient at
    10^7 x 512 would be 41 GB otherwise)."""
    rng = np.random.default_rng(seed)
    out = np.empty((n, DIM), np.float32)
    for i in range(0, n, 1 << 20):
        j = min(i + (1 << 20), n)
        c = rng.standard_normal((j - i, DIM), dtype=np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        out[i:j] = c
    return out


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def bench_config(rows: np.ndarray, dtype: str, hbm_limit_gb: float):
    n = rows.shape[0]
    g = DeviceGallery(DIM, dtype=dtype, hbm_limit_gb=hbm_limit_gb)
    t0 = time.perf_counter()
    g.enroll(rows, np.arange(n))
    # force completion: one search syncs the device store
    g.search(rows[:1], k=1)
    bulk_s = time.perf_counter() - t0

    one = rows[:1]
    enroll_ts = []
    for i in range(30):
        t0 = time.perf_counter()
        g.enroll(one, [n + i])
        enroll_ts.append(time.perf_counter() - t0)

    search_ts = {}
    for b in (1, 64):
        probes = rows[:b]
        for _ in range(3):                      # warmup + compile
            g.search(probes, k=5)
        ts = []
        for _ in range(30):
            t0 = time.perf_counter()
            g.search(probes, k=5)
            ts.append(time.perf_counter() - t0)
        search_ts[b] = ts

    res = dict(
        rows=n, dtype=dtype,
        device_gb=g.device_bytes() / 1e9,
        bulk_load_s=bulk_s,
        enroll_p50_ms=pct(enroll_ts, 50) * 1e3,
        enroll_p99_ms=pct(enroll_ts, 99) * 1e3,
        search1_p50_ms=pct(search_ts[1], 50) * 1e3,
        search1_p99_ms=pct(search_ts[1], 99) * 1e3,
        search64_p50_ms=pct(search_ts[64], 50) * 1e3,
        search64_p99_ms=pct(search_ts[64], 99) * 1e3,
    )
    del g
    gc.collect()
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="100000,1000000,10000000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.rows.split(",")]

    biggest = max(sizes)
    print(f"generating {biggest:,} x {DIM} rows ...", flush=True)
    all_rows = make_rows(biggest)

    # store-dtype gate: identical data, f32 vs bf16 store, same probes
    sub = all_rows[:100_000]
    g32 = DeviceGallery(DIM, dtype="float32")
    g16 = DeviceGallery(DIM, dtype="bfloat16")
    g32.enroll(sub, np.arange(sub.shape[0]))
    g16.enroll(sub, np.arange(sub.shape[0]))
    l32, s32 = g32.search(sub[:256], k=5)
    l16, s16 = g16.search(sub[:256], k=5)
    top1_match = float((l32[:, 0] == l16[:, 0]).mean())
    max_delta = float(np.abs(s32 - s16).max())
    print(f"bf16-vs-f32 @100k: top1 agreement {top1_match:.4f}, "
          f"max |score delta| {max_delta:.2e}", flush=True)
    del g32, g16
    gc.collect()

    results = []
    for n in sizes:
        for dtype in ("float32", "bfloat16"):
            need_gb = DeviceGallery(DIM, dtype=dtype).device_bytes(n) / 1e9
            if need_gb > 12.0:
                print(f"-- {n:,} {dtype}: {need_gb:.1f} GB store does "
                      f"not fit a 16 GB v5e chip beside a model; "
                      f"skipping (sharded cli.search is the path)",
                      flush=True)
                continue
            limit = 12.0 if need_gb > 8.0 else 8.0
            r = bench_config(all_rows[:n], dtype, hbm_limit_gb=limit)
            results.append(r)
            print(r, flush=True)

    # loud refusal demo at the default bound
    g = DeviceGallery(DIM, dtype="float32", hbm_limit_gb=8.0)
    g.enroll(all_rows[:1000], np.arange(1000))
    try:
        g.enroll(all_rows[: 4_000_000], np.arange(4_000_000))
        print("ERROR: expected GalleryCapacityError", flush=True)
    except GalleryCapacityError as e:
        print(f"capacity refusal OK: {e}", flush=True)

    print("\n| rows | dtype | HBM GB | bulk load s | enroll p50/p99 ms "
          "| identify B=1 p50/p99 ms | identify B=64 p50/p99 ms |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['rows']:,} | {r['dtype']} | {r['device_gb']:.2f} "
              f"| {r['bulk_load_s']:.1f} "
              f"| {r['enroll_p50_ms']:.1f} / {r['enroll_p99_ms']:.1f} "
              f"| {r['search1_p50_ms']:.1f} / {r['search1_p99_ms']:.1f} "
              f"| {r['search64_p50_ms']:.1f} / {r['search64_p99_ms']:.1f} |")


if __name__ == "__main__":
    main()
