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
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("TFFT_PLATFORM"):
    # the axon sitecustomize clears JAX_PLATFORMS; honor the repo's
    # own env var so CPU smoke runs don't land on the TPU tunnel
    jax.config.update("jax_platforms", os.environ["TFFT_PLATFORM"])

from tf_face_toolbox_tpu.serving.gallery import (  # noqa: E402
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


def device_search_ms(g: DeviceGallery, probes: np.ndarray) -> float:
    """Chained RTT-free device-only time for one search call — the
    number a directly-attached deployment would see (the e2e p50s
    below ride this image's ~50 ms tunnel floor)."""
    import jax
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.ops.pallas_topk import (
        cosine_topk,
        cosine_topk_q,
    )
    from tf_face_toolbox_tpu.serving.gallery import (
        _quantize_rows,
        _search_fn,
        _search_q_fn,
        _search_scan_fn,
    )
    from tf_face_toolbox_tpu.utils.profiling import chained_seconds_per_call

    with g._gate.cond:
        dev, dev_scale, n = g._dev, g._dev_scale, g._n
        dev_bias = g._dev_bias
    use_pl = g._pallas_ok(dev, probes.shape[0])   # kernel outranks
    chunk = (0 if use_pl else
             g._scan_chunk(probes.shape[0], dev.shape[0]))

    if g.dtype == "int8":
        # device side of the two-stage search: the s8 coarse pass at
        # kc = 5*rescore_expand (the host f32 rescore of B*kc rows is
        # ~µs and excluded, matching what a pipelined daemon overlaps)
        kc = 5 * g.rescore_expand
        pq, ps = _quantize_rows(probes)
        if use_pl:
            def call(p, p_s, dv, sc, bs, nn):
                s, i = cosine_topk_q(dv, sc, p, p_s, nn, kc, bias=bs)
                return s, i.astype(jnp.float32)
        else:
            fn = (_search_scan_fn(kc, chunk, True) if chunk
                  else _search_q_fn(kc))

            def call(p, p_s, dv, sc, bs, nn):
                s, i = fn(dv, sc, bs, p, p_s, nn)
                return s, i.astype(jnp.float32)

        return chained_seconds_per_call(
            call, jnp.asarray(pq), jnp.asarray(ps), dev, dev_scale,
            dev_bias, jnp.int32(n)) * 1e3

    if use_pl:
        def call(p, dv, bs, nn):
            s, i = cosine_topk(dv, p, nn, 5, bias=bs)
            return s, i.astype(jnp.float32)
    elif chunk:
        sfn = _search_scan_fn(5, chunk, False)
        dummy = jnp.zeros((1,), np.float32)

        def call(p, dv, bs, nn):
            s, i = sfn(dv, dummy, bs, p, dummy, nn)
            return s, i.astype(jnp.float32)
    else:
        fn = _search_fn(5)

        def call(p, dv, bs, nn):
            s, i = fn(dv, bs, p, nn)
            return s, i.astype(jnp.float32)

    return chained_seconds_per_call(
        call, jnp.asarray(probes), dev, dev_bias, jnp.int32(n)) * 1e3


def bench_config(rows: np.ndarray, dtype: str, hbm_limit_gb: float):
    n = rows.shape[0]
    g = DeviceGallery(DIM, dtype=dtype, hbm_limit_gb=hbm_limit_gb)
    t0 = time.perf_counter()
    g.enroll(rows, np.arange(n))
    # force completion: one search syncs the device store
    g.search(rows[:1], k=1)
    bulk_s = time.perf_counter() - t0

    one = rows[:1]
    t0 = time.perf_counter()
    g.enroll(one, [n])          # first single enroll pays the jit
    first_enroll_ms = (time.perf_counter() - t0) * 1e3
    enroll_ts = []
    for i in range(30):
        t0 = time.perf_counter()
        g.enroll(one, [n + 1 + i])
        enroll_ts.append(time.perf_counter() - t0)

    # /deenroll: r5 tombstone path — one tiny bias scatter, O(removed)
    # at any store size (the r4 full re-sync was O(gallery bytes))
    remove_ts = []
    for i in range(30):
        t0 = time.perf_counter()
        assert g.remove(n + 1 + i) == 1
        remove_ts.append(time.perf_counter() - t0)
    g.enroll(rows[:30], n + 1 + np.arange(30))   # restore the fill

    search_ts, dev_ms = {}, {}
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
        dev_ms[b] = device_search_ms(g, probes)

    res = dict(
        rows=n, dtype=dtype,
        device_gb=g.device_bytes() / 1e9,
        bulk_load_s=bulk_s,
        first_enroll_ms=first_enroll_ms,
        enroll_p50_ms=pct(enroll_ts, 50) * 1e3,
        enroll_p99_ms=pct(enroll_ts, 99) * 1e3,
        remove_p50_ms=pct(remove_ts, 50) * 1e3,
        remove_p99_ms=pct(remove_ts, 99) * 1e3,
        search1_p50_ms=pct(search_ts[1], 50) * 1e3,
        search1_p99_ms=pct(search_ts[1], 99) * 1e3,
        search1_dev_ms=dev_ms[1],
        search64_p50_ms=pct(search_ts[64], 50) * 1e3,
        search64_p99_ms=pct(search_ts[64], 99) * 1e3,
        search64_dev_ms=dev_ms[64],
    )
    del g
    gc.collect()
    return res


def bench_stream(rows: np.ndarray):
    """Overflow='stream' leg: force streaming at this size, measure
    e2e /identify latency (tunnel-transfer dominated on this image)
    and report the directly-attached projection from the byte count."""
    n = rows.shape[0]
    g = DeviceGallery(DIM, dtype="float32",
                      hbm_limit_gb=1e-6, overflow="stream")
    g.enroll(rows, np.arange(n))          # host-append only
    assert g.streaming
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        labs, _ = g.search(rows[i:i + 1], k=5)
        ts.append(time.perf_counter() - t0)
        assert labs[0, 0] == i            # exactness spot check
    store_gb = n * DIM * 4 / 1e9
    print(f"streamed search @ {n:,} f32 rows ({store_gb:.2f} GB "
          f"host store, {g._slab_rows():,}-row slabs): "
          f"e2e p50 {pct(ts, 50):.1f} s/search on this tunnel; "
          f"directly-attached projection ~{store_gb / 100:.3f} s "
          f"transfer (100 GB/s DMA) + ~{store_gb / 819 * 1e3:.1f} ms "
          f"MXU/HBM compute", flush=True)
    del g
    gc.collect()


def bench_sharded(rows: np.ndarray, dtype: str):
    """DistributedGallery on the REAL mesh (one device on this image):
    grounds the mesh-store latency claims in hardware. The per-shard
    search is the same one-dispatch shard_map program any slice runs —
    shards read in parallel and the candidate merge moves kilobytes —
    so the measured per-shard device ms IS the slice's identify time
    at the same per-shard fill (the n_dev x capacity claim)."""
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.serving.distributed_gallery import (
        DistributedGallery,
        _dist_search_fn,
    )
    from tf_face_toolbox_tpu.serving.gallery import _quantize_rows
    from tf_face_toolbox_tpu.utils.profiling import chained_seconds_per_call

    import jax

    n = rows.shape[0]
    g = DistributedGallery(DIM, dtype=dtype, hbm_limit_gb=12.0)
    if jax.default_backend() != "tpu":
        g.use_pallas = False    # the interpreter is ~1000x slow; this
                                # leg's numbers only mean anything on
                                # TPU anyway (CPU run = smoke test)
    t0 = time.perf_counter()
    g.enroll(rows, np.arange(n))
    g.search(rows[:1], k=1)
    bulk_s = time.perf_counter() - t0

    g.enroll(rows[:30], n + np.arange(30))
    remove_ts = []
    for i in range(30):
        t0 = time.perf_counter()
        assert g.remove(n + i) == 1
        remove_ts.append(time.perf_counter() - t0)

    out = dict(rows=n, dtype=dtype, n_dev=g.n_dev, bulk_load_s=bulk_s,
               remove_p50_ms=pct(remove_ts, 50) * 1e3,
               remove_p99_ms=pct(remove_ts, 99) * 1e3)
    with g._gate.read():
        dev, ds, db, nn = g._dev, g._dev_scale, g._dev_bias, g._n
    local_cap = dev.shape[0] // g.n_dev
    nv = jnp.asarray([nn], np.int32)
    for b in (1, 64):
        probes = rows[:b]
        for _ in range(3):
            g.search(probes, k=5)
        ts = []
        for _ in range(30):
            t0 = time.perf_counter()
            g.search(probes, k=5)
            ts.append(time.perf_counter() - t0)
        use_pl = g._pallas_ok(local_cap, b)
        if dtype == "int8":
            kc = 5 * g.rescore_expand
            fn = _dist_search_fn(g.mesh, g.data_axis, g.n_dev,
                                 min(kc, local_cap), kc, True, use_pl,
                                 False)
            pq, ps = _quantize_rows(probes)

            def call(p, p_s, dv, sc, bs, nn_):
                s, i = fn(dv, sc, bs, p, p_s, nn_)
                return s, i.astype(jnp.float32)

            dev_ms = chained_seconds_per_call(
                call, jnp.asarray(pq), jnp.asarray(ps), dev, ds, db,
                nv) * 1e3
        else:
            fn = _dist_search_fn(g.mesh, g.data_axis, g.n_dev,
                                 min(5, local_cap), 5, False, use_pl,
                                 False)
            dummy = jnp.zeros((1,), np.float32)

            def call(p, dv, bs, nn_):
                s, i = fn(dv, dummy, bs, p, dummy, nn_)
                return s, i.astype(jnp.float32)

            dev_ms = chained_seconds_per_call(
                call, jnp.asarray(probes), dev, db, nv) * 1e3
        out[f"search{b}_p50_ms"] = pct(ts, 50) * 1e3
        out[f"search{b}_dev_ms"] = dev_ms
        out[f"search{b}_pallas"] = bool(use_pl)
    print(f"sharded {dtype} @ {n:,} rows x {g.n_dev} dev "
          f"(per-shard fill {nn // g.n_dev:,}): bulk {bulk_s:.1f}s, "
          f"deenroll p50/p99 {out['remove_p50_ms']:.1f}/"
          f"{out['remove_p99_ms']:.1f} ms, identify B=1 "
          f"{out['search1_p50_ms']:.1f} e2e / "
          f"{out['search1_dev_ms']:.2f} dev ms (pallas="
          f"{out['search1_pallas']}), B=64 "
          f"{out['search64_p50_ms']:.1f} e2e / "
          f"{out['search64_dev_ms']:.2f} dev ms (pallas="
          f"{out['search64_pallas']})", flush=True)
    del g
    gc.collect()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="100000,1000000,10000000")
    ap.add_argument("--stream_rows", type=int, default=0,
                    help="also bench overflow='stream' at this many "
                         "f32 rows (0 = skip)")
    ap.add_argument("--dtypes", default="float32,bfloat16,int8",
                    help="store dtypes to sweep")
    ap.add_argument("--sharded_rows", type=int, default=0,
                    help="also bench DistributedGallery on the real "
                         "mesh at this many rows (0 = skip)")
    ap.add_argument("--skip_gates", action="store_true",
                    help="skip the dtype/int8 agreement gates (rerun "
                         "of a single measured leg)")
    args = ap.parse_args()
    sizes = [int(s) for s in args.rows.split(",") if s and int(s) > 0]

    biggest = max(sizes + [args.stream_rows, args.sharded_rows])
    print(f"generating {biggest:,} x {DIM} rows ...", flush=True)
    all_rows = make_rows(biggest)

    if args.skip_gates:
        for n in sizes:
            for dtype in args.dtypes.split(","):
                r = bench_config(all_rows[:n], dtype, hbm_limit_gb=12.0)
                print(r, flush=True)
        if args.sharded_rows:
            for dtype in args.dtypes.split(","):
                bench_sharded(all_rows[:args.sharded_rows], dtype)
        return

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

    # int8 two-stage gate: labels must agree with exact host search
    # (final scores ARE exact f32 — rescored — so compare recall)
    g8 = DeviceGallery(DIM, dtype="int8")
    g8.enroll(sub, np.arange(sub.shape[0]))
    l8, s8 = g8.search(sub[:256], k=5)
    exact = sub[:256] @ sub.T
    etop = np.argsort(-exact, axis=1)[:, :5]
    top1 = float((l8[:, 0] == etop[:, 0]).mean())
    rec5 = float(np.mean([len(set(a) & set(b)) / 5.0
                          for a, b in zip(l8, etop)]))
    print(f"int8-vs-exact @100k: top1 agreement {top1:.4f}, "
          f"recall@5 {rec5:.4f}, self-score "
          f"{float(s8[0, 0]):.6f}", flush=True)
    del g8
    gc.collect()

    results = []
    for n in sizes:
        for dtype in args.dtypes.split(","):
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

    if args.stream_rows:
        bench_stream(all_rows[:args.stream_rows])

    if args.sharded_rows:
        for dtype in args.dtypes.split(","):
            bench_sharded(all_rows[:args.sharded_rows], dtype)

    # loud refusal demo: limit = exactly one block's footprint, so the
    # block-boundary crossing refuses (same bound that protects a full
    # 8 GB store, scaled down to keep the demo instant)
    one_block_gb = 1024 * DIM * 4 / 1e9
    g = DeviceGallery(DIM, dtype="float32", hbm_limit_gb=one_block_gb)
    g.enroll(all_rows[:1024], np.arange(1024))
    try:
        g.enroll(all_rows[:1], [1024])
        print("ERROR: expected GalleryCapacityError", flush=True)
    except GalleryCapacityError as e:
        print(f"capacity refusal OK: {e}", flush=True)

    print("\n| rows | dtype | HBM GB | bulk load s | enroll p50/p99 ms "
          "| deenroll p50/p99 ms "
          "| identify B=1 p50 e2e / device ms "
          "| identify B=64 p50 e2e / device ms |")
    print("|---|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['rows']:,} | {r['dtype']} | {r['device_gb']:.2f} "
              f"| {r['bulk_load_s']:.1f} "
              f"| {r['enroll_p50_ms']:.1f} / {r['enroll_p99_ms']:.1f} "
              f"| {r['remove_p50_ms']:.1f} / {r['remove_p99_ms']:.1f} "
              f"| {r['search1_p50_ms']:.1f} / {r['search1_dev_ms']:.2f} "
              f"| {r['search64_p50_ms']:.1f} / {r['search64_dev_ms']:.2f} |")


if __name__ == "__main__":
    main()
