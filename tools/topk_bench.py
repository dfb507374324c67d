"""Pallas top-k kernel micro-bench: device-generated 10^7-row store.

`tools/gallery_bench.py` measures the full serving store, but pays a
~11-minute tunnel upload per 10^7-row leg.  This tool generates the
store ON DEVICE (random unit rows — statistically identical gating
behavior to the gallery bench's host-generated rows, and probes are
store members so self-match bars are the same), so a kernel iteration
measures in ~2 minutes:

- chained device ms + effective GB/s for the Pallas kernel and the
  XLA full-sims program, bf16 and int8 stores, B in {1, 64},
- index parity kernel-vs-XLA at full scale on real hardware (the CPU
  interpreter tests cover semantics; this covers the Mosaic lowering).

    python tools/topk_bench.py [--rows 10000000] [--parity]
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("TFFT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TFFT_PLATFORM"])

DIM = 512
CHUNK = 1 << 19     # rows generated per fill step (1 GB f32 transient)


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("chunk",))
def _fill_bf16(store, key, off, *, chunk):
    x = jax.random.normal(key, (chunk, DIM), jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    return jax.lax.dynamic_update_slice(
        store, x.astype(store.dtype), (off, 0))


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("chunk",))
def _fill_int8(store, scales, key, off, *, chunk):
    x = jax.random.normal(key, (chunk, DIM), jnp.float32)
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    s = jnp.max(jnp.abs(x), axis=1) / 127.0
    q = jnp.round(x / s[:, None]).astype(jnp.int8)
    return (jax.lax.dynamic_update_slice(store, q, (off, 0)),
            jax.lax.dynamic_update_slice(scales, s, (off,)))


def make_store(cap: int, dtype: str):
    """Device-resident (cap, DIM) store of unit rows; int8 also
    returns the (cap,) per-row scales (peak HBM = store + 1 GB)."""
    key = jax.random.PRNGKey(0)
    chunk = min(CHUNK, cap)     # small --rows: one sub-CHUNK fill
    if dtype == "int8":
        store = jnp.zeros((cap, DIM), jnp.int8)
        scales = jnp.full((cap,), 1.0 / 127.0, jnp.float32)
        for off in range(0, cap, chunk):
            key, k2 = jax.random.split(key)
            store, scales = _fill_int8(store, scales, k2,
                                       min(off, cap - chunk),
                                       chunk=chunk)
        return store, scales
    store = jnp.zeros((cap, DIM),
                      jnp.bfloat16 if dtype == "bfloat16"
                      else jnp.float32)
    for off in range(0, cap, chunk):
        key, k2 = jax.random.split(key)
        store = _fill_bf16(store, k2, min(off, cap - chunk),
                           chunk=chunk)
    return store, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dtypes", default="bfloat16,int8")
    ap.add_argument("--batches", default="1,64")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--rescore_expand", type=int, default=4,
                    help="int8 coarse keeps k*this candidates "
                         "(matches DeviceGallery's default)")
    ap.add_argument("--parity", action="store_true",
                    help="also check kernel-vs-XLA index parity at "
                         "full scale (adds the XLA program's memory)")
    ap.add_argument("--xla", action="store_true",
                    help="also time the XLA full-sims program")
    args = ap.parse_args()

    from tf_face_toolbox_tpu.ops.pallas_topk import (
        cosine_topk_impl,
        cosine_topk_q_impl,
    )
    from tf_face_toolbox_tpu.serving.gallery import (
        _quantize_rows,
        _search_fn,
        _search_q_fn,
    )
    from tf_face_toolbox_tpu.utils.profiling import chained_seconds_per_call

    n = args.rows
    cap = -(-n // 1024) * 1024
    batches = [int(b) for b in args.batches.split(",")]

    for dtype in args.dtypes.split(","):
        t0 = time.perf_counter()
        store, scales = make_store(cap, dtype)
        jax.block_until_ready(store)
        gb = (store.size * store.dtype.itemsize
              + (scales.size * 4 if scales is not None else 0)) / 1e9
        print(f"{dtype} store: {n:,} rows / {gb:.2f} GB built on "
              f"device in {time.perf_counter() - t0:.1f}s", flush=True)
        bias = jnp.zeros((cap,), jnp.float32)
        kq = args.k * args.rescore_expand
        # probes are store members (self-match bars, like the gallery
        # bench); int8 probes quantize from the dequantized row
        pf = np.asarray(store[:max(batches)], np.float32)
        if dtype == "int8":
            pf = pf * np.asarray(scales[:max(batches)])[:, None]
        pq, ps = _quantize_rows(pf)

        for b in batches:
            if dtype == "int8":
                def call(p, p_s, dv, sc, bs, nn):
                    s, i = cosine_topk_q_impl(dv, sc, p, p_s, nn, kq,
                                              bias=bs)
                    return s, i.astype(jnp.float32)

                ms = chained_seconds_per_call(
                    call, jnp.asarray(pq[:b]), jnp.asarray(ps[:b]),
                    store, scales, bias, jnp.int32(n)) * 1e3
            else:
                def call(p, dv, bs, nn):
                    s, i = cosine_topk_impl(dv, p, nn, args.k, bias=bs)
                    return s, i.astype(jnp.float32)

                ms = chained_seconds_per_call(
                    call, jnp.asarray(pf[:b]), store, bias,
                    jnp.int32(n)) * 1e3
            print(f"  pallas {dtype} B={b}: {ms:.2f} ms "
                  f"({gb / ms * 1e3:.0f} GB/s)", flush=True)
            if args.xla:
                if dtype == "int8":
                    fn = _search_q_fn(kq)

                    def xcall(p, p_s, dv, sc, bs, nn):
                        s, i = fn(dv, sc, bs, p, p_s, nn)
                        return s, i.astype(jnp.float32)

                    xms = chained_seconds_per_call(
                        xcall, jnp.asarray(pq[:b]),
                        jnp.asarray(ps[:b]), store, scales, bias,
                        jnp.int32(n)) * 1e3
                else:
                    fn = _search_fn(args.k)

                    def xcall(p, dv, bs, nn):
                        s, i = fn(dv, bs, p, nn)
                        return s, i.astype(jnp.float32)

                    xms = chained_seconds_per_call(
                        xcall, jnp.asarray(pf[:b]), store, bias,
                        jnp.int32(n)) * 1e3
                print(f"  xla    {dtype} B={b}: {xms:.2f} ms "
                      f"({gb / xms * 1e3:.0f} GB/s)", flush=True)

        if args.parity:
            b = max(batches)
            if dtype == "int8":
                s, i = cosine_topk_q_impl(store, scales,
                                          jnp.asarray(pq[:b]),
                                          jnp.asarray(ps[:b]),
                                          jnp.int32(n), kq, bias=bias)
                rs, ri = _search_q_fn(kq)(store, scales, bias,
                                          jnp.asarray(pq[:b]),
                                          jnp.asarray(ps[:b]),
                                          jnp.int32(n))
            else:
                s, i = cosine_topk_impl(store, jnp.asarray(pf[:b]),
                                        jnp.int32(n), args.k,
                                        bias=bias)
                rs, ri = _search_fn(args.k)(store, bias,
                                            jnp.asarray(pf[:b]),
                                            jnp.int32(n))
            eq = np.array_equal(np.asarray(i), np.asarray(ri))
            ds = float(np.abs(np.asarray(s) - np.asarray(rs)).max())
            print(f"  parity {dtype} B={b} vs XLA: indices "
                  f"{'EQUAL' if eq else 'MISMATCH'}, "
                  f"max |score delta| {ds:.2e}", flush=True)
            if not eq:
                sys.exit(1)
        del store, scales, bias
        import gc
        gc.collect()


if __name__ == "__main__":
    main()
