"""Clustering scale proof (VERDICT r4 #6): measured 10^6 AND 10^7.

Synthesizes a ground-truth-labeled embedding set (N/10 identities x 10
faces each: unit templates + sigma=0.01 noise, renormalized — same-id
cosine ~0.95, cross-id ~0 +/- 1/sqrt(512)), runs
ops/clustering.cluster_embeddings at threshold 0.6 / k=10 on the
attached TPU, and reports:

- kNN-graph wall time (the TPU half: bulk enroll + self-search through
  the fused Pallas top-k kernel) and the host connected-components /
  canonicalization time,
- exact-recovery check: n_clusters == n_identities, zero noise rows,
- sampled purity: 1000 random identities, every one of their 10 faces
  in ONE cluster of size exactly 10.

The store stays DEVICE-RESIDENT at both scales (bf16 10^7 x 512 =
10.24 GB < the 12 GB bound gallery_bench uses) — a 10^7-row
streamed-overflow self-search would re-stream the whole store once
per probe batch (4883 x 10.24 GB), which no hardware should be asked
to do; past ~1.2e7 bf16 rows the honest path is the int8 store (4x
capacity) and past THAT, sharded cli.search.

    python tools/cluster_bench.py --rows 1000000
    python tools/cluster_bench.py --rows 10000000   # ~30-40 min on
                                                    # this tunnel
Results go to docs/design.md's clustering paragraph.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

DIM = 512
PER_ID = 10
SIGMA = 0.01


def make_embeddings(n_rows: int, seed: int = 0) -> np.ndarray:
    """(n_rows, 512) f32 unit rows; row r belongs to identity r //
    PER_ID. Chunked: the f64 transient of a one-shot 10^7 x 512
    standard_normal would be 41 GB."""
    n_ids = n_rows // PER_ID
    rng = np.random.default_rng(seed)
    out = np.empty((n_rows, DIM), np.float32)
    chunk_ids = 1 << 16
    for i0 in range(0, n_ids, chunk_ids):
        i1 = min(i0 + chunk_ids, n_ids)
        t = rng.standard_normal((i1 - i0, DIM), dtype=np.float32)
        t /= np.linalg.norm(t, axis=1, keepdims=True)
        faces = (np.repeat(t, PER_ID, axis=0)
                 + SIGMA * rng.standard_normal(
                     ((i1 - i0) * PER_ID, DIM), dtype=np.float32))
        faces /= np.linalg.norm(faces, axis=1, keepdims=True)
        out[i0 * PER_ID:i1 * PER_ID] = faces
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--threshold", type=float, default=0.6)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--store_dtype", default="bfloat16")
    ap.add_argument("--hbm_gb", type=float, default=12.0)
    ap.add_argument("--purity_sample", type=int, default=1000)
    args = ap.parse_args()

    n_ids = args.rows // PER_ID
    print(f"synthesizing {args.rows:,} x {DIM} rows "
          f"({n_ids:,} identities x {PER_ID}) ...", flush=True)
    t0 = time.perf_counter()
    emb = make_embeddings(args.rows)
    print(f"  {time.perf_counter() - t0:.0f}s", flush=True)

    from tf_face_toolbox_tpu.ops.clustering import (
        cluster_embeddings,
        knn_graph,
    )

    t0 = time.perf_counter()
    idx, sims = knn_graph(emb, k=args.k, batch=args.batch,
                          store_dtype=args.store_dtype,
                          hbm_limit_gb=args.hbm_gb)
    knn_s = time.perf_counter() - t0
    print(f"kNN graph: {knn_s:.0f}s wall "
          f"({args.rows / knn_s:,.0f} probes/s e2e)", flush=True)

    # reuse the graph for the clustering half by monkey-free re-run of
    # just the host stage (mirrors cluster_embeddings' tail exactly)
    import scipy.sparse as sp

    t0 = time.perf_counter()
    src = np.repeat(np.arange(args.rows, dtype=np.int64), idx.shape[1])
    dst = idx.reshape(-1)
    keep = sims.reshape(-1) >= args.threshold
    src, dst = src[keep], dst[keep]
    graph = sp.coo_matrix(
        (np.ones(src.shape[0], np.int8), (src, dst)),
        shape=(args.rows, args.rows))
    _, comp = sp.csgraph.connected_components(graph, directed=False)
    comp = comp.astype(np.int64)
    uniq, inv = np.unique(comp, return_inverse=True)
    host_s = time.perf_counter() - t0
    n_clusters = int(uniq.shape[0])
    print(f"connected components + canonicalize: {host_s:.0f}s host",
          flush=True)

    ok = n_clusters == n_ids
    print(f"clusters {n_clusters:,} vs identities {n_ids:,} -> "
          f"{'EXACT' if ok else 'MISMATCH'}", flush=True)

    sizes = np.bincount(inv)
    frag = int((sizes != PER_ID).sum())
    print(f"components not of size {PER_ID}: {frag} "
          f"({'zero fragmentation/merge' if frag == 0 else 'CHECK'})",
          flush=True)

    rng = np.random.default_rng(7)
    pure = 0
    sample = rng.choice(n_ids, min(args.purity_sample, n_ids),
                        replace=False)
    for ident in sample:
        rows = np.arange(ident * PER_ID, (ident + 1) * PER_ID)
        labs = np.unique(inv[rows])
        if len(labs) == 1 and sizes[labs[0]] == PER_ID:
            pure += 1
    print(f"sampled purity: {pure}/{len(sample)} identities exactly "
          f"one pure size-{PER_ID} cluster", flush=True)

    # end-to-end through the public API at a subset size as a gate
    # that the tool path (not just the pieces) agrees
    sub = emb[:PER_ID * 1000]
    labels, nc = cluster_embeddings(sub, threshold=args.threshold,
                                    k=args.k, batch=args.batch,
                                    store_dtype=args.store_dtype,
                                    hbm_limit_gb=args.hbm_gb)
    assert nc == 1000 and (labels >= 0).all(), (nc, int((labels < 0).sum()))
    print("cluster_embeddings public-API spot check @10k rows: OK",
          flush=True)

    print(f"\nSUMMARY rows={args.rows:,} ids={n_ids:,} "
          f"store={args.store_dtype} knn_wall_s={knn_s:.0f} "
          f"host_s={host_s:.0f} clusters={n_clusters:,} "
          f"fragmentation={frag} purity={pure}/{len(sample)}",
          flush=True)


if __name__ == "__main__":
    main()
