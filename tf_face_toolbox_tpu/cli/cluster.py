"""Cluster embeddings for dataset cleaning / identity dedup.

    python -m tf_face_toolbox_tpu.cli.cluster \
        --embeddings=emb.npy --output=labels.npy \
        --threshold=0.6 --k=10 [--min_size=2] [--names=list.txt]

The embedding-space half of the MS1M-era label-cleaning workflow
(ops/clustering.py): TPU kNN graph through the fused top-k kernel,
host connected components. Writes an int64 label per row (-1 =
noise below --min_size) and prints the cluster-size histogram.
With --names (the pack list file the embeddings were extracted
from), also writes ``<output>.clusters.txt`` — one line per cluster:
``<cluster_id> <path> <path> ...`` — ready to diff against the
original labels.
"""

import json

import numpy as np
from absl import app, flags, logging

from tf_face_toolbox_tpu.cli import setup_platform

FLAGS = flags.FLAGS

flags.DEFINE_string("embeddings", "", "input .npy (N, D), L2-normalized"
                    " (cli.extract output)")
flags.DEFINE_string("output", "", "output .npy of int64 labels (N,)")
flags.DEFINE_float("threshold", 0.6,
                   "cosine linkage threshold (calibrate on a labeled "
                   "split; 0.5-0.7 typical for margin-softmax nets)")
flags.DEFINE_integer("k", 10, "neighbors per row in the kNN graph")
flags.DEFINE_integer("min_size", 1,
                     "components smaller than this become -1 (noise)")
flags.DEFINE_integer("batch", 2048, "probe batch for the kNN search")
flags.DEFINE_enum("store_dtype", "bfloat16",
                  ["float32", "bfloat16", "int8"],
                  "device store dtype for the kNN search")
flags.DEFINE_float("hbm_gb", 8.0,
                   "device-store budget; larger sets stream exactly")
flags.DEFINE_string("names", "",
                    "optional pack list file (path label per line) "
                    "aligned with the embedding rows; enables "
                    "<output>.clusters.txt")


def main(argv):
    del argv
    setup_platform()
    if not FLAGS.embeddings or not FLAGS.output:
        raise SystemExit("--embeddings and --output are required")
    from tf_face_toolbox_tpu.ops.clustering import cluster_embeddings

    emb = np.load(FLAGS.embeddings)
    labels, n_clusters = cluster_embeddings(
        emb, threshold=FLAGS.threshold, k=FLAGS.k, batch=FLAGS.batch,
        store_dtype=FLAGS.store_dtype, hbm_limit_gb=FLAGS.hbm_gb,
        min_size=FLAGS.min_size)
    np.save(FLAGS.output, labels)

    sizes = np.bincount(labels[labels >= 0]) if n_clusters else \
        np.zeros(0, np.int64)
    noise = int((labels == -1).sum())
    report = {
        "rows": int(emb.shape[0]),
        "clusters": int(n_clusters),
        "noise_rows": noise,
        "largest": int(sizes.max()) if sizes.size else 0,
        "singletons": int((sizes == 1).sum()) if sizes.size else 0,
        "threshold": FLAGS.threshold,
        "k": FLAGS.k,
    }
    print(json.dumps(report))

    if FLAGS.names:
        paths = [ln.split()[0] for ln in open(FLAGS.names)
                 if ln.strip()]
        if len(paths) != emb.shape[0]:
            raise SystemExit(
                f"--names has {len(paths)} rows, embeddings have "
                f"{emb.shape[0]}")
        out = FLAGS.output + ".clusters.txt"
        # one stable argsort + boundary split: O(N log N), not a full
        # N-scan per cluster (10^5 clusters x 10^6 rows would be 10^11
        # comparisons)
        order = np.argsort(labels, kind="stable")
        order = order[labels[order] >= 0]
        bounds = np.flatnonzero(np.diff(labels[order])) + 1
        with open(out, "w") as f:
            for grp in (np.split(order, bounds) if order.size else ()):
                f.write(f"{labels[grp[0]]} "
                        + " ".join(paths[i] for i in grp) + "\n")
        logging.info("cluster membership -> %s", out)


if __name__ == "__main__":
    app.run(main)
