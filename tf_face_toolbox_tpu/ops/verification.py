"""LFW-style pair verification: batched cosine similarity + 10-fold protocol.

Rebuilds the reference's offline eval (ref: upstream eval.py / external
scripts [UPSTREAM-K LOW]; protocol itself is the standard LFW 6000-pair,
10-fold cross-validated threshold accuracy — SURVEY.md §3.3).

TPU-first: per-pair cosine similarity is ONE batched dot product
(embeddings are pre-L2-normalized, so cosine == dot), evaluated on
device in a single fused reduction instead of a Python pair loop
(BASELINE.json north_star: "pairwise verification ... becomes batched
cosine-similarity matmuls on-device").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tf_face_toolbox_tpu.models.layers import l2_normalize


@jax.jit
def cosine_similarity(emb1: jax.Array, emb2: jax.Array) -> jax.Array:
    """Row-wise cosine similarity of two (P, D) embedding batches."""
    e1 = l2_normalize(emb1.astype(jnp.float32))
    e2 = l2_normalize(emb2.astype(jnp.float32))
    return jnp.sum(e1 * e2, axis=-1)


@jax.jit
def similarity_matrix(gallery: jax.Array, probe: jax.Array) -> jax.Array:
    """All-pairs cosine matrix (G, P): one matmul on the MXU.

    Used for identification-style eval and threshold sweeps.
    """
    g = l2_normalize(gallery.astype(jnp.float32))
    p = l2_normalize(probe.astype(jnp.float32))
    return jnp.dot(g, p.T, preferred_element_type=jnp.float32)


def _accuracy_curve(sims: np.ndarray, labels: np.ndarray,
                    thresholds: np.ndarray) -> np.ndarray:
    """Accuracy at every threshold, vectorized: (T,) from (P,) sims."""
    # (T, P) boolean predictions → mean match with labels along P.
    preds = sims[None, :] >= thresholds[:, None]
    return (preds == labels[None, :].astype(bool)).mean(axis=1)


def verify_folds(sims: np.ndarray, labels: np.ndarray, *, n_folds: int = 10,
                 thresholds: np.ndarray | None = None) -> dict:
    """Standard LFW k-fold protocol (SURVEY.md §3.3).

    For each fold: pick the best threshold on the other k-1 folds, report
    accuracy on the held-out fold. Returns mean/std accuracy and the
    per-fold numbers. ``sims``/``labels`` are (P,) arrays; pairs must be
    ordered so folds are contiguous chunks (standard LFW layout).
    """
    sims = np.asarray(sims, np.float64)
    labels = np.asarray(labels).astype(bool)
    if thresholds is None:
        thresholds = np.arange(-1.0, 1.0001, 0.0025)
    n = len(sims)
    if n % n_folds:
        raise ValueError(f"{n} pairs not divisible into {n_folds} folds")
    fold = n // n_folds
    # Degenerate-fold guard: the LFW protocol assumes every fold mixes
    # same- and diff-pairs (the official pairs.txt interleaves them). A
    # single-class fold yields meaningless thresholds — warn loudly.
    for k in range(n_folds):
        chunk = labels[k * fold:(k + 1) * fold]
        if chunk.all() or not chunk.any():
            import warnings
            warnings.warn(
                f"fold {k} contains only {'positive' if chunk.all() else 'negative'}"
                " pairs; interleave the pairs file for meaningful folds",
                stacklevel=2)
            break
    accs, thrs = [], []
    for k in range(n_folds):
        test = np.zeros(n, bool)
        test[k * fold:(k + 1) * fold] = True
        train_acc = _accuracy_curve(sims[~test], labels[~test], thresholds)
        best = thresholds[int(np.argmax(train_acc))]
        test_acc = float(
            ((sims[test] >= best) == labels[test]).mean())
        accs.append(test_acc)
        thrs.append(float(best))
    accs = np.asarray(accs)
    return {
        "accuracy_mean": float(accs.mean()),
        "accuracy_std": float(accs.std()),
        "fold_accuracies": accs.tolist(),
        "fold_thresholds": thrs,
    }


def tar_at_far(sims: np.ndarray, labels: np.ndarray,
               fars=(1e-1, 1e-2, 1e-3)) -> dict:
    """True-accept rate at fixed false-accept rates (the IJB-style
    operating-point metric that complements the LFW fold accuracy).

    The threshold for each target FAR is the tightest one the negative
    pairs support: with k = floor(FAR·N_neg) impostors allowed,
    threshold = the (k+1)-th highest negative score, and acceptance is
    STRICTLY above it — so at most k negatives pass (achieved
    FAR ≤ target). TAR = fraction of positives above the threshold.
    FARs finer than 1/N_neg are reported as NaN rather than
    extrapolated.
    """
    sims = np.asarray(sims, np.float64)
    labels = np.asarray(labels).astype(bool)
    pos = np.sort(sims[labels])
    neg = np.sort(sims[~labels])[::-1]      # descending
    out = {}
    for far in fars:
        key = f"tar@far={far:g}"
        k = int(np.floor(far * len(neg)))   # impostors we may accept
        if len(neg) == 0 or len(pos) == 0 or (k == 0 and far > 0
                                              and 1 / len(neg) > far):
            out[key] = float("nan")         # FAR finer than resolution
            continue
        # strictly above the (k+1)-th negative ⇒ ≤ k false accepts
        thr = neg[k] if k < len(neg) else -np.inf
        accepted = pos > thr
        out[key] = float(accepted.mean())
        out[key.replace("tar@", "thr@")] = float(thr)
    return out


def cohort_stats(embeddings: np.ndarray, cohort: np.ndarray, *,
                 top: int = 0, batch: int = 4096
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Per-embedding (mean, std) of its cosines against an impostor
    cohort — the z-/t-norm statistics of score normalization.

    ``top`` > 0: the ADAPTIVE variant (the face-recognition standard) —
    statistics over only each embedding's ``top`` highest cohort
    scores, which tracks the relevant impostor neighborhood instead of
    the whole cohort's bulk. Returns ``(mu (N,), sigma (N,))``; sigma
    is floored at 1e-6 so downstream division is safe.
    """
    cohort = np.asarray(cohort, np.float32)
    if top < 0 or top > cohort.shape[0]:
        raise ValueError(f"top={top} outside [0, cohort="
                         f"{cohort.shape[0]}]")
    c = jax.device_put(jnp.asarray(cohort))

    @jax.jit
    def chunk(c, e):
        sims = similarity_matrix(c, e).T          # (B, C)
        if top:
            sims, _ = jax.lax.top_k(sims, top)
        mu = jnp.mean(sims, axis=-1)
        sd = jnp.std(sims, axis=-1)
        return mu, sd

    mus, sds = [], []
    embeddings = np.asarray(embeddings)
    for i in range(0, embeddings.shape[0], batch):
        mu, sd = chunk(c, jnp.asarray(embeddings[i:i + batch],
                                      jnp.float32))
        mus.append(np.asarray(mu))
        sds.append(np.asarray(sd))
    if not mus:
        raise ValueError("empty embedding set")
    return np.concatenate(mus), np.maximum(np.concatenate(sds), 1e-6)


def _snorm(sims, probe_stats, gallery_stats):
    """S-norm: ½(z-norm + t-norm) of a (B, G) score block (traced)."""
    mu_p, sd_p = probe_stats
    mu_g, sd_g = gallery_stats
    return 0.5 * ((sims - mu_p[:, None]) / sd_p[:, None]
                  + (sims - mu_g[None, :]) / sd_g[None, :])


def top_k_matches(gallery: np.ndarray, probe: np.ndarray, *,
                  k: int = 5, batch: int = 4096,
                  probe_stats=None, gallery_stats=None,
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Open-set 1:N search: the top-``k`` gallery rows per probe by
    cosine. Returns ``(indices (P, k) int32, scores (P, k) f32)``,
    scores descending per row.

    The gallery stays device-resident across probe batches (passed as
    an argument, never a jit closure constant — one compiled executable
    serves every batch) and ranking is ``lax.top_k`` on device, so
    million-entry galleries stream through without a host argsort.

    ``probe_stats``/``gallery_stats``: optional ``(mu, sigma)`` pairs
    from :func:`cohort_stats` — scores become adaptive s-norm
    (½(z+t)-normalized) BEFORE ranking, so the gallery-side term can
    rerank and open-set thresholds calibrate across probes. Pass both
    or neither.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if (probe_stats is None) != (gallery_stats is None):
        raise ValueError("s-norm needs BOTH probe_stats and "
                         "gallery_stats (or neither)")
    gallery = np.asarray(gallery)
    if k > gallery.shape[0]:
        raise ValueError(f"k={k} exceeds gallery size {gallery.shape[0]}")
    g = jax.device_put(jnp.asarray(gallery, jnp.float32))
    use_norm = probe_stats is not None
    g_stats = (jax.device_put(jnp.asarray(gallery_stats[0], jnp.float32)),
               jax.device_put(jnp.asarray(gallery_stats[1], jnp.float32))
               ) if use_norm else None

    @jax.jit
    def chunk(g, p, pst, gst):
        sims = similarity_matrix(g, p).T        # (B, G)
        if use_norm:
            sims = _snorm(sims, pst, gst)
        return jax.lax.top_k(sims, k)

    scores, indices = [], []
    probe = np.asarray(probe)
    for i in range(0, probe.shape[0], batch):
        pst = ((jnp.asarray(probe_stats[0][i:i + batch], jnp.float32),
                jnp.asarray(probe_stats[1][i:i + batch], jnp.float32))
               if use_norm else (jnp.zeros(()), jnp.zeros(())))
        s, ix = chunk(g, jnp.asarray(probe[i:i + batch], jnp.float32),
                      pst, g_stats if use_norm
                      else (jnp.zeros(()), jnp.zeros(())))
        scores.append(np.asarray(s))
        indices.append(np.asarray(ix, np.int32))
    if not scores:
        raise ValueError("empty probe set")
    return np.concatenate(indices), np.concatenate(scores)


def sharded_top_k_matches(gallery: np.ndarray, probe: np.ndarray, *,
                          k: int, mesh, batch: int = 4096,
                          probe_stats=None, gallery_stats=None,
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Gallery-sharded 1:N search over a device mesh.

    The distributed-serving counterpart of :func:`top_k_matches` for
    galleries too large for one chip's HBM: rows shard over the mesh's
    ``data`` axis, each device ranks its shard with ``lax.top_k``
    (probes replicate — they are k·10³ of bytes against the gallery's
    10⁹), the per-shard candidates ride ICI once via an all-gather of
    (n_dev · k) rows, and a final on-device top-k merges them. Exactly
    equal to the single-device ranking (modulo tie order at equal
    scores; scores themselves are exact).

    Returns ``(indices (P, k) int32, scores (P, k) f32)`` in GLOBAL
    gallery row numbering.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from tf_face_toolbox_tpu.parallel.mesh import DATA_AXIS

    gallery = np.asarray(gallery, np.float32)
    probe = np.asarray(probe, np.float32)
    if (probe_stats is None) != (gallery_stats is None):
        raise ValueError("s-norm needs BOTH probe_stats and "
                         "gallery_stats (or neither)")
    use_norm = probe_stats is not None
    n_dev = mesh.shape[DATA_AXIS]
    g_rows = gallery.shape[0]
    if k < 1 or k > g_rows:
        raise ValueError(f"k={k} outside [1, gallery={g_rows}]")
    pad = -g_rows % n_dev
    if pad:
        # padded rows get similarity −2 (below any cosine): they can
        # never displace a real candidate even when k > shard size
        gallery = np.concatenate(
            [gallery, np.zeros((pad, gallery.shape[1]), np.float32)])
    if use_norm:
        # stats shard WITH their gallery rows; pads get (0, 1) — their
        # sims are forced to −2 afterwards so values are irrelevant
        mu_g = np.concatenate([np.asarray(gallery_stats[0], np.float32),
                               np.zeros(pad, np.float32)])
        sd_g = np.concatenate([np.asarray(gallery_stats[1], np.float32),
                               np.ones(pad, np.float32)])
    shard_rows = gallery.shape[0] // n_dev
    k_local = min(k, shard_rows)
    g_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    v_sharding = NamedSharding(mesh, P(DATA_AXIS))
    g_dev = jax.device_put(jnp.asarray(gallery), g_sharding)
    gst_dev = ((jax.device_put(jnp.asarray(mu_g), v_sharding),
                jax.device_put(jnp.asarray(sd_g), v_sharding))
               if use_norm else
               (jnp.zeros(()), jnp.zeros(())))

    @jax.jit
    def chunk(g, p, gst, pst):
        def local(g_shard, p_rep, mu_gs, sd_gs, mu_p, sd_p):
            idx0 = jax.lax.axis_index(DATA_AXIS) * shard_rows
            gs = l2_normalize(g_shard)
            ps = l2_normalize(p_rep)
            sims = jnp.dot(ps, gs.T,
                           preferred_element_type=jnp.float32)
            if use_norm:
                sims = _snorm(sims, (mu_p, sd_p), (mu_gs, sd_gs))
            row = idx0 + jnp.arange(shard_rows)
            sims = jnp.where(row[None, :] < g_rows, sims, -2e9)
            s, ix = jax.lax.top_k(sims, k_local)      # (B, k_local)
            return s, (ix + idx0).astype(jnp.int32)

        gs_spec = P(DATA_AXIS) if use_norm else P()
        s, ix = shard_map(
            local, mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(), gs_spec,
                      gs_spec, P(), P()),
            out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)),
        )(g, p, gst[0], gst[1], pst[0], pst[1])
        # merged candidate set (B, n_dev·k_local) is replicated; the
        # final top-k is tiny
        sm, pos = jax.lax.top_k(s, k)
        return sm, jnp.take_along_axis(ix, pos, axis=1)

    scores, indices = [], []
    for i in range(0, probe.shape[0], batch):
        pst = ((jnp.asarray(probe_stats[0][i:i + batch], jnp.float32),
                jnp.asarray(probe_stats[1][i:i + batch], jnp.float32))
               if use_norm else (jnp.zeros(()), jnp.zeros(())))
        s, ix = chunk(g_dev, jnp.asarray(probe[i:i + batch]),
                      gst_dev, pst)
        scores.append(np.asarray(s))
        indices.append(np.asarray(ix))
    if not scores:
        raise ValueError("empty probe set")
    return np.concatenate(indices), np.concatenate(scores)


def roc_curve(sims: np.ndarray, labels: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full ROC at every distinct score: ``(thresholds, far, tar)``.

    Acceptance is STRICTLY above the threshold — the same convention as
    :func:`tar_at_far`, so the curve passes exactly through every
    reported operating point. ``thresholds`` is the descending distinct
    scores plus a final ``-inf`` (accept-everything) entry; ``far`` and
    ``tar`` ascend from 0 to 1. Plot-ready and the basis for AUC/EER.
    """
    sims = np.asarray(sims, np.float64)
    labels = np.asarray(labels).astype(bool)
    n_pos = int(labels.sum())
    n_neg = int((~labels).sum())
    if n_pos == 0 or n_neg == 0:
        raise ValueError(f"roc_curve needs both classes; got "
                         f"{n_pos} positives / {n_neg} negatives")
    order = np.argsort(-sims, kind="stable")
    s, pos = sims[order], labels[order]
    cum_tp = np.cumsum(pos)
    cum_fp = np.cumsum(~pos)
    # last index of each tie group: thresholds are the distinct scores
    ends = np.nonzero(np.r_[np.diff(s) != 0, True])[0]
    # accepting > s[ends[i]] admits exactly the groups before i
    tp = np.r_[0, cum_tp[ends[:-1]], cum_tp[-1]].astype(np.float64)
    fp = np.r_[0, cum_fp[ends[:-1]], cum_fp[-1]].astype(np.float64)
    thresholds = np.r_[s[ends], -np.inf]
    return thresholds, fp / n_neg, tp / n_pos


def auc_eer(far: np.ndarray, tar: np.ndarray) -> tuple[float, float]:
    """Area under the ROC (trapezoid) and the equal-error rate (the
    point where FAR == 1 − TAR == FRR, linearly interpolated between
    the two bracketing curve points)."""
    far = np.asarray(far, np.float64)
    tar = np.asarray(tar, np.float64)
    auc = float(np.trapezoid(tar, far))
    # frr − far is monotonically non-increasing along the curve; find
    # the sign change and interpolate
    diff = (1.0 - tar) - far
    idx = int(np.searchsorted(-diff, 0.0, side="left"))
    if idx == 0:
        eer = float(far[0])
    elif idx >= len(far):
        eer = float(1.0 - tar[-1])
    else:
        d0, d1 = diff[idx - 1], diff[idx]
        w = 0.0 if d0 == d1 else d0 / (d0 - d1)
        eer = float((1 - w) * far[idx - 1] + w * far[idx])
    return auc, eer


def verify_pairs(emb1: np.ndarray, emb2: np.ndarray, labels: np.ndarray,
                 *, n_folds: int = 10) -> dict:
    """End-to-end: embeddings for each pair side → LFW-protocol report
    (fold accuracy + TAR@FAR operating points + ROC AUC / EER)."""
    sims = np.asarray(cosine_similarity(jnp.asarray(emb1), jnp.asarray(emb2)))
    report = verify_folds(sims, labels, n_folds=n_folds)
    report.update(tar_at_far(sims, labels))
    try:
        _, far, tar = roc_curve(sims, labels)
        report["auc"], report["eer"] = auc_eer(far, tar)
    except ValueError:  # single-class pair set: no ROC, like tar@far's NaNs
        report["auc"] = report["eer"] = float("nan")
    return report


def identification_rank_k(gallery: np.ndarray, gallery_labels: np.ndarray,
                          probe: np.ndarray, probe_labels: np.ndarray,
                          *, k: int = 1) -> float:
    """Closed-set identification: rank-k hit rate.

    The similarity matrix is one on-device MXU matmul; the top-k scan is
    trivial host work. Complements the pair protocol for gallery/probe
    style evaluations.
    """
    sims = np.asarray(similarity_matrix(jnp.asarray(probe),
                                        jnp.asarray(gallery)))  # (P, G)
    order = np.argsort(-sims, axis=1)[:, :k]
    hits = (np.asarray(gallery_labels)[order] ==
            np.asarray(probe_labels)[:, None]).any(axis=1)
    return float(hits.mean())


def identification_stats(gallery: np.ndarray, gallery_labels: np.ndarray,
                         probe: np.ndarray, probe_labels: np.ndarray,
                         *, batch: int = 4096) -> dict:
    """One streamed device pass shared by the 1:N protocols.

    Computes, per MATED probe (identity present in the gallery), the
    best-correct-match score and the rank (1 + wrong-identity entries
    scoring above it — two device reductions, no host argsort over G),
    and per NON-MATED probe the top gallery score. ``cmc_curve`` and
    ``dir_at_far`` are post-processing over this dict; pass the same
    result to both (``stats=``) to evaluate closed- and open-set
    metrics off a single similarity sweep.
    """
    gallery_labels = np.asarray(gallery_labels)
    probe_labels = np.asarray(probe_labels)
    probe = np.asarray(probe)
    # device-resident arguments (NOT jit closure constants: a closed-over
    # gallery would be baked into each compiled executable — one copy per
    # probe-batch shape — defeating the large-gallery design)
    g = jax.device_put(jnp.asarray(gallery, jnp.float32))
    gl = jax.device_put(jnp.asarray(gallery_labels))
    mated_mask = np.isin(probe_labels, gallery_labels)

    @jax.jit
    def mated_stats(g, gl, p, pl):
        sims = similarity_matrix(g, p).T            # (B, G)
        same = gl[None, :] == pl[:, None]
        best_correct = jnp.max(jnp.where(same, sims, -jnp.inf), axis=1)
        above = jnp.sum((sims > best_correct[:, None]) & ~same, axis=1)
        return best_correct, 1 + above

    @jax.jit
    def top_scores(g, p):
        return jnp.max(similarity_matrix(g, p).T, axis=1)

    mp, mpl = probe[mated_mask], probe_labels[mated_mask]
    scores, ranks_ = [], []
    for i in range(0, len(mp), batch):
        s, r = mated_stats(g, gl, jnp.asarray(mp[i:i + batch]),
                           jnp.asarray(mpl[i:i + batch]))
        scores.append(np.asarray(s))
        ranks_.append(np.asarray(r))

    nm = probe[~mated_mask]
    # empty fallbacks use the SAME dtype as the non-empty path (the
    # device sweeps return float32) so consumers never see a
    # shape-dependent dtype switch
    nm_top = np.concatenate(
        [np.asarray(top_scores(g, jnp.asarray(nm[i:i + batch])))
         for i in range(0, len(nm), batch)]) if len(nm) else \
        np.empty((0,), np.float32)

    return {
        "mated_mask": mated_mask,
        "s_correct": (np.concatenate(scores) if scores
                      else np.empty((0,), np.float32)),
        "ranks": (np.concatenate(ranks_) if ranks_
                  else np.empty((0,), np.int32)),
        "nm_top": nm_top,
        "gallery_size": int(len(gallery_labels)),
    }


def cmc_curve(gallery: np.ndarray, gallery_labels: np.ndarray,
              probe: np.ndarray, probe_labels: np.ndarray,
              *, ranks=(1, 5, 10), batch: int = 4096,
              stats: dict | None = None) -> dict:
    """Closed-set CMC: hit rate at each rank, megaface-style.

    Rank of a probe = 1 + number of WRONG-identity gallery entries
    scoring above its best correct match (``identification_stats``), so
    million-entry distractor galleries stream through in probe batches
    of ``batch`` rows.

    Probes whose identity is absent from the gallery cannot be ranked
    in a closed-set protocol; they are excluded and counted in the
    returned ``skipped`` (feed them to ``dir_at_far`` instead — same
    ``stats``).
    """
    if stats is None:
        stats = identification_stats(gallery, gallery_labels,
                                     probe, probe_labels, batch=batch)
    r = stats["ranks"]
    return {
        "probes": int(len(r)),
        "gallery": stats["gallery_size"],
        "skipped": int((~stats["mated_mask"]).sum()),
        "cmc": {int(k): (float((r <= k).mean()) if len(r) else float("nan"))
                for k in ranks},
        "mean_rank": float(r.mean()) if len(r) else float("nan"),
    }


def dir_at_far(gallery: np.ndarray, gallery_labels: np.ndarray,
               probe: np.ndarray, probe_labels: np.ndarray, *,
               fars=(1e-1, 1e-2), rank: int = 1,
               batch: int = 4096, stats: dict | None = None) -> dict:
    """Open-set identification: DIR@FAR (IJB/NIST 1:N protocol).

    Completes the L7 eval layer's third protocol leg next to the 1:1
    TAR@FAR and the closed-set CMC (SURVEY.md §3.3 covers only the
    closed protocols — open-set is the watchlist deployment the 1:N
    serving gallery actually runs). Probes whose identity is absent
    from the gallery are the NON-MATED (impostor) set; their top
    gallery scores set the alarm threshold. For each target FAR the
    threshold follows ``tar_at_far``'s convention — the tightest value
    the non-mated set supports, acceptance strictly above, achieved
    FAR ≤ target, NaN when FAR is finer than 1/N_nonmated. A mated
    probe is identified iff its correct identity sits within
    ``rank`` AND that match scores above the threshold:

        DIR(far, rank) = P[rank_i <= rank  AND  s_correct_i > thr(far)]

    All similarity work is one ``identification_stats`` sweep (one MXU
    matmul + two reductions per probe batch), so million-entry
    distractor galleries pass through in ``batch`` rows; pass a
    precomputed ``stats`` to share the sweep with ``cmc_curve``.
    """
    if stats is None:
        stats = identification_stats(gallery, gallery_labels,
                                     probe, probe_labels, batch=batch)
    mated_mask = stats["mated_mask"]
    s_correct = stats["s_correct"]
    r_mated = stats["ranks"]
    neg = np.sort(stats["nm_top"].astype(np.float64))[::-1]  # descending

    in_rank = r_mated <= rank
    out: dict = {
        "mated": int(mated_mask.sum()),
        "nonmated": int((~mated_mask).sum()),
        "gallery": stats["gallery_size"],
        "rank": int(rank),
        # the FAR→1 limit: pure closed-set rank-`rank` hit rate
        "dir_closed_set": (float(in_rank.mean()) if len(r_mated)
                           else float("nan")),
    }
    if len(neg) == 0:
        import warnings
        warnings.warn(
            "dir_at_far: every probe identity is enrolled — no "
            "non-mated probes to set thresholds; DIR@FAR is NaN "
            "(add distractor probes for the open-set protocol)")
    for far in fars:
        key = f"dir@far={far:g}"
        k = int(np.floor(far * len(neg)))
        if len(neg) == 0 or len(s_correct) == 0 or \
                (k == 0 and far > 0 and 1 / len(neg) > far):
            out[key] = float("nan")
            continue
        thr = neg[k] if k < len(neg) else -np.inf
        out[key] = float((in_rank & (s_correct > thr)).mean())
        out[key.replace("dir@", "thr@")] = float(thr)
    return out
