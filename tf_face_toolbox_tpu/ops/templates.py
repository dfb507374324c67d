"""IJB-style template (set-to-set) evaluation.

Modern face benchmarks (IJB-B/IJB-C) compare *templates* — sets of
images and video frames of one subject sighting — rather than single
images. The protocol's aggregation is two-stage: frames of the same
media (video) are averaged first so a long video counts as ONE look,
then media embeddings are averaged into the template embedding and
L2-normalized. 1:1 verification scores template pairs with cosine
similarity at fixed-FAR operating points (TAR@FAR, the IJB currency);
1:N identification runs the aggregated templates through the existing
gallery/probe machinery (ops.verification.cmc_curve).

Beyond the reference's eval layer (ref: SURVEY.md §1 L7 covers LFW
pairs only) but part of any complete face-recognition toolbox since
~2017. TPU-first: both aggregation stages are segment-sums evaluated
on device (one scatter-add each), so million-frame corpora aggregate
in one pass without a Python groupby.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tf_face_toolbox_tpu.models.layers import l2_normalize
from tf_face_toolbox_tpu.ops.verification import (
    cosine_similarity, tar_at_far)


import functools


@functools.partial(jax.jit, static_argnums=(2,))
def _segment_mean(x: jax.Array, seg: jax.Array,
                  num_segments: int) -> jax.Array:
    """Mean of ``x`` rows per segment id: one device scatter-add."""
    total = jax.ops.segment_sum(x, seg, num_segments=num_segments)
    count = jax.ops.segment_sum(jnp.ones((x.shape[0],), x.dtype), seg,
                                num_segments=num_segments)
    return total / jnp.maximum(count, 1.0)[:, None]


def aggregate_templates(embeddings: np.ndarray,
                        template_ids: np.ndarray,
                        media_ids: np.ndarray,
                        *, normalize: bool = True):
    """Frame embeddings → template embeddings (media-then-template mean).

    Args:
      embeddings: (N, D) per-image/frame embeddings.
      template_ids: (N,) template id per row (any integer/str dtype).
      media_ids: (N,) media id per row; frames of one video share it.
        Media ids need only be unique WITHIN a template (the pair
        (template, media) defines the inner segment, so reusing media
        ids across templates is fine — IJB metadata does).
      normalize: L2-normalize the template embeddings (protocol default).

    Returns:
      (template_embeddings (T, D) f32, template_keys (T,) — the unique
      template ids in sorted order).
    """
    embeddings = np.asarray(embeddings, np.float32)
    template_ids = np.asarray(template_ids)
    media_ids = np.asarray(media_ids)
    if not (len(embeddings) == len(template_ids) == len(media_ids)):
        raise ValueError("embeddings/template_ids/media_ids length "
                         f"mismatch: {len(embeddings)}/"
                         f"{len(template_ids)}/{len(media_ids)}")
    if len(embeddings) == 0:
        raise ValueError("no rows to aggregate")
    # Host-side id compaction (tiny); device-side segment means (the
    # O(N·D) work). Stage 1 segments on (template, media) pairs.
    tkeys, tidx = np.unique(template_ids, return_inverse=True)
    mcodes = np.unique(media_ids, return_inverse=True)[1]
    mkeys, midx = np.unique(np.stack([tidx, mcodes], axis=1), axis=0,
                            return_inverse=True)
    media_emb = _segment_mean(jnp.asarray(embeddings),
                              jnp.asarray(midx), len(mkeys))
    # Stage 2: media → template (each media segment's template id is
    # the first column of its unique (template, media) key).
    t_emb = _segment_mean(media_emb, jnp.asarray(mkeys[:, 0]),
                          len(tkeys))
    if normalize:
        t_emb = l2_normalize(t_emb)
    return np.asarray(t_emb, np.float32), tkeys


def verify_templates(template_embeddings: np.ndarray,
                     template_keys: np.ndarray,
                     pairs: np.ndarray, labels: np.ndarray,
                     *, fars=(1e-1, 1e-2, 1e-3, 1e-4, 1e-5)) -> dict:
    """IJB 1:1 protocol: cosine over template pairs → TAR at fixed FARs.

    ``pairs`` is (P, 2) of template ids (same id space as
    ``template_keys``); ``labels`` is (P,) 1=same subject.
    """
    pairs = np.asarray(pairs)
    labels = np.asarray(labels)
    lookup = {k: i for i, k in enumerate(template_keys.tolist())}
    try:
        i1 = np.fromiter((lookup[k] for k in pairs[:, 0].tolist()),
                         np.int64, len(pairs))
        i2 = np.fromiter((lookup[k] for k in pairs[:, 1].tolist()),
                         np.int64, len(pairs))
    except KeyError as e:
        raise ValueError(f"pair references unknown template {e}") from e
    sims = np.asarray(cosine_similarity(
        jnp.asarray(template_embeddings[i1]),
        jnp.asarray(template_embeddings[i2])))
    report = {"pairs": int(len(pairs)),
              "positives": int(labels.astype(bool).sum())}
    report.update(tar_at_far(sims, labels, fars=fars))
    return report
