"""Margin-softmax classification heads and losses for face recognition.

Rebuilds the reference's training head (ref: upstream train.py /
losses/ [UPSTREAM-K]; BASELINE.json: "large-batch margin-softmax heads",
configs[3] "Margin-softmax (CosFace/ArcFace-style) training").

Implemented as the *combined margin* formulation that subsumes the whole
family with three scalars (m1, m2, m3):

    logit_target = s * (cos(m1 * theta + m2) - m3)
    logit_other  = s * cos(theta)

- softmax:            m1=1, m2=0, m3=0       (plain normalized softmax)
- SphereFace (A-Softmax): m1>1, m2=0, m3=0
- ArcFace:            m1=1, m2=0.5, m3=0
- CosFace (AM-Softmax):   m1=1, m2=0, m3=0.35

TPU-first / numerical notes:
- The class matmul ``emb_n @ W_n^T`` is the one big GEMM of the head —
  bf16-safe on the MXU; everything after (margin, log-softmax) is done
  in float32 (SURVEY.md §7: "do logits in f32").
- The margin is applied only to the target column via a one-hot mask —
  no gather/scatter, just elementwise select, which XLA fuses.
- ArcFace's cos(theta + m2) uses the analytic expansion
  cosθ·cos m2 − sinθ·sin m2 with the standard "easy margin"-free
  monotonic correction for θ + m2 > π.
- The class-sharded (Partial-FC-style) variant for giant identity counts
  lives in ``parallel/sharded_softmax.py``; this module is the
  single-device path and the oracle for its tests.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tf_face_toolbox_tpu.models.layers import l2_normalize


@dataclasses.dataclass(frozen=True)
class MarginConfig:
    """Combined-margin hyperparameters."""
    scale: float = 64.0
    m1: float = 1.0   # multiplicative angular margin (SphereFace)
    m2: float = 0.0   # additive angular margin (ArcFace)
    m3: float = 0.0   # additive cosine margin (CosFace)

    @staticmethod
    def softmax(scale: float = 64.0) -> "MarginConfig":
        return MarginConfig(scale=scale)

    @staticmethod
    def arcface(scale: float = 64.0, margin: float = 0.5) -> "MarginConfig":
        return MarginConfig(scale=scale, m2=margin)

    @staticmethod
    def cosface(scale: float = 64.0, margin: float = 0.35) -> "MarginConfig":
        return MarginConfig(scale=scale, m3=margin)

    @staticmethod
    def sphereface(scale: float = 64.0, margin: float = 1.35) -> "MarginConfig":
        return MarginConfig(scale=scale, m1=margin)


def cosine_logits(embeddings: jax.Array, weights: jax.Array) -> jax.Array:
    """cos(theta) between embeddings (N,D) and class weights (C,D) → (N,C).

    The GEMM runs in the input dtype (bf16 on TPU); the output is f32.
    """
    e = l2_normalize(embeddings)
    w = l2_normalize(weights)
    return jnp.dot(e, w.T, preferred_element_type=jnp.float32)


def subcenter_pool(cos_theta: jax.Array, subcenters: int) -> jax.Array:
    """(N, C·K) sub-center cosines → (N, C) via max over each class's K.

    Sub-center ArcFace (Deng et al., ECCV 2020): each identity owns K
    weight vectors (rows c·K..c·K+K−1, class-major) and a sample scores
    against the CLOSEST one — noisy/mislabeled faces collapse onto
    minority sub-centers instead of corrupting the dominant one. The max
    routes the gradient to the winning sub-center only. K=1 is a no-op.
    """
    if subcenters == 1:
        return cos_theta
    n, ck = cos_theta.shape
    if ck % subcenters:
        raise ValueError(f"classifier rows {ck} not divisible by "
                         f"subcenters {subcenters}")
    return jnp.max(cos_theta.reshape(n, ck // subcenters, subcenters),
                   axis=-1)


def margined_target(cos_c: jax.Array, cfg: MarginConfig,
                    extra_m2: jax.Array | None = None,
                    extra_m3: jax.Array | None = None) -> jax.Array:
    """The target-column value cos(m1·θ + m2 [+ extra_m2]) − m3 [− extra_m3].

    ``cos_c`` is clipped cos(θ), any shape. ``extra_m2``/``extra_m3`` are
    optional PER-SAMPLE margin additions broadcastable against it — the
    hook the norm-adaptive losses (MagFace/AdaFace) use; fixed-margin
    callers pass None and get the exact original math.

    θ_m treatment: linear monotonic extension past π (standard ArcFace
    trick — cos is not monotone there), and a clamp at 0 from below
    (reachable only with a NEGATIVE adaptive margin; AdaFace's official
    code clips θ_m the same way).
    """
    m2 = cfg.m2 if extra_m2 is None else cfg.m2 + extra_m2
    needs_theta = (cfg.m1 != 1.0 or extra_m2 is not None
                   or cfg.m2 != 0.0)
    if needs_theta:
        theta = jnp.arccos(cos_c)
        theta_m = jnp.maximum(cfg.m1 * theta + m2, 0.0)
        # Monotonic extension past pi: cos is no longer monotone there,
        # so switch to the linear surrogate cos(pi) - k*(theta_m - pi)
        # (standard ArcFace/SphereFace treatment, keeps gradients sane).
        target = jnp.where(
            theta_m <= jnp.pi,
            jnp.cos(theta_m),
            -1.0 - (theta_m - jnp.pi),
        )
    else:
        target = cos_c
    target = target - cfg.m3
    if extra_m3 is not None:
        target = target - extra_m3
    return target


def apply_margin(cos_theta: jax.Array, labels: jax.Array,
                 cfg: MarginConfig,
                 extra_m2: jax.Array | None = None,
                 extra_m3: jax.Array | None = None) -> jax.Array:
    """Apply the combined margin to the target class column; scale all.

    cos_theta: (N, C) f32; labels: (N,) int in [0, C). ``extra_m2``/
    ``extra_m3``: optional (N,) per-sample margin additions (MagFace/
    AdaFace). The class-sharded head does NOT route through here — it
    builds its own ownership mask
    (parallel/sharded_softmax.local_margin_logits).
    """
    cos_theta = cos_theta.astype(jnp.float32)
    one_hot = jax.nn.one_hot(labels, cos_theta.shape[-1],
                             dtype=jnp.float32)
    # Guard acos domain: bf16 GEMM rounding can spill past ±1.
    cos_c = jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7)
    target = margined_target(
        cos_c, cfg,
        None if extra_m2 is None else extra_m2[:, None],
        None if extra_m3 is None else extra_m3[:, None])
    logits = jnp.where(one_hot > 0, target, cos_theta)
    return cfg.scale * logits


def margin_softmax_loss(embeddings: jax.Array, weights: jax.Array,
                        labels: jax.Array, cfg: MarginConfig,
                        extra_m2: jax.Array | None = None,
                        extra_m3: jax.Array | None = None,
                        subcenters: int = 1) -> jax.Array:
    """Mean cross-entropy with combined-margin logits (single device).

    ``subcenters=K``: ``weights`` is the class-major (C·K, D) sub-center
    table; per-class cosine is the max over K (:func:`subcenter_pool`).
    """
    cos = subcenter_pool(cosine_logits(embeddings, weights), subcenters)
    logits = apply_margin(cos, labels, cfg, extra_m2, extra_m3)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def init_classifier_weights(rng: jax.Array, num_classes: int,
                            embedding_dim: int) -> jax.Array:
    """Class-weight matrix W (C, D), unit-gaussian then implicit L2-norm."""
    return jax.random.normal(rng, (num_classes, embedding_dim),
                             jnp.float32) * 0.01


# ---------------------------------------------------------------------------
# Norm-adaptive margins (MagFace / AdaFace) — per-sample (m2, m3) factories
# feeding the extra_m2/extra_m3 hooks above and their class-sharded
# twins in parallel/sharded_softmax.py.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MagFaceConfig:
    """MagFace (Meng et al., CVPR 2021) hyperparameters — the official
    repo's defaults. The margin grows linearly with the feature
    magnitude a = ‖emb‖ over [l_a, u_a], and g(a) = 1/a + a/u_a²
    regularizes magnitudes upward; together they carve a convex
    cone where easy (high-quality) faces get large magnitudes."""
    l_a: float = 10.0     # magnitude range lower bound
    u_a: float = 110.0    # magnitude range upper bound
    l_m: float = 0.45     # margin at l_a
    u_m: float = 0.8      # margin at u_a
    lambda_g: float = 35.0  # regularizer weight


def magface_margins(embeddings: jax.Array,
                    cfg: MagFaceConfig) -> tuple[jax.Array, jax.Array]:
    """→ (extra_m2 (N,), g_reg scalar): the per-sample additive angular
    margin m(a_i) and the MEAN magnitude regularizer g(a_i), both with
    gradients flowing through the (clipped) norm — unlike AdaFace,
    MagFace's whole point is that the loss shapes the magnitude.

    eps-padded norm: ‖e‖'s VJP at e = 0 is 0/0 = NaN even when the
    downstream clip zeroes the cotangent (NaN·0 = NaN) — and an exact
    zero embedding is reachable (a batch-size-1 replica's embedding
    BN normalizes to identically zero at init)."""
    e = embeddings.astype(jnp.float32)
    a = jnp.sqrt(jnp.sum(e * e, axis=-1) + 1e-12)
    a = jnp.clip(a, cfg.l_a, cfg.u_a)
    m = cfg.l_m + (cfg.u_m - cfg.l_m) * (a - cfg.l_a) / (cfg.u_a - cfg.l_a)
    g = jnp.mean(1.0 / a + a / (cfg.u_a ** 2))
    return m, g


@dataclasses.dataclass(frozen=True)
class AdaFaceConfig:
    """AdaFace (Kim et al., CVPR 2022) hyperparameters — official
    defaults. The norm is a quality proxy: per-sample margins
    interpolate ArcFace-like (high quality → emphasize hard samples)
    and CosFace-like (low quality → de-emphasize), driven by the
    batch-normalized feature norm with EMA batch statistics."""
    m: float = 0.4        # margin magnitude
    h: float = 0.333      # norm-score concentration
    t_alpha: float = 0.01  # EMA momentum for the norm batch stats
    eps: float = 1e-3


def adaface_stats_init() -> dict:
    """Initial EMA stats (official init: mean 20, std 100)."""
    return {"norm_mean": jnp.float32(20.0), "norm_std": jnp.float32(100.0)}


def adaface_margins(
        norms: jax.Array, stats: dict, cfg: AdaFaceConfig,
        batch_mean: jax.Array | None = None,
        batch_std: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, dict]:
    """→ (extra_m2 (N,), extra_m3 (N,), new_stats).

    ``norms``: ‖emb‖ per sample — pass them DETACHED (AdaFace stops
    gradient through the quality proxy). ``batch_mean``/``batch_std``
    override the local batch statistics — the distributed trainer
    passes psum-combined global-batch moments so every device sees the
    same stats (mesh-invariant). Stats update-then-use, like the
    official code.
    """
    safe = jnp.clip(norms.astype(jnp.float32), 1e-3, 100.0)
    if batch_mean is None:
        batch_mean = jnp.mean(safe)
    if batch_std is None:
        # ddof=1 matches torch.std's unbiased default in the official repo
        n = safe.shape[0]
        batch_std = jnp.sqrt(
            jnp.sum((safe - batch_mean) ** 2) / jnp.maximum(n - 1, 1))
    t = cfg.t_alpha
    new_stats = {
        "norm_mean": t * batch_mean + (1.0 - t) * stats["norm_mean"],
        "norm_std": t * batch_std + (1.0 - t) * stats["norm_std"],
    }
    scaler = (safe - new_stats["norm_mean"]) / (new_stats["norm_std"]
                                                + cfg.eps)
    scaler = jnp.clip(scaler * cfg.h, -1.0, 1.0)
    extra_m2 = -cfg.m * scaler            # g_angular
    extra_m3 = cfg.m * scaler + cfg.m     # g_additive
    return extra_m2, extra_m3, new_stats


def curricular_loss(embeddings: jax.Array, weights: jax.Array,
                    labels: jax.Array, cfg: MarginConfig,
                    t: jax.Array,
                    subcenters: int = 1) -> tuple[jax.Array, jax.Array]:
    """CurricularFace (Huang et al., CVPR 2020), single device.

    Target column gets the combined margin (ArcFace's m2 in the paper);
    a NEGATIVE column j is modulated when it is harder than the
    margined target (cos θ_j > T_i): it becomes cos θ_j·(t + cos θ_j),
    where ``t`` is the EMA curriculum parameter — early training
    (t≈0) down-weights hard negatives, late training (t→~0.3+)
    emphasizes them. Update-then-use like the official code:
    t' = 0.01·mean(target cos) + 0.99·t, the modulation uses t', and
    ``(mean NLL, t')`` is returned for the caller to carry as state.
    """
    cos = subcenter_pool(cosine_logits(embeddings, weights), subcenters)
    cos_c = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    one_hot = jax.nn.one_hot(labels, cos.shape[-1], dtype=jnp.float32)
    tgt_cos = jnp.sum(cos_c * one_hot, axis=-1)               # (N,)
    r = jnp.mean(jax.lax.stop_gradient(tgt_cos))
    t_new = 0.01 * r + 0.99 * t
    target = margined_target(tgt_cos, cfg)                    # T_i
    hard = cos_c > jax.lax.stop_gradient(target)[:, None]
    neg = jnp.where(hard, cos_c * (t_new + cos_c), cos_c)
    logits = cfg.scale * jnp.where(one_hot > 0, target[:, None], neg)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll), t_new


def curricular_t_init() -> dict:
    """Initial curriculum state (official init: t = 0)."""
    return {"t": jnp.float32(0.0)}


# ---------------------------------------------------------------------------
# Auxiliary metric losses: center loss (reference-era joint supervision,
# Wen et al. ECCV 2016) and batch-hard triplet (FaceNet-era, mined per
# Hermans et al. 2017). Both are single-device forms; the trainer runs
# them on the model-axis-gathered row batch (see train/trainer.py).
# ---------------------------------------------------------------------------


def center_loss(embeddings: jax.Array, centers: jax.Array,
                labels: jax.Array) -> jax.Array:
    """½ · mean‖e_i − c_{y_i}‖² with centers DETACHED (they train by the
    delta rule below, not by backprop — Wen et al. eq. 2/3)."""
    c = jax.lax.stop_gradient(centers)[labels]
    d = embeddings.astype(jnp.float32) - c
    return 0.5 * jnp.mean(jnp.sum(d * d, axis=-1))


def center_update(embeddings: jax.Array, centers: jax.Array,
                  labels: jax.Array, alpha: float = 0.5) -> jax.Array:
    """Delta-rule center update: c_j ← c_j − α·Σ_{y_i=j}(c_j − e_i)/(1+n_j).

    One-hot segment sums — no scatter, XLA-friendly. Classes absent from
    the batch are untouched (n_j = 0 ⇒ delta 0)."""
    e = jax.lax.stop_gradient(embeddings).astype(jnp.float32)
    num_classes = centers.shape[0]
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    counts = jnp.sum(one_hot, axis=0)                       # (C,)
    sum_e = one_hot.T @ e                                   # (C, D)
    delta = counts[:, None] * centers - sum_e
    return centers - alpha * delta / (1.0 + counts)[:, None]


def batch_hard_triplet_loss(embeddings: jax.Array, labels: jax.Array,
                            margin: float = 0.3,
                            normalized: bool = True) -> jax.Array:
    """Batch-hard triplet loss (Hermans et al. 2017) on Euclidean
    distances — over L2-normalized embeddings by default (the face
    convention; then d² = 2 − 2cos).

    Per anchor: hardest positive (max distance, same label, not self)
    vs hardest negative (min distance, different label);
    relu(margin + d_pos − d_neg). Anchors with no positive or no
    negative in the batch are masked out of the mean (a P×K balanced
    batch — data/pipeline.balanced_batch_iterator — guarantees both).
    """
    e = embeddings.astype(jnp.float32)
    if normalized:
        e = l2_normalize(e)
    sq = jnp.sum(e * e, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (e @ e.T)
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same
    big = jnp.float32(1e9)
    d_pos = jnp.max(jnp.where(pos_mask, d, -big), axis=-1)
    d_neg = jnp.min(jnp.where(neg_mask, d, big), axis=-1)
    valid = jnp.any(pos_mask, axis=-1) & jnp.any(neg_mask, axis=-1)
    per_anchor = jnp.maximum(margin + d_pos - d_neg, 0.0)
    per_anchor = jnp.where(valid, per_anchor, 0.0)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(per_anchor) / n_valid
