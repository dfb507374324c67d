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


def apply_margin(cos_theta: jax.Array, labels: jax.Array,
                 cfg: MarginConfig) -> jax.Array:
    """Apply the combined margin to the target class column; scale all.

    cos_theta: (N, C) f32; labels: (N,) int in [0, C). The class-sharded
    head does NOT route through here — it builds its own ownership mask
    (parallel/sharded_softmax.local_margin_logits).
    """
    cos_theta = cos_theta.astype(jnp.float32)
    one_hot = jax.nn.one_hot(labels, cos_theta.shape[-1],
                             dtype=jnp.float32)
    # Guard acos domain: bf16 GEMM rounding can spill past ±1.
    cos_c = jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7)

    if cfg.m1 != 1.0 or cfg.m2 != 0.0:
        theta = jnp.arccos(cos_c)
        theta_m = cfg.m1 * theta + cfg.m2
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
    logits = jnp.where(one_hot > 0, target, cos_theta)
    return cfg.scale * logits


def margin_softmax_loss(embeddings: jax.Array, weights: jax.Array,
                        labels: jax.Array, cfg: MarginConfig) -> jax.Array:
    """Mean cross-entropy with combined-margin logits (single device)."""
    logits = apply_margin(cosine_logits(embeddings, weights), labels, cfg)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def init_classifier_weights(rng: jax.Array, num_classes: int,
                            embedding_dim: int) -> jax.Array:
    """Class-weight matrix W (C, D), unit-gaussian then implicit L2-norm."""
    return jax.random.normal(rng, (num_classes, embedding_dim),
                             jnp.float32) * 0.01
