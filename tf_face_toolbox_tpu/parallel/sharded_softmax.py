"""Class-sharded (Partial-FC-style) margin-softmax for giant identity counts.

The one tensor in this workload worth model-parallelism is the classifier
W ∈ (num_identities, D): face datasets reach 10^5..10^7 identities, so W
dwarfs the backbone (SURVEY.md §2c TP row). We shard W's class dimension
over the ``model`` mesh axis; every device computes a (N_local, C_local)
logit block and the softmax combines across shards with two tiny
collectives:

    global_max   = pmax over 'model' of per-sample row max
    denominator  = psum over 'model' of sum exp(logit - global_max)
    target logit = psum over 'model' (each label lives on exactly one shard)

This is mathematically exact — identical to the single-device
``margin_softmax_loss`` — while the (N, C) logits matrix never
materializes on any one chip. Collectives ride ICI; the per-shard GEMM
stays MXU-shaped. Gradients flow through the collectives automatically
(psum differentiates to psum).

Intended use: inside ``shard_map`` (see train/trainer.py). Functions take
``axis_name`` explicitly so tests can run them on the fake 8-device CPU
mesh (SURVEY.md §4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tf_face_toolbox_tpu.ops.losses import MarginConfig, cosine_logits


def local_margin_logits(embeddings: jax.Array, w_shard: jax.Array,
                        labels: jax.Array, cfg: MarginConfig,
                        axis_name: str) -> tuple[jax.Array, jax.Array]:
    """Per-shard scaled margin logits + the local one-hot ownership mask.

    embeddings: (N, D) — the samples this device sees (full rows of the
      logit block). w_shard: (C_local, D). labels: (N,) GLOBAL ids.
    Returns (logits (N, C_local) f32, one_hot (N, C_local) f32).
    """
    idx = jax.lax.axis_index(axis_name)
    c_local = w_shard.shape[0]
    offset = idx * c_local
    local_labels = labels - offset
    owned = (local_labels >= 0) & (local_labels < c_local)
    # Out-of-shard labels map to an in-range dummy; the mask zeroes them.
    safe_labels = jnp.where(owned, local_labels, 0)
    one_hot = jax.nn.one_hot(safe_labels, c_local, dtype=jnp.float32)
    one_hot = one_hot * owned[:, None].astype(jnp.float32)

    cos_theta = cosine_logits(embeddings, w_shard)
    # apply_margin via the mask directly (labels may be off-shard).
    cos_c = jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7)
    if cfg.m1 != 1.0 or cfg.m2 != 0.0:
        theta = jnp.arccos(cos_c)
        theta_m = cfg.m1 * theta + cfg.m2
        target = jnp.where(theta_m <= jnp.pi, jnp.cos(theta_m),
                           -1.0 - (theta_m - jnp.pi))
    else:
        target = cos_c
    target = target - cfg.m3
    logits = cfg.scale * jnp.where(one_hot > 0, target, cos_theta)
    return logits, one_hot


def sharded_margin_softmax_loss(embeddings: jax.Array, w_shard: jax.Array,
                                labels: jax.Array, cfg: MarginConfig,
                                axis_name: str = "model",
                                total_classes: int | None = None) -> jax.Array:
    """Exact distributed cross-entropy over class shards. → scalar (local mean).

    Call inside shard_map with ``w_shard`` partitioned over ``axis_name``.
    Returns the mean NLL over the N local samples (psum over the data
    axis happens in the caller's gradient exchange).

    ``total_classes``: true identity count when C was padded up to a
    multiple of the shard count — padded columns are masked out of the
    softmax denominator so padding never changes the math.
    """
    logits, one_hot = local_margin_logits(
        embeddings, w_shard, labels, cfg, axis_name)
    c_local = w_shard.shape[0]
    if total_classes is not None:
        idx = jax.lax.axis_index(axis_name)
        col_ids = idx * c_local + jax.lax.broadcasted_iota(
            jnp.int32, (1, c_local), 1)
        valid = (col_ids < total_classes).astype(jnp.float32)
    else:
        valid = jnp.ones((1, c_local), jnp.float32)
    # Numerically stable distributed log-softmax (f32 throughout).
    # IMPORTANT: shift/exp the MASKED logits — a padded column's raw
    # logit can exceed the max over valid columns by enough that
    # exp(raw - max) overflows to inf, and inf * 0-mask = NaN.
    neg_inf = jnp.float32(-1e30)
    masked_logits = jnp.where(valid > 0, logits, neg_inf)
    local_max = jnp.max(masked_logits, axis=-1)
    # stop_gradient: the max shift cancels exactly in log-softmax, so its
    # gradient is zero by construction — and pmax has no VJP rule anyway.
    global_max = jax.lax.pmax(
        jax.lax.stop_gradient(local_max), axis_name)
    shifted = masked_logits - global_max[:, None]
    local_denom = jnp.sum(jnp.exp(shifted) * valid, axis=-1)
    denom = jax.lax.psum(local_denom, axis_name)
    local_target = jnp.sum(shifted * one_hot, axis=-1)
    target = jax.lax.psum(local_target, axis_name)  # exactly one owner
    nll = jnp.log(denom) - target
    return jnp.mean(nll)
