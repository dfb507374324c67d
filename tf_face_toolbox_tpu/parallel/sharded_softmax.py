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

import functools

import jax
import jax.numpy as jnp

from tf_face_toolbox_tpu.ops.losses import (
    MarginConfig,
    cosine_logits,
    margined_target,
    subcenter_pool,
)


def local_margin_logits(embeddings: jax.Array, w_shard: jax.Array,
                        labels: jax.Array, cfg: MarginConfig,
                        axis_name: str,
                        extra_m2: jax.Array | None = None,
                        extra_m3: jax.Array | None = None,
                        subcenters: int = 1,
                        ) -> tuple[jax.Array, jax.Array]:
    """Per-shard scaled margin logits + the local one-hot ownership mask.

    embeddings: (N, D) — the samples this device sees (full rows of the
      logit block). w_shard: (C_local·K, D). labels: (N,) GLOBAL ids.
    ``extra_m2``/``extra_m3``: optional (N,) per-sample margin additions
    (norm-adaptive losses — ops/losses.magface_margins/adaface_margins);
    every shard of a data row must pass the SAME arrays (they derive from
    the gathered row embeddings, which are model-axis-replicated).
    ``subcenters=K``: sub-center ArcFace pooling — the shard holds whole
    classes (K class-major rows each; the trainer pads classes to the
    shard count first, so rows never straddle shards).
    Returns (logits (N, C_local) f32, one_hot (N, C_local) f32).
    """
    idx = jax.lax.axis_index(axis_name)
    c_local = w_shard.shape[0] // subcenters   # CLASSES on this shard
    offset = idx * c_local
    local_labels = labels - offset
    owned = (local_labels >= 0) & (local_labels < c_local)
    # Out-of-shard labels map to an in-range dummy; the mask zeroes them.
    safe_labels = jnp.where(owned, local_labels, 0)
    one_hot = jax.nn.one_hot(safe_labels, c_local, dtype=jnp.float32)
    one_hot = one_hot * owned[:, None].astype(jnp.float32)

    cos_theta = subcenter_pool(cosine_logits(embeddings, w_shard),
                               subcenters)
    # apply_margin via the mask directly (labels may be off-shard).
    cos_c = jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7)
    target = margined_target(
        cos_c, cfg,
        None if extra_m2 is None else extra_m2[:, None],
        None if extra_m3 is None else extra_m3[:, None])
    logits = cfg.scale * jnp.where(one_hot > 0, target, cos_theta)
    return logits, one_hot


def sharded_margin_softmax_loss(embeddings: jax.Array, w_shard: jax.Array,
                                labels: jax.Array, cfg: MarginConfig,
                                axis_name: str = "model",
                                total_classes: int | None = None,
                                extra_m2: jax.Array | None = None,
                                extra_m3: jax.Array | None = None,
                                subcenters: int = 1,
                                ) -> jax.Array:
    """Exact distributed cross-entropy over class shards. → scalar (local mean).

    Call inside shard_map with ``w_shard`` partitioned over ``axis_name``.
    Returns the mean NLL over the N local samples (psum over the data
    axis happens in the caller's gradient exchange).

    ``total_classes``: true identity count when C was padded up to a
    multiple of the shard count — padded columns are masked out of the
    softmax denominator so padding never changes the math.

    ``subcenters=K``: sub-center ArcFace — ``w_shard`` holds K
    class-major rows per class; per-class cosine is the max over K.
    """
    logits, one_hot = local_margin_logits(
        embeddings, w_shard, labels, cfg, axis_name,
        extra_m2=extra_m2, extra_m3=extra_m3, subcenters=subcenters)
    return _masked_softmax_nll(logits, one_hot, total_classes,
                               axis_name)


def _masked_softmax_nll(logits: jax.Array, one_hot: jax.Array,
                        total_classes: int | None,
                        axis_name: str) -> jax.Array:
    """Pad-masked, numerically stable DISTRIBUTED softmax NLL (mean over
    rows) — the shared tail of the exact and curricular heads.

    IMPORTANT: shift/exp the MASKED logits — a padded column's raw
    logit can exceed the max over valid columns by enough that
    exp(raw - max) overflows to inf, and inf * 0-mask = NaN.
    """
    c_local = logits.shape[-1]
    if total_classes is not None:
        idx = jax.lax.axis_index(axis_name)
        col_ids = idx * c_local + jax.lax.broadcasted_iota(
            jnp.int32, (1, c_local), 1)
        valid = (col_ids < total_classes).astype(jnp.float32)
    else:
        valid = jnp.ones((1, c_local), jnp.float32)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_compact_sync(w_shard: jax.Array, sampled: jax.Array,
                         data_axis: str) -> jax.Array:
    """``w_shard[sampled]`` whose backward pmean-reduces the COMPACT
    (budget, D) cotangent over ``data_axis`` BEFORE scattering it into
    the (C_local, D) shard (VERDICT r4 #2; the partial-gradient
    exchange of An et al. 2021 "Partial FC").

    The plain gather's VJP scatters first, so the trainer's data-axis
    all-reduce moved the FULL shard — 47.8 MB/step at 10^6 padded ids
    on a (2, 4) mesh regardless of sample rate (the r4 scaling model's
    #1 v5e-8 suspect). Reducing before the scatter moves budget·D
    floats instead: exactly ``sample_rate`` × the shard. Requires
    ``sampled`` identical across the data axis (the caller samples
    from the data-gathered global positives + a data-replicated key).
    The returned shard gradient is ALREADY data-combined — the trainer
    skips its classifier pmean for this path."""
    return w_shard[sampled]


def _gcs_fwd(w_shard, sampled, data_axis):
    return w_shard[sampled], (sampled, w_shard.shape)


def _gcs_bwd(data_axis, res, ct):
    sampled, shape = res
    ct = jax.lax.pmean(ct, data_axis)      # compact: (budget, D)
    return (jnp.zeros(shape, ct.dtype).at[sampled].add(ct), None)


_gather_compact_sync.defvjp(_gcs_fwd, _gcs_bwd)


def sampled_sharded_margin_softmax_loss(
        embeddings: jax.Array, w_shard: jax.Array, labels: jax.Array,
        cfg: MarginConfig, key: jax.Array, budget: int,
        axis_name: str = "model",
        total_classes: int | None = None,
        extra_m2: jax.Array | None = None,
        extra_m3: jax.Array | None = None,
        data_axis: str | None = None) -> jax.Array:
    """Sampled Partial-FC: score a per-shard class subset, not all of C.

    The exact head above is full Partial-FC model-parallelism but still
    scores every class each step; at the identity counts the classifier
    shard exists for (10^5..10^7 — An et al. 2021, "Partial FC"), the
    (N, C_local) logit block and its bf16 GEMM dominate step time and
    HBM. This variant samples each shard's columns per step:

    - every class owned by a batch label is kept (the "keep target
      class" rule — positives always get their gradient);
    - ``budget - |positives|`` negatives are drawn uniformly without
      replacement (iid uniform keys + top_k — a sort-free equivalent of
      a Fisher-Yates prefix);
    - the softmax denominator is importance-corrected: a sampled valid
      negative's exp-term is weighted by 1/q with q = its inclusion
      probability, making the sampled denominator an unbiased estimator
      of the true one (the log of it is consistent; tf.nn.
      sampled_softmax_loss's classic correction). ``budget == C_local``
      degenerates to the exact loss bit-for-bit in expectation and
      numerically (q == 1; tested).

    ``key`` must be identical across the shard group for a given step
    (fold only the step, not the device, into it): each shard then
    draws its own columns (axis_index folds in below), and the psum'd
    denominator sums one coherent estimator.

    ``data_axis`` (r5, VERDICT r4 #2): positives are taken from the
    data-axis-GATHERED global batch (the Partial FC paper's rule) so
    the sampled set is identical across data ranks, and the classifier
    shard is read through :func:`_gather_compact_sync` — the data-axis
    gradient exchange then moves the COMPACT (budget, D) gradient, not
    the full shard, and the caller must NOT reduce the classifier
    gradient over data again. None keeps the r4 per-rank-positives
    behavior (single data rank / direct tests).

    Static shapes throughout: ``budget`` is a Python int; requires
    ``budget >= N`` (the GLOBAL batch when ``data_axis`` is given) so
    positives can never overflow the sample.
    """
    n = labels.shape[0]
    c_local = w_shard.shape[0]
    if not 0 < budget <= c_local:
        raise ValueError(f"budget {budget} must be in (0, {c_local}]")
    if data_axis is not None:
        n_pool = n * jax.lax.axis_size(data_axis)
        pos_labels = jax.lax.all_gather(labels, data_axis, tiled=True)
    else:
        n_pool = n
        pos_labels = labels
    # a shard can own at most min(pool, C_local) distinct positives
    if budget < min(n_pool, c_local):
        raise ValueError(
            f"budget {budget} < min(batch pool {n_pool}, shard "
            f"{c_local}): owned positives could overflow the sampled "
            f"set")
    idx_dev = jax.lax.axis_index(axis_name)
    offset = idx_dev * c_local
    local = labels - offset
    owned = (local >= 0) & (local < c_local)
    safe = jnp.where(owned, local, 0)
    pos_local = pos_labels - offset
    pos_owned = (pos_local >= 0) & (pos_local < c_local)
    pos_safe = jnp.where(pos_owned, pos_local, 0)
    pos_in_shard = jnp.zeros((c_local,), bool).at[pos_safe].max(
        pos_owned, mode="drop")
    num_pos = jnp.sum(pos_in_shard.astype(jnp.int32))
    if total_classes is not None:
        valid_local = jnp.clip(total_classes - offset, 0, c_local)
        col_valid = jnp.arange(c_local) < valid_local
    else:
        valid_local = jnp.int32(c_local)
        col_valid = jnp.ones((c_local,), bool)

    # Draw: positives first (key −1), valid negatives by iid uniform,
    # pad columns last (key +2 > any uniform) — top_k of the negated
    # keys yields exactly {positives} ∪ uniform-without-replacement
    # negatives, padded only if the shard runs out of valid columns.
    shard_key = jax.random.fold_in(key, idx_dev)
    r = jax.random.uniform(shard_key, (c_local,))
    r = jnp.where(pos_in_shard, -1.0, jnp.where(col_valid, r, 2.0))
    _, sampled = jax.lax.top_k(-r, budget)          # (budget,) indices

    if data_axis is not None:
        # sampled is data-replicated (global positives + shared key):
        # the compact-cotangent gather keeps the data-axis gradient
        # exchange at budget·D instead of C_local·D
        w_sub = _gather_compact_sync(w_shard, sampled, data_axis)
    else:
        w_sub = w_shard[sampled]                    # (budget, D) gather
    # position of each label's class within the sampled set
    pos_of_class = jnp.zeros((c_local,), jnp.int32).at[sampled].set(
        jnp.arange(budget, dtype=jnp.int32))
    one_hot = jax.nn.one_hot(pos_of_class[safe], budget,
                             dtype=jnp.float32)
    one_hot = one_hot * owned[:, None].astype(jnp.float32)

    cos_theta = cosine_logits(embeddings, w_sub)
    cos_c = jnp.clip(cos_theta, -1.0 + 1e-7, 1.0 - 1e-7)
    target = margined_target(
        cos_c, cfg,
        None if extra_m2 is None else extra_m2[:, None],
        None if extra_m3 is None else extra_m3[:, None])
    logits = cfg.scale * jnp.where(one_hot > 0, target, cos_theta)

    samp_valid = col_valid[sampled]                  # (budget,) bool
    samp_pos = pos_in_shard[sampled]
    # inclusion probability of a surviving valid negative
    n_neg_drawn = jnp.minimum(budget - num_pos, valid_local - num_pos)
    pool = jnp.maximum(valid_local - num_pos, 1)
    q = jnp.clip(n_neg_drawn.astype(jnp.float32) / pool, 1e-9, 1.0)
    # weight per sampled column: pos → 1, valid neg → 1/q, pad → 0
    weight = jnp.where(
        samp_pos, 1.0,
        jnp.where(samp_valid, 1.0 / q, 0.0))[None, :]

    neg_inf = jnp.float32(-1e30)
    masked_logits = jnp.where(weight > 0, logits, neg_inf)
    local_max = jnp.max(masked_logits, axis=-1)
    global_max = jax.lax.pmax(
        jax.lax.stop_gradient(local_max), axis_name)
    shifted = masked_logits - global_max[:, None]
    local_denom = jnp.sum(jnp.exp(shifted) * weight, axis=-1)
    denom = jax.lax.psum(local_denom, axis_name)
    local_target = jnp.sum(shifted * one_hot, axis=-1)
    tgt = jax.lax.psum(local_target, axis_name)
    nll = jnp.log(denom) - tgt
    return jnp.mean(nll)


# ---------------------------------------------------------------------------
# Class-sharded center loss (Wen et al. 2016 joint supervision). The
# (C, D) center table is the same shape class as the classifier, so it
# shards over the model axis identically; each sample's center lives on
# exactly one shard (the ownership mask above) and one tiny psum
# reassembles the per-sample distances. Single-device oracles:
# ops/losses.center_loss / center_update.
# ---------------------------------------------------------------------------


def _ownership(labels: jax.Array, c_local: int, axis_name: str):
    idx = jax.lax.axis_index(axis_name)
    local = labels - idx * c_local
    owned = (local >= 0) & (local < c_local)
    return jnp.where(owned, local, 0), owned


def sharded_center_loss(embeddings: jax.Array, c_shard: jax.Array,
                        labels: jax.Array,
                        axis_name: str = "model") -> jax.Array:
    """½·mean‖e_i − c_{y_i}‖² with centers sharded over ``axis_name``.

    ``embeddings``: (N, D) — the model-axis-gathered row batch (every
    shard of a data row passes identical rows). Centers are DETACHED
    (delta-rule training — see :func:`sharded_center_update`)."""
    c_local = c_shard.shape[0]
    safe, owned = _ownership(labels, c_local, axis_name)
    c = jax.lax.stop_gradient(c_shard)[safe]
    d = embeddings.astype(jnp.float32) - c
    per = jnp.sum(d * d, axis=-1) * owned.astype(jnp.float32)
    per = jax.lax.psum(per, axis_name)    # exactly one owner per sample
    return 0.5 * jnp.mean(per)


def sharded_center_update(embeddings: jax.Array, c_shard: jax.Array,
                          labels: jax.Array, *, data_axis: str,
                          model_axis: str = "model",
                          alpha: float = 0.5) -> jax.Array:
    """Delta-rule update of the local center shard.

    c_j ← c_j − α·Σ_{y_i=j}(c_j − e_i)/(1+n_j), with the segment sums
    taken over the GLOBAL batch: embeddings/labels are the model-axis-
    gathered row batch, and the (sum, count) statistics psum over
    ``data_axis`` so every data row applies the identical update
    (centers are replicated across data, sharded across model)."""
    e = jax.lax.stop_gradient(embeddings).astype(jnp.float32)
    c_local = c_shard.shape[0]
    safe, owned = _ownership(labels, c_local, model_axis)
    one_hot = jax.nn.one_hot(safe, c_local, dtype=jnp.float32)
    one_hot = one_hot * owned[:, None].astype(jnp.float32)
    counts = jax.lax.psum(jnp.sum(one_hot, axis=0), data_axis)   # (C_l,)
    sum_e = jax.lax.psum(one_hot.T @ e, data_axis)               # (C_l,D)
    delta = counts[:, None] * c_shard - sum_e
    return c_shard - alpha * delta / (1.0 + counts)[:, None]


def sharded_curricular_loss(embeddings: jax.Array, w_shard: jax.Array,
                            labels: jax.Array, cfg: MarginConfig,
                            t: jax.Array,
                            axis_name: str = "model",
                            total_classes: int | None = None,
                            subcenters: int = 1,
                            data_axis: str | None = None,
                            ) -> tuple[jax.Array, jax.Array]:
    """Class-sharded CurricularFace (ops/losses.curricular_loss is the
    single-device oracle). Extra collectives beyond the exact margin
    softmax: the target cosine lives on one shard, so a psum broadcasts
    it to every shard for the hard-negative test
    (cos θ_j > T_i → modulate by t' + cos θ_j).

    Update-then-use like the official code: r = mean target cosine
    (pmean'd over ``data_axis`` when given, so every device computes
    the GLOBAL batch statistic), t' = 0.01·r + 0.99·t, and the
    modulation uses t'. Returns ``(mean NLL over the local rows, t')``
    — the caller stores t' as the next step's state.
    """
    c_local = w_shard.shape[0] // subcenters
    safe_labels, owned = _ownership(labels, c_local, axis_name)
    one_hot = jax.nn.one_hot(safe_labels, c_local, dtype=jnp.float32)
    one_hot = one_hot * owned[:, None].astype(jnp.float32)

    cos = subcenter_pool(cosine_logits(embeddings, w_shard), subcenters)
    cos_c = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    # target cosine: exactly one owner per sample → psum assembles (N,)
    tgt_cos = jax.lax.psum(jnp.sum(cos_c * one_hot, axis=-1), axis_name)
    r = jnp.mean(jax.lax.stop_gradient(tgt_cos))
    if data_axis is not None:
        r = jax.lax.pmean(r, data_axis)
    t_new = 0.01 * r + 0.99 * t
    target = margined_target(tgt_cos, cfg)
    hard = cos_c > jax.lax.stop_gradient(target)[:, None]
    neg = jnp.where(hard, cos_c * (t_new + cos_c), cos_c)
    logits = cfg.scale * jnp.where(one_hot > 0, target[:, None], neg)
    return _masked_softmax_nll(logits, one_hot, total_classes,
                               axis_name), t_new
