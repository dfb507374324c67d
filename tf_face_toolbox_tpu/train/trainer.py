"""Distributed train step: shard_map + explicit psum gradient exchange.

Rebuilds the reference's multi-GPU tower loop (ref: upstream train.py
[UPSTREAM-K]; SURVEY.md §3.1) as SPMD over a (data, model) TPU mesh:

- The **backbone** is pure data-parallel over ALL devices (both mesh
  axes): each device forwards its own batch shard; parameter gradients
  are exchanged with an explicit ``psum``/``pmean`` that XLA lowers to an
  ICI all-reduce — the TPU-native replacement for the reference's
  "average_gradients on one device" tower idiom [TF1-IDIOM].
- The **margin-softmax head** is class-sharded over the ``model`` axis
  (Partial-FC style, SURVEY.md §2c TP row): embeddings are
  ``all_gather``ed across the model axis, each device computes logits
  against its classifier shard, and the softmax combines with pmax/psum
  (see parallel/sharded_softmax.py). With model=1 this degenerates to
  plain DP at zero cost.
- BatchNorm uses **per-replica batch statistics** (matches the tower
  reference's per-tower BN behaviorally — SURVEY.md §7 "hard parts");
  the *running* stats are pmean-synced so replicas never drift.
- The whole step — optional on-device augmentation (crop/flip/
  standardize), forward, loss, backward, collectives, optimizer — is ONE
  jitted program; the train state is donated so params update in place.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tf_face_toolbox_tpu.models import create_network, init_variables
from tf_face_toolbox_tpu.models.layers import l2_normalize as _l2n
from tf_face_toolbox_tpu.ops import preprocess as pp
from tf_face_toolbox_tpu.ops.losses import (
    AdaFaceConfig,
    MagFaceConfig,
    MarginConfig,
    adaface_margins,
    adaface_stats_init,
    batch_hard_triplet_loss,
    magface_margins,
)
from tf_face_toolbox_tpu.parallel import collectives
from tf_face_toolbox_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from tf_face_toolbox_tpu.parallel.sharded_softmax import (
    sampled_sharded_margin_softmax_loss,
    sharded_center_loss,
    sharded_center_update,
    sharded_curricular_loss,
    sharded_margin_softmax_loss,
)
from tf_face_toolbox_tpu.train.schedule import staircase
from tf_face_toolbox_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """All training hyperparameters (rebuild of the reference's tf.app.flags
    surface [TF1-IDIOM]; CLI bindings live per entry point — cli/train.py)."""
    network: str = "resnet_v1_50"
    stem: str = "face"          # "face" | "imagenet" | "space2depth"
    head_variant: str = "gap"
    # flatten-head dropout (ArcFace "E" head). Train-mode stochasticity
    # needs a 'dropout' PRNG stream: the trainer folds one from the same
    # per-device step RNG that drives augmentation.
    dropout_rate: float = 0.0
    # stochastic depth for the ViT family (models/vit.py; per-block
    # rate ramps to this value at the last block). ViT-only knob —
    # loudly refused for other networks.
    drop_path_rate: float = 0.0
    embedding_dim: int = 512
    num_classes: int = 10572          # CASIA-WebFace identity count
    image_size: int = 112
    global_batch: int = 256
    # optimizer (SGD + momentum, staircase LR — reference convention;
    # "adam"/"adamw"/"lars" available — lars for CONFIG_5-class batches)
    optimizer: str = "sgd"
    base_lr: float = 0.1
    # "staircase" (reference convention) or "cosine" (modern recipe;
    # needs lr_total_steps — the CLI defaults it to --num_steps)
    lr_schedule: str = "staircase"
    lr_boundaries: tuple[int, ...] = (100_000, 160_000, 220_000)
    lr_decay: float = 0.1
    lr_total_steps: int = 0
    warmup_steps: int = 0
    momentum: float = 0.9
    weight_decay: float = 5e-4
    # clip gradients to this global L2 norm before the optimizer
    # (0 = off). The norm is the TRUE global one — the model-sharded
    # classifier's shard norms are psum-combined first, so clipping is
    # mesh-invariant (an optax clip inside tx would see only the local
    # shard). Standard stabilizer for ViT/adamw recipes.
    grad_clip_norm: float = 0.0
    # margin softmax
    margin_scale: float = 64.0
    margin_m1: float = 1.0
    margin_m2: float = 0.0
    margin_m3: float = 0.35           # CosFace default
    # Norm-adaptive per-sample margins layered on the combined-margin
    # head: "fixed" (the m1/m2/m3 above — reference behavior),
    # "magface" (margin linear in ‖emb‖ + magnitude regularizer,
    # Meng et al. 2021), "adaface" (norm-as-quality-proxy margins with
    # EMA batch stats carried in TrainState.head_state, Kim et al.
    # 2022), "curricular" (CurricularFace, Huang et al. 2020:
    # hard-negative modulation with an EMA curriculum scalar t in
    # head_state; m2 is the ArcFace-style margin). magface/adaface use
    # m1/m2/m3 as the BASE the per-sample terms add to (set them 0 for
    # the papers' exact losses).
    margin_mode: str = "fixed"
    magface: MagFaceConfig = MagFaceConfig()
    adaface: AdaFaceConfig = AdaFaceConfig()
    # Sub-center ArcFace (Deng et al. 2020): K weight vectors per
    # identity, per-class cosine = max over K — noise-robust training
    # on unclean identity lists. The classifier becomes (C_pad·K, D),
    # class-major, so sharding/optimizer/checkpoint machinery is
    # untouched. Exact head only (sampled PFC refuses: uniform row
    # sampling would break class pooling).
    subcenters: int = 1
    # Auxiliary metric losses, ADDED to the margin loss (joint
    # supervision): center loss (Wen et al. 2016 — the reference era's
    # companion loss; centers shard over `model` like the classifier
    # and train by the delta rule) and batch-hard triplet (Hermans
    # et al. 2017 — FaceNet-era; mined within each data-row's batch,
    # the per-tower behavior; pair with balanced_batch_iterator).
    center_weight: float = 0.0
    center_alpha: float = 0.5
    triplet_weight: float = 0.0
    triplet_margin: float = 0.3
    # Sampled Partial-FC (An et al. 2021): fraction of each classifier
    # shard scored per step (1.0 = exact full softmax). At 10^6..10^7
    # identities the (N, C_local) logit block is the step's dominant
    # GEMM/HBM cost; 0.1 is the paper's accuracy-neutral setting. The
    # sampled denominator is importance-corrected (unbiased estimator
    # of the exact one) — parallel/sharded_softmax.py.
    pfc_sample_rate: float = 1.0
    # compute
    dtype: Any = jnp.float32          # jnp.bfloat16 on TPU
    augment: bool = True              # on-device crop/flip when input is u8
    crop_from: int = 120              # source size when augmenting
    # Random erasing (Zhong 2020) probability per image, applied after
    # standardization (0 = off). Occlusion robustness — masks/sunglasses.
    random_erase: float = 0.0
    # Gradient accumulation: split each device's batch into K
    # micro-batches, run forward+backward per micro inside a lax.scan
    # (activation memory scales with the MICRO batch), average the
    # grads, apply the optimizer once. Exactly equal to accum_steps=1
    # for BN-free models; with BN the micro-batches see sequential
    # batch statistics (the same behavioral note as DP-width changes).
    # Stateless losses only (fixed margins / distill / triplet —
    # triplet mines within each micro-batch); adaptive margin modes
    # and center loss carry per-STEP head state and refuse loudly.
    accum_steps: int = 1
    # Skip applying any step whose loss or global grad norm is
    # non-finite (bf16 overflow spike, a poisoned batch): params,
    # classifier, optimizer/EMA/BN/head state all hold; the step
    # counter still advances so the LR schedule and data position stay
    # in sync. The decision is global (loss and grad_norm are
    # mesh-combined) so every device skips in lockstep. The reference
    # era had no such guard — a NaN there corrupted the Saver state.
    skip_nonfinite: bool = False
    # input standardization: "per_image" (the reference's tf.image
    # chain) or "fixed" ((x-127.5)/127.5) — fine-tuning an imported
    # InsightFace-ecosystem checkpoint must train with the norm it
    # serves with (ops/preprocess.py fixed_standardization).
    input_norm: str = "per_image"
    # weight EMA (reference: tf.train.ExponentialMovingAverage; 0 = off)
    ema_decay: float = 0.0
    # Route augmentation through the fused Pallas input kernel (TPU;
    # the XLA chain is the fallback and the CPU-test path).
    pallas_input: bool = False
    # "qat": quantization-aware training — train forward fake-quantizes
    # convs + the inter-block stream onto the int8 grid (STE backward)
    # so static-int8 serving matches fp embeddings (models/layers.py).
    quantized: Any = False
    # Embedding-space distillation (deploy-a-small-net workflow): with
    # a teacher passed to make_train_step, the loss becomes
    #   alpha · mean(1 − cos(student, stop_grad(teacher)))
    #     + (1 − alpha) · margin_softmax
    # Cosine distillation keeps the student IN the teacher's embedding
    # space, so already-enrolled galleries need no re-extraction.
    # alpha=1 is pure distillation (no labels/classifier needed).
    distill_alpha: float = 1.0

    @property
    def margin(self) -> MarginConfig:
        return MarginConfig(scale=self.margin_scale, m1=self.margin_m1,
                            m2=self.margin_m2, m3=self.margin_m3)


def _padded_classes(num_classes: int, model_size: int) -> int:
    return -(-num_classes // model_size) * model_size


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Optimizer + staircase LR; L2 on conv/fc kernels + classifier.

    ``cfg.optimizer``: "sgd" (momentum SGD — the reference's choice
    [TF1-IDIOM] and the default), "adam"/"adamw", or "lars" (layerwise
    trust ratios — the large-batch option for CONFIG_5-class global
    batches where plain momentum needs impractical warmup).
    """
    def decay_mask(tree):
        def mask_path(path, leaf):
            names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            return "classifier" in names or names[-1] == "kernel"
        return jax.tree_util.tree_map_with_path(mask_path, tree)

    if cfg.lr_schedule == "cosine":
        from tf_face_toolbox_tpu.train.schedule import cosine
        sched = cosine(cfg.base_lr, cfg.lr_total_steps,
                       cfg.warmup_steps)
    elif cfg.lr_schedule == "staircase":
        sched = staircase(cfg.base_lr, cfg.lr_boundaries, cfg.lr_decay,
                          cfg.warmup_steps)
    else:
        raise ValueError(f"unknown lr_schedule '{cfg.lr_schedule}'; "
                         "have staircase|cosine")
    name = cfg.optimizer
    if name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask),
            optax.sgd(sched, momentum=cfg.momentum))
    elif name in ("adam", "adamw"):
        # adamw applies decay inside the update (decoupled); plain adam
        # keeps the SGD-style L2-on-kernels convention
        if name == "adamw":
            tx = optax.adamw(sched, weight_decay=cfg.weight_decay,
                             mask=decay_mask)
        else:
            tx = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay,
                                          mask=decay_mask),
                optax.adam(sched))
    elif name == "lars":
        tx = optax.lars(sched, weight_decay=cfg.weight_decay,
                        weight_decay_mask=decay_mask,
                        momentum=cfg.momentum)
    else:
        raise ValueError(f"unknown optimizer '{name}'; "
                         "have sgd|adam|adamw|lars")
    return tx, sched


def create_train_state(cfg: TrainConfig, rng: jax.Array,
                       mesh: Mesh, net=None) -> tuple[TrainState, Any]:
    """Initialize params / classifier / optimizer state (host-side).

    Returns (state, net). Classifier rows are padded to a multiple of the
    model-axis size; sharded_margin_softmax_loss masks the pads exactly.
    ``net`` lets tests inject a tiny custom backbone.
    """
    if net is None:
        kwargs = {}
        if cfg.network.startswith(("resnet", "se_resnet", "resnext",
                                   "se_resnext", "densenet",
                                   "dct_resnet", "iresnet",
                                   "mobilefacenet", "dct_vit")):
            kwargs = dict(stem=cfg.stem, head_variant=cfg.head_variant,
                          dropout_rate=cfg.dropout_rate)
        if cfg.drop_path_rate > 0:
            if not cfg.network.startswith("dct_vit"):
                raise ValueError(
                    "drop_path_rate is a ViT-family knob "
                    "(stochastic depth over transformer blocks); "
                    f"network={cfg.network!r} has no block drop path")
            kwargs["drop_path_rate"] = cfg.drop_path_rate
        if cfg.quantized:
            kwargs["quantized"] = cfg.quantized
        net = create_network(cfg.network, embedding_dim=cfg.embedding_dim,
                             dtype=cfg.dtype, **kwargs)
    k_init, k_cls, k_step = jax.random.split(rng, 3)
    variables = init_variables(
        net, k_init, (1, cfg.image_size, cfg.image_size, 3))
    variables = dict(variables)
    variables.setdefault("batch_stats", {})
    c_pad = _padded_classes(cfg.num_classes, mesh.shape[MODEL_AXIS])
    if cfg.subcenters < 1:
        raise ValueError(f"subcenters must be >= 1 (got {cfg.subcenters})")
    classifier = jax.random.normal(
        k_cls, (c_pad * cfg.subcenters, cfg.embedding_dim),
        jnp.float32) * 0.01
    tx, _ = make_optimizer(cfg)
    opt_state = tx.init({"params": variables["params"],
                         "classifier": classifier})
    head_state = {}
    if cfg.margin_mode == "adaface":
        head_state["adaface"] = adaface_stats_init()
    elif cfg.margin_mode == "curricular":
        from tf_face_toolbox_tpu.ops.losses import curricular_t_init
        head_state["curricular"] = curricular_t_init()
    elif cfg.margin_mode not in ("fixed", "magface"):
        raise ValueError(f"unknown margin_mode '{cfg.margin_mode}'; "
                         "have fixed|magface|adaface|curricular")
    if cfg.center_weight > 0:
        # Zero-init center table, same padded class count / model-axis
        # sharding as the classifier (state_pspecs keys on the name).
        head_state["centers"] = jnp.zeros(
            (c_pad, cfg.embedding_dim), jnp.float32)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        classifier=classifier,
        opt_state=opt_state,
        rng=jax.random.key_data(k_step),
        ema_params=(jax.tree.map(jnp.copy, variables["params"])
                    if cfg.ema_decay > 0 else None),
        head_state=head_state or None,
    )
    return state, net


def state_pspecs(state: TrainState) -> TrainState:
    """PartitionSpecs for every leaf: classifier (and its optimizer
    momentum) shard over `model`; everything else is replicated."""
    def spec(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", "")))
                 for p in path]
        if (("classifier" in names or "centers" in names)
                and getattr(leaf, "ndim", 0) == 2):
            return P(MODEL_AXIS, None)
        return P()
    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place every leaf on ``mesh`` with its canonical sharding
    (classifier over `model`, rest replicated). Needed after a
    checkpoint restore, whose arrays come back committed to one device."""
    from jax.sharding import NamedSharding

    shardings = jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                             state_pspecs(state),
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(state, shardings)


def make_train_step(net, cfg: TrainConfig, mesh: Mesh,
                    state: TrainState, *,
                    input_format: str = "u8",
                    teacher: tuple[Any, Any] | None = None) -> Callable:
    """Build the jitted SPMD train step.

    Returns ``step_fn(state, images, labels) -> (state, metrics)`` where
    ``images`` is the GLOBAL batch — (B, S, S, 3) uint8 when
    cfg.augment (S = cfg.crop_from) else float32 standardized at
    cfg.image_size — and ``labels`` is (B,) int32 global identity ids.

    ``input_format="dct"``: ``images`` is instead the (coef, qtab)
    tuple from ``native_dct_batch_iterator``; the step completes the
    JPEG decode on-device (ops/jpeg_tpu.decode_dct) before the augment
    chain, so the host only entropy-decodes (docs/design.md).

    ``teacher``: ``(teacher_net, teacher_variables)`` switches the loss
    to embedding-space distillation (weighted by ``cfg.distill_alpha``):
    the frozen teacher forwards the SAME augmented views in eval mode
    and the student minimizes 1 − cosine against it. The teacher tree
    rides along as a replicated (non-donated) argument — it is
    never updated.
    """
    if input_format == "dct" and not cfg.augment:
        raise ValueError(
            "input_format='dct' decodes to uint8 crop_from² frames — "
            "it requires the augment preprocessing chain (cfg.augment)")
    distilling = teacher is not None
    if distilling:
        teacher_net, teacher_vars = teacher
        alpha = float(cfg.distill_alpha)
        if not 0.0 < alpha <= 1.0:
            raise ValueError(
                f"distill_alpha must be in (0, 1] with a teacher; "
                f"got {alpha}")
        if alpha == 1.0 and (cfg.margin_mode != "fixed"
                             or cfg.center_weight > 0
                             or cfg.triplet_weight > 0):
            raise ValueError(
                "pure distillation (distill_alpha=1) skips the margin "
                "branch entirely — margin_mode/center_weight/"
                "triplet_weight would be silently dead; set "
                "distill_alpha<1 to mix them")
    else:
        alpha = 0.0
    if cfg.pfc_sample_rate < 1.0 and cfg.subcenters > 1:
        raise ValueError(
            "sampled Partial-FC (pfc_sample_rate < 1) cannot pool "
            "sub-centers: uniform row sampling would split classes — "
            "use the exact head (pfc_sample_rate=1) with subcenters")
    if cfg.pfc_sample_rate < 1.0 and cfg.margin_mode == "curricular":
        raise ValueError(
            "sampled Partial-FC cannot combine with curricular: the "
            "hard-negative modulation is defined over ALL negatives — "
            "use the exact head (pfc_sample_rate=1)")
    if cfg.accum_steps > 1:
        if cfg.margin_mode != "fixed" or cfg.center_weight > 0:
            raise ValueError(
                "accum_steps>1 supports stateless losses only: "
                "adaptive margin modes (magface/adaface/curricular) "
                "and center loss update per-STEP head state, which a "
                "micro-batch scan would apply K times per step")
        n_local = cfg.global_batch // (
            mesh.shape[DATA_AXIS] * mesh.shape[MODEL_AXIS])
        if n_local % cfg.accum_steps:
            raise ValueError(
                f"per-device batch {n_local} not divisible by "
                f"accum_steps {cfg.accum_steps}")
    tx, sched = make_optimizer(cfg)
    margin = cfg.margin
    num_classes = cfg.num_classes
    batch_axes = (DATA_AXIS, MODEL_AXIS)
    # Pallas compiles on TPU; CPU (tests) runs the interpreter.
    pallas_interpret = jax.default_backend() == "cpu"
    # The fused Pallas kernel bakes per-image standardization (its win
    # is fusing that reduction); fixed norm is a pure affine XLA fuses
    # by itself — fall back to the XLA chain, semantics unchanged.
    use_pallas = cfg.input_norm == "per_image"
    if cfg.pallas_input and not use_pallas:
        from absl import logging
        logging.warning("pallas_input: fused kernel covers per_image "
                        "standardization only; input_norm=%s uses the "
                        "XLA augment chain", cfg.input_norm)

    def device_step(state: TrainState, images, labels, tvars):
        # Per-device, per-step RNG: fold step and device position into
        # the state key → reproducible augmentation independent of mesh.
        di = jax.lax.axis_index(DATA_AXIS)
        mi = jax.lax.axis_index(MODEL_AXIS)
        dev = di * mesh.shape[MODEL_AXIS] + mi
        step_rng = jax.random.fold_in(
            jax.random.wrap_key_data(state.rng), state.step)
        dev_rng = jax.random.fold_in(step_rng, dev)

        if cfg.augment and cfg.pallas_input and use_pallas:
            # random crop (XLA dynamic_slice) → fused Pallas
            # flip+standardize (identity resize ⇒ the width matmul IS
            # the flip). One HBM pass for the whole augment tail.
            from tf_face_toolbox_tpu.ops.pallas_preprocess import (
                fused_preprocess)
            n, h, w, _ = images.shape
            kc, kf = jax.random.split(dev_rng)
            offs = pp.random_offsets(kc, n, h, w,
                                     cfg.image_size, cfg.image_size)
            cropped = pp.crop_at(images, offs,
                                 cfg.image_size, cfg.image_size)
            flips = jax.random.bernoulli(kf, 0.5, (n,))
            x = fused_preprocess(cropped, flips,
                                 out_h=cfg.image_size,
                                 out_w=cfg.image_size,
                                 out_dtype=cfg.dtype,
                                 interpret=pallas_interpret)
        elif cfg.augment:
            x = pp.preprocess_train(dev_rng, images,
                                    cfg.image_size, cfg.image_size,
                                    cfg.input_norm)
        else:
            x = images
        if cfg.augment and cfg.random_erase > 0:
            # After standardization, shared by both augment branches
            # (the Pallas kernel ends at standardize; the erase mask
            # fuses into the XLA tail). Distinct tag keeps the crop/
            # flip streams byte-identical whether or not erasing is on.
            x = pp.random_erase(jax.random.fold_in(dev_rng, 0xE5A5E),
                                x, cfg.random_erase)
        x = x.astype(cfg.dtype)

        # distinct tag keeps the augmentation streams (kc/kf above)
        # byte-identical whether or not dropout is enabled
        drop_rng = jax.random.fold_in(dev_rng, 0x0D12)

        def grads_for(xb, lb, bs, mrng):
            """Forward+backward over one (micro-)batch against the
            running stats ``bs``; returns value_and_grad's output."""
            def loss_fn(params, classifier):
                emb, updates = net.apply(
                    {"params": params, "batch_stats": bs},
                    xb, train=True, mutable=["batch_stats"],
                    rngs={"dropout": mrng})
                updates = dict(updates)
                updates.setdefault("batch_stats", {})
                emb = emb.astype(jnp.float32)
                total = jnp.float32(0.0)
                parts = {}
                aux_head = {}
                if distilling:
                    # Frozen teacher on the SAME augmented views, eval
                    # mode. Local-shard mean; the ÷ model-size below
                    # makes the psum-over-model gradient exchange
                    # reconstruct the row mean exactly (same algebra as
                    # the margin path).
                    t_emb = jax.lax.stop_gradient(
                        teacher_net.apply(
                            tvars, xb, train=False).astype(jnp.float32))
                    cos = jnp.sum(_l2n(emb) * _l2n(t_emb), axis=-1)
                    parts["distill"] = jnp.mean(1.0 - cos)
                    total = total + alpha * parts["distill"] \
                        / mesh.shape[MODEL_AXIS]
                if not distilling or alpha < 1.0:
                    total, parts, aux_head = margin_branch(
                        emb, lb, classifier, total, parts, aux_head)
                return total, (updates["batch_stats"], parts, aux_head)

            return jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params, state.classifier)

        def margin_branch(emb, lb, classifier, total, parts, aux_head):
                # Partial-FC: gather the data-row's embeddings across
                # the model axis so each class shard scores every
                # sample.
                emb_g = jax.lax.all_gather(emb, MODEL_AXIS, tiled=True)
                lab_g = jax.lax.all_gather(lb, MODEL_AXIS,
                                           tiled=True)
                # Norm-adaptive per-sample margins (model-axis devices
                # compute identical values from the identical emb_g, so
                # every shard passes the same arrays — the contract of
                # local_margin_logits).
                extra_m2 = extra_m3 = None
                if cfg.margin_mode == "magface":
                    extra_m2, g_reg = magface_margins(emb_g, cfg.magface)
                    parts["magface_reg"] = g_reg
                    total = total + cfg.magface.lambda_g * g_reg \
                        / mesh.shape[MODEL_AXIS]
                elif cfg.margin_mode == "adaface":
                    safe = jnp.clip(jnp.linalg.norm(
                        jax.lax.stop_gradient(emb_g), axis=-1),
                        1e-3, 100.0)
                    # GLOBAL-batch norm moments: psum over data (model
                    # rows are identical), two-pass for f32 stability,
                    # ddof=1 to match the official torch.std.
                    n_g = jnp.float32(
                        safe.shape[0] * mesh.shape[DATA_AXIS])
                    mean_g = jax.lax.psum(jnp.sum(safe), DATA_AXIS) / n_g
                    ss = jax.lax.psum(
                        jnp.sum((safe - mean_g) ** 2), DATA_AXIS)
                    std_g = jnp.sqrt(ss / jnp.maximum(n_g - 1.0, 1.0))
                    extra_m2, extra_m3, aux_head["adaface"] = \
                        adaface_margins(
                            safe, state.head_state["adaface"],
                            cfg.adaface,
                            batch_mean=mean_g, batch_std=std_g)
                if cfg.center_weight > 0:
                    c_loss = sharded_center_loss(
                        emb_g, state.head_state["centers"], lab_g,
                        MODEL_AXIS)
                    parts["center"] = c_loss
                    total = total + cfg.center_weight * c_loss \
                        / mesh.shape[MODEL_AXIS]
                    aux_head["emb_g"] = jax.lax.stop_gradient(emb_g)
                    aux_head["lab_g"] = lab_g
                if cfg.triplet_weight > 0:
                    # Mined within the data row's gathered batch — the
                    # per-tower mining pool of the reference era.
                    t_loss = batch_hard_triplet_loss(
                        emb_g, lab_g, cfg.triplet_margin)
                    parts["triplet"] = t_loss
                    total = total + cfg.triplet_weight * t_loss \
                        / mesh.shape[MODEL_AXIS]
                if cfg.margin_mode == "curricular":
                    m_loss, t_new = sharded_curricular_loss(
                        emb_g, classifier, lab_g, margin,
                        state.head_state["curricular"]["t"],
                        axis_name=MODEL_AXIS, total_classes=num_classes,
                        subcenters=cfg.subcenters, data_axis=DATA_AXIS)
                    aux_head["curricular"] = {"t": t_new}
                elif cfg.pfc_sample_rate < 1.0:
                    import math
                    c_local = classifier.shape[0]
                    # positives come from the data-gathered GLOBAL
                    # batch (data_axis below), so the budget floor is
                    # the global pool, not the per-rank rows
                    n_global = lab_g.shape[0] * mesh.shape[DATA_AXIS]
                    budget = min(
                        max(math.ceil(cfg.pfc_sample_rate * c_local),
                            n_global),
                        c_local)
                    # one sampling key per STEP, shared across the
                    # WHOLE mesh (fold step, not device — every shard
                    # of a data row must draw one coherent sample set,
                    # and every data rank the SAME set so the compact
                    # classifier-gradient exchange is well-defined)
                    pfc_key = jax.random.fold_in(step_rng, 0x9FC)
                    m_loss = sampled_sharded_margin_softmax_loss(
                        emb_g, classifier, lab_g, margin, pfc_key,
                        budget, axis_name=MODEL_AXIS,
                        total_classes=num_classes,
                        extra_m2=extra_m2, extra_m3=extra_m3,
                        data_axis=DATA_AXIS)
                else:
                    m_loss = sharded_margin_softmax_loss(
                        emb_g, classifier, lab_g, margin,
                        axis_name=MODEL_AXIS, total_classes=num_classes,
                        extra_m2=extra_m2, extra_m3=extra_m3,
                        subcenters=cfg.subcenters)
                parts["margin"] = m_loss
                # ÷ model-axis size: every device in a data row computes
                # the SAME row loss, and the collective transposes
                # (all_gather → psum_scatter, psum → broadcast)
                # accumulate all replicas' cotangents — so raw grads
                # come out ∂(Σ_j L_row)/∂· = model_size × ∂L_row/∂·.
                # Normalizing the loss here makes psum-over-model of the
                # param grads exact and the classifier grad exact with
                # no further scaling (verified against the single-device
                # oracle in tests/test_parallel.py).
                total = total + (1.0 - alpha) * m_loss \
                    / mesh.shape[MODEL_AXIS]
                return total, parts, aux_head

        # (the scalar loss value is recomposed from the pmean'd parts
        # below — grads_for's own total is only autodiff's primal)
        if cfg.accum_steps == 1:
            (_, (new_bs, parts, aux_head)), (g_params, g_cls) = \
                grads_for(x, labels, state.batch_stats, drop_rng)
        else:
            # Micro-batch accumulation: forward+backward compiles ONCE
            # and scans K times — activation memory is the micro
            # batch's; grads average to exactly the full-batch mean
            # (equal micro sizes), BN stats advance sequentially.
            k = cfg.accum_steps
            n_loc = x.shape[0]
            xm = x.reshape(k, n_loc // k, *x.shape[1:])
            lm = labels.reshape(k, n_loc // k)
            mrngs = jax.vmap(
                lambda i: jax.random.fold_in(drop_rng, i))(jnp.arange(k))

            def micro(carry, inp):
                bs, gp, gc = carry
                xb, lb, mrng = inp
                (_, (nbs, parts, _a)), (g1, g2) = grads_for(
                    xb, lb, bs, mrng)
                gp = jax.tree.map(jnp.add, gp, g1)
                return (nbs, gp, gc + g2), parts

            init = (state.batch_stats,
                    jax.tree.map(jnp.zeros_like, state.params),
                    jnp.zeros_like(state.classifier))
            (new_bs, gp_sum, gc_sum), parts_k = jax.lax.scan(
                micro, init, (xm, lm, mrngs))
            g_params = jax.tree.map(lambda g: g / k, gp_sum)
            g_cls = gc_sum / k
            parts = jax.tree.map(lambda p: jnp.mean(p, axis=0), parts_k)
            aux_head = {}

        # --- explicit gradient exchange (the DP psum of SURVEY §2d) ---
        # Row loss is a mean over the row's samples; model-axis devices
        # hold complementary partials of it (classifier shards live on
        # one model column each: no model collective for g_cls).
        g_params = collectives.sync_gradients(g_params)
        if cfg.pfc_sample_rate < 1.0:
            # sampled PFC already pmean'd the COMPACT (budget, D)
            # classifier cotangent over `data` inside its VJP
            # (_gather_compact_sync) — reducing the full shard again
            # would both double-count and move C_local·D bytes, the
            # exact collective VERDICT r4 #2 flagged.
            pass
        else:
            g_cls = collectives.sync_classifier_gradients(g_cls)
        # Metric means over the WHOLE mesh: the distill part is a local-
        # shard mean (differs across model columns), the margin part is
        # row-replicated — pmean over both axes is exact for both.
        parts = jax.lax.pmean(parts, (DATA_AXIS, MODEL_AXIS))
        if distilling:
            loss = alpha * parts["distill"] + (
                (1.0 - alpha) * parts["margin"] if alpha < 1.0 else 0.0)
        else:
            loss = parts["margin"]
        # Auxiliary terms carry their own weights (independent of the
        # distill mix) — the reported loss is the optimized objective.
        if "magface_reg" in parts:
            loss = loss + cfg.magface.lambda_g * parts["magface_reg"]
        if "center" in parts:
            loss = loss + cfg.center_weight * parts["center"]
        if "triplet" in parts:
            loss = loss + cfg.triplet_weight * parts["triplet"]
        new_bs = collectives.sync_batch_stats(new_bs)

        # Loss-head auxiliary state: AdaFace EMA norm stats straight
        # from the (already globally-combined) aux; center table by the
        # delta rule — outside autodiff, like BN running stats.
        new_head = state.head_state
        if new_head is not None:
            new_head = dict(new_head)
            if "adaface" in aux_head:
                new_head["adaface"] = aux_head["adaface"]
            if "curricular" in aux_head:
                new_head["curricular"] = aux_head["curricular"]
            if "emb_g" in aux_head:
                new_head["centers"] = sharded_center_update(
                    aux_head["emb_g"], new_head["centers"],
                    aux_head["lab_g"], data_axis=DATA_AXIS,
                    model_axis=MODEL_AXIS, alpha=cfg.center_alpha)

        # Global grad norm: classifier lives in shards across `model`,
        # so combine squared norms before the sqrt.
        sq = (optax.global_norm(g_params) ** 2 +
              jax.lax.psum(jnp.sum(jnp.square(g_cls)), MODEL_AXIS))
        grad_norm = jnp.sqrt(sq)

        grads = {"params": g_params, "classifier": g_cls}
        if cfg.grad_clip_norm > 0:
            scale = jnp.minimum(
                1.0, cfg.grad_clip_norm / jnp.maximum(grad_norm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(
            grads, state.opt_state,
            {"params": state.params, "classifier": state.classifier})
        new_vars = optax.apply_updates(
            {"params": state.params, "classifier": state.classifier},
            updates)

        new_ema = state.ema_params
        if cfg.ema_decay > 0:
            d = cfg.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p,
                state.ema_params, new_vars["params"])

        ok = jnp.bool_(True)
        if cfg.skip_nonfinite:
            # grad_norm is the global norm over every grad leaf, so a
            # single NaN/Inf anywhere poisons it — one scalar test
            # covers the whole tree. Gate everything derived from this
            # batch; only the step counter moves on a skip.
            ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

            def keep(new, old):
                return jax.tree.map(
                    lambda n, o: jnp.where(ok, n, o), new, old)

            new_vars = keep(new_vars, {"params": state.params,
                                       "classifier": state.classifier})
            new_opt = keep(new_opt, state.opt_state)
            new_bs = keep(new_bs, state.batch_stats)
            if new_ema is not None:
                new_ema = keep(new_ema, state.ema_params)
            if new_head is not None:
                new_head = keep(new_head, state.head_state)

        new_state = state.replace(
            step=state.step + 1,
            params=new_vars["params"],
            batch_stats=new_bs,
            classifier=new_vars["classifier"],
            opt_state=new_opt,
            ema_params=new_ema,
            head_state=new_head,
        )
        metrics = {
            "loss": loss,
            "learning_rate": sched(state.step),
            "grad_norm": grad_norm,   # pre-clip, the diagnostic one
        }
        if cfg.skip_nonfinite:
            metrics["skipped_nonfinite"] = 1.0 - ok.astype(jnp.float32)
        if distilling:
            metrics["distill_loss"] = parts["distill"]
            if alpha < 1.0:
                metrics["margin_loss"] = parts["margin"]
        for k in ("center", "triplet", "magface_reg"):
            if k in parts:
                metrics[f"{k}_loss"] = parts[k]
        if new_head is not None and "adaface" in new_head:
            metrics["adaface_norm_mean"] = new_head["adaface"]["norm_mean"]
        if new_head is not None and "curricular" in new_head:
            metrics["curricular_t"] = new_head["curricular"]["t"]
        return new_state, metrics

    specs = state_pspecs(state)
    img_spec = P(batch_axes, None, None, None)
    step_fn = shard_map(
        device_step, mesh=mesh,
        in_specs=(specs, img_spec, P(batch_axes), P()),
        out_specs=(specs, P()),
        # Replication of the loss/params across `model` happens through
        # collectives the static VMA checker can't see through.
        check_vma=False,
    )
    jitted = jax.jit(step_fn, donate_argnums=(0,))
    # Bind the (frozen, replicated) teacher tree so callers keep the
    # uniform step_fn(state, images, labels) signature.
    bound_tvars = teacher_vars if distilling else {}

    def u8_step(state, images, labels):
        return jitted(state, images, labels, bound_tvars)

    if input_format != "dct":
        return u8_step

    # DCT front-end runs as its OWN small jit, not inside the shard_map
    # program: the big train program stays byte-identical to the u8
    # path (same compile cache entry — folding the decode in was
    # measured to blow the XLA compile from minutes to >10 min on the
    # tunnel), while decode_dct itself compiles in <1s and its batch
    # sharding propagates from the input arrays. The u8 frames it
    # materializes are 120²x3 ≈ 43 KB/face — negligible HBM traffic
    # next to the 45.6 GB train step (docs/design.md).
    from tf_face_toolbox_tpu.ops.jpeg_tpu import decode_dct

    def dct_step(state: TrainState, images, labels):
        return u8_step(state, decode_dct(*images), labels)

    return dct_step
