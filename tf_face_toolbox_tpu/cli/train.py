"""Training CLI.

Rebuild of the reference's ``train.py`` flag surface (ref: upstream
train.py tf.app.flags [TF1-IDIOM]): network name, LR schedule, batch,
device counts, data path, train dir — plus the TPU-mesh knobs that
replace ``--num_gpus``.

Examples:
    # CASIA-shaped run on all local devices, CosFace, ResNet-50
    python -m tf_face_toolbox_tpu.cli.train \
        --data=/data/casia.faceshard --train_dir=/tmp/run1 \
        --network=resnet_v1_50 --global_batch=512 --margin=cosface

    # smoke test on synthetic data
    python -m tf_face_toolbox_tpu.cli.train --data=synthetic \
        --num_steps=20 --global_batch=32 --num_classes=10
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("data", "synthetic",
                    "FaceShard path, or 'synthetic' for random data; "
                    "a comma-separated list trains a weighted online "
                    "MIXTURE of shards with disjoint identity spaces "
                    "(labels offset per source — see --data_weights)")
flags.DEFINE_string("data_weights", "",
                    "comma floats, one per --data shard: relative "
                    "per-step sampling weights of the mixture "
                    "(default equal)")
flags.DEFINE_string("train_dir", "", "checkpoint/summary directory")
flags.DEFINE_string("network", "resnet_v1_50", "backbone name")
flags.DEFINE_enum("stem", "face", ["face", "imagenet", "space2depth"],
                  "backbone stem: face=3x3/s1 (accuracy), imagenet="
                  "7x7/s2+pool (throughput), space2depth=TResNet-style")
flags.DEFINE_enum("head", "gap", ["gap", "flatten"],
                  "embedding head variant")
flags.DEFINE_float("dropout", 0.0,
                   "flatten-head dropout rate (train-mode only)")
flags.DEFINE_float("drop_path", 0.0,
                   "stochastic depth for the ViT family: per-block "
                   "branch-drop rate ramping to this value at the "
                   "last block (train-mode only)")
flags.DEFINE_integer("embedding_dim", 512, "embedding size")
flags.DEFINE_integer("num_classes", 0,
                     "identity count (0 = infer from data)")
flags.DEFINE_integer("image_size", 112, "train crop size")
flags.DEFINE_integer("crop_from", 0,
                     "source image size (0 = image_size + 8)")
flags.DEFINE_integer("global_batch", 256, "global batch size")
flags.DEFINE_integer("num_steps", 200_000, "total train steps")
flags.DEFINE_enum("lr_schedule", "staircase", ["staircase", "cosine"],
                  "LR decay shape: staircase (the reference "
                  "convention, --lr_boundaries/--lr_decay) or cosine "
                  "(half-cosine to 0 over --num_steps)")
flags.DEFINE_enum("optimizer", "sgd", ["sgd", "adam", "adamw", "lars"],
                  "sgd = momentum SGD (reference convention); lars = "
                  "layerwise trust ratios for very large global batches")
flags.DEFINE_float("base_lr", 0.1, "initial learning rate")
flags.DEFINE_list("lr_boundaries", ["100000", "160000", "220000"],
                  "staircase decay steps")
flags.DEFINE_float("lr_decay", 0.1, "decay factor per boundary")
flags.DEFINE_integer("warmup_steps", 0, "linear LR warmup steps")
flags.DEFINE_float("momentum", 0.9, "SGD momentum")
flags.DEFINE_float("weight_decay", 5e-4, "L2 on kernels+classifier")
flags.DEFINE_float("grad_clip_norm", 0.0,
                   "clip gradients to this global L2 norm before the "
                   "optimizer (0 = off; the classifier's shard norms "
                   "are psum-combined first, so clipping is "
                   "mesh-invariant). Standard ViT/adamw stabilizer")
flags.DEFINE_bool("skip_nonfinite", False,
                  "skip applying any step whose loss/grad norm is "
                  "non-finite (bf16 spike, poisoned batch): all state "
                  "holds and the step counter advances. The loop logs "
                  "a cumulative skipped_nonfinite_total at each log "
                  "point and aborts after --max_consecutive_skips "
                  "consecutive skips (a diverged run must not skip "
                  "forever)")
flags.DEFINE_integer("max_consecutive_skips", 100,
                     "with --skip_nonfinite: raise after this many "
                     "CONSECUTIVE skipped steps — the run has "
                     "diverged, not hit a transient spike (0 = never "
                     "abort, counting still logs)")
flags.DEFINE_enum("margin", "cosface",
                  ["softmax", "arcface", "cosface", "sphereface",
                   "magface", "adaface", "curricular"],
                  "margin-softmax variant. magface/adaface are the "
                  "norm-adaptive per-sample families (Meng 2021 / "
                  "Kim 2022) layered on zero base margins; curricular "
                  "(Huang 2020) modulates hard negatives with an EMA "
                  "curriculum parameter over an ArcFace margin")
flags.DEFINE_float("margin_scale", 64.0, "logit scale s")
flags.DEFINE_float("margin_value", -1.0,
                   "margin (-1 = variant default)")
flags.DEFINE_float("magface_la", 10.0, "MagFace magnitude lower bound")
flags.DEFINE_float("magface_ua", 110.0, "MagFace magnitude upper bound")
flags.DEFINE_float("magface_lm", 0.45, "MagFace margin at l_a")
flags.DEFINE_float("magface_um", 0.8, "MagFace margin at u_a")
flags.DEFINE_float("magface_lambda_g", 35.0,
                   "MagFace magnitude-regularizer weight")
flags.DEFINE_integer("subcenters", 1,
                     "sub-center ArcFace K (Deng 2020): K weight "
                     "vectors per identity, per-class cosine = max "
                     "over K — noise-robust training on unclean "
                     "identity lists. Exact head only "
                     "(incompatible with --pfc_sample_rate<1)")
flags.DEFINE_float("adaface_m", 0.4, "AdaFace margin magnitude")
flags.DEFINE_float("adaface_h", 0.333, "AdaFace norm concentration")
flags.DEFINE_float("center_loss", 0.0,
                   "center-loss weight λ (Wen et al. 2016 joint "
                   "supervision; 0 = off). Centers shard over the "
                   "model axis like the classifier")
flags.DEFINE_float("center_alpha", 0.5, "center delta-rule step size")
flags.DEFINE_float("triplet_loss", 0.0,
                   "batch-hard triplet weight (Hermans 2017; 0 = off). "
                   "Mined within each data row's batch — pair with "
                   "--balanced_pk for guaranteed positives")
flags.DEFINE_float("triplet_margin", 0.3, "triplet margin")
flags.DEFINE_string("balanced_pk", "",
                    "identity-balanced P×K batching: 'P,K' with "
                    "P·K = the per-host batch. The metric-learning "
                    "sampler (data/pipeline.balanced_batch_iterator): "
                    "every batch holds K images of each of P ids, so "
                    "triplet/center losses always see positives. "
                    "Python loader only")
flags.DEFINE_float("pfc_sample_rate", 1.0,
                   "sampled Partial-FC: fraction of each classifier "
                   "shard scored per step (1.0 = exact; 0.1 = the "
                   "An et al. 2021 accuracy-neutral setting for "
                   "10^5..10^7 identities)")
flags.DEFINE_integer("mesh_model", 1,
                     "model-axis size (class-sharded head; Partial-FC)")
flags.DEFINE_integer("mesh_slices", 0,
                     "TPU slices (multi-slice pods): 0 = auto-detect "
                     "from device slice_index. >1 orders the data axis "
                     "slice-major so gradient all-reduces decompose "
                     "into ICI within each slice + one DCN exchange "
                     "across (parallel/mesh.create_multislice_mesh)")
flags.DEFINE_bool("bf16", True, "bfloat16 compute")
flags.DEFINE_integer("save_every", 1000, "checkpoint cadence")
flags.DEFINE_integer("log_every", 100, "metric log cadence")
flags.DEFINE_integer("seed", 0, "init/data seed")
flags.DEFINE_enum("loader", "auto",
                  ["auto", "native", "python", "native_dct"],
                  "host decode path: native C++ pool or Python "
                  "threads; native_dct = entropy-decode only, the "
                  "train step finishes the JPEG on-device (needs a "
                  "cli.pack --recode_size=<crop_from> shard)")
flags.DEFINE_string("finetune_from", "",
                    "warm-start source: a previous run's train_dir or "
                    "an interop variables .npz — backbone params + BN "
                    "stats are grafted in, classifier/optimizer/step "
                    "start fresh (the slim-era checkpoint_exclude_"
                    "scopes workflow). Ignored when train_dir already "
                    "holds a checkpoint (resume wins).")
flags.DEFINE_bool("finetune_use_ema", False,
                  "warm-start from the source checkpoint's EMA weights")
flags.DEFINE_float("ema_decay", 0.0,
                   "weight EMA decay (0 = off; reference-era 0.999/0.9999)")
flags.DEFINE_string("distill_from", "",
                    "embedding-space distillation teacher: a trained "
                    "run's train_dir or an interop variables .npz. The "
                    "student minimizes 1-cos against the frozen "
                    "teacher's embeddings (same space ⇒ enrolled "
                    "galleries keep working), mixed with the margin "
                    "loss by --distill_alpha")
flags.DEFINE_string("distill_network", "resnet_v1_50",
                    "teacher backbone name")
flags.DEFINE_enum("distill_stem", "face",
                  ["face", "imagenet", "space2depth"], "teacher stem")
flags.DEFINE_enum("distill_head", "gap", ["gap", "flatten"],
                  "teacher embedding head")
flags.DEFINE_float("distill_alpha", 1.0,
                   "distillation weight: 1.0 = pure embedding "
                   "distillation (labels unused), <1 mixes in "
                   "(1-alpha) x margin softmax")
flags.DEFINE_bool("distill_use_ema", False,
                  "distill from the teacher checkpoint's EMA weights")
flags.DEFINE_bool("pallas_input", False,
                  "fused Pallas augmentation kernel (TPU)")
flags.DEFINE_integer("accum_steps", 1,
                     "gradient accumulation: K micro-batches per "
                     "optimizer step inside the compiled step "
                     "(activation memory scales with batch/K; exact "
                     "grad equality for BN-free nets, sequential "
                     "micro-batch BN otherwise). Stateless losses "
                     "only — adaptive margins / center loss refuse")
flags.DEFINE_float("random_erase", 0.0,
                   "random-erasing probability per image (Zhong 2020; "
                   "0 = off): a random rectangle becomes gaussian "
                   "noise after standardization — occlusion "
                   "robustness for masked/sunglassed faces")
flags.DEFINE_enum("input_norm", "per_image", ["per_image", "fixed"],
                  "input standardization: per_image = the reference's "
                  "tf.image chain; fixed = (x-127.5)/127.5 — REQUIRED "
                  "when fine-tuning an imported InsightFace-ecosystem "
                  "checkpoint (cli.import_torch), which must train "
                  "with the norm it serves with")
flags.DEFINE_bool("qat", False,
                  "quantization-aware training: fake-quantize convs + "
                  "the inter-block stream onto the int8 grid (STE "
                  "backward) so the checkpoint serves via "
                  "--quant_mode=static with minimal embedding drift")
flags.DEFINE_bool("multihost", False,
                  "call jax.distributed.initialize() (TPU pod slices)")
flags.DEFINE_string("eval_data", "",
                    "FaceShard of verification faces (optional)")
flags.DEFINE_string("eval_pairs", "",
                    "pairs file 'idx1 idx2 label' over eval_data")
flags.DEFINE_integer("eval_every", 0, "run verification every N steps")
flags.DEFINE_integer("eval_batch", 256, "extraction batch for the hook")
flags.DEFINE_string("keep_best", "",
                    "eval metric name (e.g. lfw_accuracy, higher = "
                    "better): whenever the eval hook improves on the "
                    "best seen — across restarts — also checkpoint to "
                    "<train_dir>/best, immune to --save_every's ring-"
                    "buffer GC; serve/export it via "
                    "--checkpoint_dir=<train_dir>/best")

_MARGINS = {  # (m1, m2, m3) defaults per variant
    "softmax": (1.0, 0.0, 0.0),
    "arcface": (1.0, 0.5, 0.0),
    "cosface": (1.0, 0.0, 0.35),
    "sphereface": (1.35, 0.0, 0.0),
}


def build_config(num_classes: int) -> "TrainConfig":
    from tf_face_toolbox_tpu.train.trainer import TrainConfig

    margin_mode = "fixed"
    if FLAGS.margin in ("magface", "adaface"):
        if FLAGS.margin_value >= 0:
            raise SystemExit(
                f"--margin_value does not apply to --margin="
                f"{FLAGS.margin} (its margins are per-sample "
                "adaptive); tune --magface_lm/--magface_um or "
                "--adaface_m instead")
        # papers' exact losses: zero base margins, per-sample adaptive
        margin_mode, (m1, m2, m3) = FLAGS.margin, (1.0, 0.0, 0.0)
    elif FLAGS.margin == "curricular":
        # paper default: ArcFace margin 0.5 on the target column
        m2 = FLAGS.margin_value if FLAGS.margin_value >= 0 else 0.5
        margin_mode, (m1, m3) = "curricular", (1.0, 0.0)
    else:
        m1, m2, m3 = _MARGINS[FLAGS.margin]
        if FLAGS.margin_value >= 0:
            if FLAGS.margin == "arcface":
                m2 = FLAGS.margin_value
            elif FLAGS.margin == "cosface":
                m3 = FLAGS.margin_value
            elif FLAGS.margin == "sphereface":
                m1 = FLAGS.margin_value
    from tf_face_toolbox_tpu.ops.losses import (
        AdaFaceConfig, MagFaceConfig)
    return TrainConfig(
        network=FLAGS.network,
        stem=FLAGS.stem,
        head_variant=FLAGS.head,
        dropout_rate=FLAGS.dropout,
        drop_path_rate=FLAGS.drop_path,
        embedding_dim=FLAGS.embedding_dim,
        num_classes=num_classes,
        image_size=FLAGS.image_size,
        global_batch=FLAGS.global_batch,
        optimizer=FLAGS.optimizer,
        base_lr=FLAGS.base_lr,
        lr_schedule=FLAGS.lr_schedule,
        lr_boundaries=tuple(int(b) for b in FLAGS.lr_boundaries),
        lr_decay=FLAGS.lr_decay,
        lr_total_steps=FLAGS.num_steps,
        warmup_steps=FLAGS.warmup_steps,
        momentum=FLAGS.momentum,
        weight_decay=FLAGS.weight_decay,
        grad_clip_norm=FLAGS.grad_clip_norm,
        skip_nonfinite=FLAGS.skip_nonfinite,
        margin_scale=FLAGS.margin_scale,
        margin_m1=m1, margin_m2=m2, margin_m3=m3,
        margin_mode=margin_mode,
        magface=MagFaceConfig(
            l_a=FLAGS.magface_la, u_a=FLAGS.magface_ua,
            l_m=FLAGS.magface_lm, u_m=FLAGS.magface_um,
            lambda_g=FLAGS.magface_lambda_g),
        adaface=AdaFaceConfig(m=FLAGS.adaface_m, h=FLAGS.adaface_h),
        subcenters=FLAGS.subcenters,
        center_weight=FLAGS.center_loss,
        center_alpha=FLAGS.center_alpha,
        triplet_weight=FLAGS.triplet_loss,
        triplet_margin=FLAGS.triplet_margin,
        dtype=jnp.bfloat16 if FLAGS.bf16 else jnp.float32,
        augment=True,
        crop_from=FLAGS.crop_from or FLAGS.image_size + 8,
        random_erase=FLAGS.random_erase,
        accum_steps=FLAGS.accum_steps,
        ema_decay=FLAGS.ema_decay,
        pfc_sample_rate=FLAGS.pfc_sample_rate,
        pallas_input=FLAGS.pallas_input,
        input_norm=FLAGS.input_norm,
        quantized="qat" if FLAGS.qat else False,
        distill_alpha=FLAGS.distill_alpha,
    )


def build_teacher(cfg):
    """Load the frozen distillation teacher (net, variables) or None."""
    if not FLAGS.distill_from:
        return None
    from tf_face_toolbox_tpu.models import create_network
    from tf_face_toolbox_tpu.train.finetune import (
        load_pretrained_variables)

    net = create_network(FLAGS.distill_network,
                         embedding_dim=cfg.embedding_dim,
                         dtype=cfg.dtype, stem=FLAGS.distill_stem,
                         head_variant=FLAGS.distill_head)
    variables = load_pretrained_variables(
        FLAGS.distill_from, use_ema=FLAGS.distill_use_ema)
    missing = [k for k in ("params", "batch_stats") if k not in variables]
    if missing:
        raise SystemExit(f"--distill_from source lacks {missing}")
    logging.info("distillation teacher: %s from %s (alpha=%.2f)",
                 FLAGS.distill_network, FLAGS.distill_from,
                 FLAGS.distill_alpha)
    return net, {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}


def build_eval_fn(cfg):
    """Periodic in-training LFW-style verification (optional)."""
    if not (FLAGS.eval_data and FLAGS.eval_pairs and FLAGS.eval_every):
        return None
    multihost = jax.process_count() > 1
    if multihost and jax.process_index() != 0:
        # Process 0 runs the eval alone on its local device; everyone
        # else just proceeds to the next step's collective and waits.
        return lambda state: {}
    from tf_face_toolbox_tpu.cli.eval_lfw import load_pairs
    from tf_face_toolbox_tpu.data.pipeline import FaceShardSource
    from tf_face_toolbox_tpu.extract import extract_shard, make_extract_fn
    from tf_face_toolbox_tpu.models import create_network
    from tf_face_toolbox_tpu.ops.verification import verify_pairs

    net = create_network(cfg.network, embedding_dim=cfg.embedding_dim,
                         dtype=cfg.dtype, stem=cfg.stem,
                         head_variant=cfg.head_variant)
    source = FaceShardSource(FLAGS.eval_data)
    i1, i2, labels = load_pairs(FLAGS.eval_pairs)
    extract_fn = make_extract_fn(net, donate=False)

    def _localize(tree):
        """Multihost: state leaves are global (replicated) arrays whose
        shards span processes; pull this process's addressable copy so
        the single-device eval jit can consume them."""
        import numpy as np

        return jax.tree.map(
            lambda a: np.asarray(a.addressable_data(0)), tree)

    def eval_fn(state):
        params = (state.ema_params if state.ema_params is not None
                  else state.params)
        variables = {"params": params, "batch_stats": state.batch_stats}
        if multihost:
            variables = _localize(variables)
        # Same path as the offline extract CLI (extract_shard): scale-
        # matched host resize + center crop, bounded chunks — nothing
        # eval-shard-sized stays resident in HBM between evals.
        emb = extract_shard(net, variables, source,
                            image_size=cfg.image_size,
                            crop_from=cfg.crop_from,
                            batch=FLAGS.eval_batch,
                            norm=cfg.input_norm,
                            extract_fn=extract_fn)
        report = verify_pairs(emb[i1], emb[i2], labels)
        return {"lfw_accuracy": report["accuracy_mean"],
                "lfw_std": report["accuracy_std"],
                # NaN when the eval pair set is too small to resolve
                # FAR=1e-2 (tar_at_far never extrapolates)
                "tar_at_far_1e2": report.get("tar@far=0.01",
                                             float("nan"))}

    return eval_fn


def synthetic_batches(cfg, seed: int):
    """Random-identity batches shaped like the real pipeline's output:
    per-HOST shards (global/process_count rows, process-distinct seed)
    so the multihost globalizer assembles a correct global batch."""
    host_batch = cfg.global_batch // jax.process_count()
    rng = np.random.default_rng((seed, jax.process_index()))
    while True:
        images = rng.integers(
            0, 256, (host_batch, cfg.crop_from, cfg.crop_from, 3),
            dtype=np.uint8)
        labels = rng.integers(0, cfg.num_classes,
                              host_batch).astype(np.int32)
        yield {"image": images, "label": labels}


def main(argv):
    del argv
    if FLAGS.network.startswith("densenet") and (
            FLAGS.stem == "space2depth" or FLAGS.qat):
        raise SystemExit("--stem=space2depth / --qat are resnet-family "
                         "options; densenet supports stem=face|imagenet, "
                         "fp training")
    if FLAGS.keep_best and not (FLAGS.eval_data and FLAGS.eval_pairs
                                and FLAGS.eval_every):
        raise SystemExit(
            "--keep_best tracks the in-training eval hook; it needs "
            "--eval_data/--eval_pairs/--eval_every")
    if FLAGS.keep_best and not FLAGS.train_dir:
        raise SystemExit("--keep_best saves to <train_dir>/best; "
                         "pass --train_dir")
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()
    if FLAGS.multihost:
        jax.distributed.initialize()
    from tf_face_toolbox_tpu.data.pipeline import (
        FaceShardSource, batch_iterator, device_prefetch,
        native_batch_iterator)
    from tf_face_toolbox_tpu.parallel.mesh import (
        create_mesh, create_multislice_mesh)
    from tf_face_toolbox_tpu.train.loop import train_loop

    n_slices = FLAGS.mesh_slices or len(
        {getattr(d, "slice_index", None) or 0 for d in jax.devices()})
    if n_slices > 1:
        mesh = create_multislice_mesh(model=FLAGS.mesh_model,
                                      slices=n_slices)
        logging.info("multi-slice mesh: %d slices, shape %s", n_slices,
                     dict(mesh.shape))
    else:
        mesh = create_mesh(model=FLAGS.mesh_model)
    if FLAGS.data_weights and "," not in FLAGS.data:
        # A typo'd --data that drops a comma would otherwise silently
        # change the training mixture to one source.
        raise SystemExit(
            "--data_weights needs a multi-shard --data "
            f"(got --data={FLAGS.data!r})")
    if FLAGS.data == "synthetic":
        num_classes = FLAGS.num_classes or 100
        cfg = build_config(num_classes)
        batches = synthetic_batches(cfg, FLAGS.seed)
    elif "," in FLAGS.data:
        # Weighted online mixture over several shards (disjoint
        # identity spaces, labels offset — see
        # data.pipeline.mixed_batch_iterator). Python loader only:
        # per-step source switching breaks the native loader's
        # per-epoch readahead plan.
        if FLAGS.loader not in ("auto", "python"):
            raise SystemExit("--data with multiple shards uses the "
                             f"Python loader (got --loader={FLAGS.loader})")
        if FLAGS.balanced_pk:
            raise SystemExit("--balanced_pk mixes identities within "
                             "ONE shard; it does not compose with "
                             "multi-shard --data")
        from tf_face_toolbox_tpu.data.pipeline import (
            mixed_batch_iterator, mixture_sources)
        paths = [p for p in FLAGS.data.split(",") if p]
        mix_sources = mixture_sources(
            paths, seed=FLAGS.seed,
            host_index=jax.process_index(),
            host_count=jax.process_count())
        weights = None
        if FLAGS.data_weights:
            try:
                weights = [float(v)
                           for v in FLAGS.data_weights.split(",")]
            except ValueError:
                raise SystemExit("--data_weights must be comma floats "
                                 f"(got {FLAGS.data_weights!r})")
            if len(weights) != len(paths):
                raise SystemExit(
                    f"--data_weights has {len(weights)} entries for "
                    f"{len(paths)} shards")
        total_mix_classes = sum(s.num_classes for s in mix_sources)
        if FLAGS.num_classes and FLAGS.num_classes < total_mix_classes:
            # Offset labels would exceed the classifier rows and the
            # on-device one-hot/gather fails SILENTLY (wrong training,
            # no error) — refuse on host instead.
            raise SystemExit(
                f"--num_classes={FLAGS.num_classes} is smaller than the "
                f"mixture's combined identity count {total_mix_classes} "
                "(labels are offset per source); omit --num_classes or "
                f"set it >= {total_mix_classes}")
        num_classes = FLAGS.num_classes or total_mix_classes
        cfg = build_config(num_classes)
        host_batch = cfg.global_batch // jax.process_count()
        start = 0
        if FLAGS.train_dir:
            from tf_face_toolbox_tpu.train.checkpoint import (
                CheckpointManager)
            start = CheckpointManager(FLAGS.train_dir).latest_step() or 0
        batches = mixed_batch_iterator(
            paths, host_batch, weights=weights, seed=FLAGS.seed,
            start_step=start,
            resize_to=(cfg.crop_from, cfg.crop_from),
            sources=mix_sources)
    else:
        source = FaceShardSource(
            FLAGS.data, seed=FLAGS.seed,
            host_index=jax.process_index(),
            host_count=jax.process_count())
        num_classes = FLAGS.num_classes or source.num_classes
        cfg = build_config(num_classes)
        host_batch = cfg.global_batch // jax.process_count()
        # Resume: align the data stream with the checkpointed step so a
        # restarted run continues through the SAME shuffled sequence
        # instead of replaying epoch 0 (deterministic-resume contract).
        start_epoch = start_step = 0
        if FLAGS.train_dir:
            from tf_face_toolbox_tpu.train.checkpoint import (
                CheckpointManager)
            latest = CheckpointManager(FLAGS.train_dir).latest_step()
            spe = source.num_records // host_batch
            if spe == 0:
                raise ValueError(
                    f"per-host dataset ({source.num_records} records) is "
                    f"smaller than the per-host batch ({host_batch})")
            if latest:
                start_epoch, start_step = latest // spe, latest % spe
        use_native = FLAGS.loader == "native"
        if FLAGS.loader == "auto":
            from tf_face_toolbox_tpu.data.native import native_available
            use_native = native_available()
        if FLAGS.balanced_pk:
            if FLAGS.loader not in ("auto", "python"):
                raise SystemExit(
                    "--balanced_pk is a Python-loader sampler "
                    f"(got --loader={FLAGS.loader})")
            from tf_face_toolbox_tpu.data.pipeline import (
                balanced_batch_iterator)
            try:
                p, k = (int(v) for v in FLAGS.balanced_pk.split(","))
            except ValueError:
                raise SystemExit("--balanced_pk must be 'P,K' "
                                 f"(got {FLAGS.balanced_pk!r})")
            if p * k != host_batch:
                raise SystemExit(
                    f"--balanced_pk={p},{k}: P·K={p * k} must equal "
                    f"the per-host batch {host_batch}")
            # The balanced sampler is step-indexed (no epoch notion):
            # resume by the global step alone.
            batches = balanced_batch_iterator(
                source, ids_per_batch=p, images_per_id=k,
                start_step=start_epoch * (
                    source.num_records // host_batch) + start_step,
                resize_to=(cfg.crop_from, cfg.crop_from))
        elif FLAGS.loader == "native_dct":
            from tf_face_toolbox_tpu.data.pipeline import (
                native_dct_batch_iterator)
            batches = native_dct_batch_iterator(
                source, host_batch, size=cfg.crop_from,
                start_epoch=start_epoch, start_step=start_step)
        elif use_native:
            batches = native_batch_iterator(
                source, host_batch,
                out_h=cfg.crop_from, out_w=cfg.crop_from,
                start_epoch=start_epoch, start_step=start_step)
        else:
            # resize_to matches the native loader's pixel semantics and
            # handles mixed-size JPEG datasets.
            batches = batch_iterator(
                source, host_batch,
                resize_to=(cfg.crop_from, cfg.crop_from),
                start_epoch=start_epoch, start_step=start_step)
    from tf_face_toolbox_tpu.data.pipeline import host_prefetch
    batches = host_prefetch(batches)
    if jax.process_count() > 1:
        from tf_face_toolbox_tpu.parallel.mesh import globalize_host_batches
        batches = globalize_host_batches(batches, mesh)
    else:
        batches = device_prefetch(batches)

    # Preemption safety (TPU VMs deliver SIGTERM before reclaim): flag
    # the loop to flush a checkpoint at the current step and exit 0 —
    # a resume continues exactly where the preemption landed.
    import signal
    import threading

    stop = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop.set())

    warm_start = None
    if FLAGS.finetune_from:
        from tf_face_toolbox_tpu.train.finetune import (
            load_pretrained_variables,
            warm_start_state,
        )

        def warm_start(state):
            # loaded HERE, not at flag-parse time: train_loop only
            # calls this when the run starts fresh, so a preempted
            # fine-tune resume never re-reads (or re-requires) the
            # source checkpoint, and the weights aren't pinned in
            # host RAM for the whole run
            pretrained = load_pretrained_variables(
                FLAGS.finetune_from, use_ema=FLAGS.finetune_use_ema)
            return warm_start_state(state, pretrained, log=logging.info)

    result = train_loop(
        cfg, mesh, batches,
        num_steps=FLAGS.num_steps,
        train_dir=FLAGS.train_dir or None,
        save_every=FLAGS.save_every,
        log_every=FLAGS.log_every,
        rng_seed=FLAGS.seed,
        eval_fn=build_eval_fn(cfg),
        eval_every=FLAGS.eval_every,
        keep_best=FLAGS.keep_best,
        input_format="dct" if FLAGS.loader == "native_dct" else "u8",
        should_stop=stop.is_set,
        warm_start=warm_start,
        teacher=build_teacher(cfg),
        max_consecutive_skips=FLAGS.max_consecutive_skips,
    )
    if result.last_metrics.get("preempted"):
        step = int(jax.device_get(result.state.step))
        if FLAGS.train_dir:
            print(f"preempted: checkpoint flushed at step={step}; "
                  f"resume with the same command", flush=True)
        else:
            print(f"preempted at step={step}: NO checkpoint "
                  f"(--train_dir not set) — progress is lost",
                  flush=True)
        return
    loss = result.last_metrics.get("loss")
    print(f"done: step={int(jax.device_get(result.state.step))} "
          f"loss={loss:.4f}" if loss is not None else
          f"done: step={int(jax.device_get(result.state.step))} "
          f"(no steps run — already at num_steps)")


if __name__ == "__main__":
    app.run(main)
