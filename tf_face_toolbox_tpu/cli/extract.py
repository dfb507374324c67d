"""Feature-extraction CLI.

Rebuild of the reference's ``features.py`` entry (ref: upstream
features.py [UPSTREAM-K]; SURVEY.md §3.2): restore checkpoint, stream
faces, write flip-averaged L2-normalized embeddings to disk.

    python -m tf_face_toolbox_tpu.cli.extract \
        --checkpoint_dir=/tmp/run1 --data=/data/lfw.faceshard \
        --output=/tmp/lfw_embeddings.npy --batch=256
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint_dir", "",
                    "train dir with checkpoints ('' = random init)")
flags.DEFINE_string("variables_npz", "",
                    "serve from a ported .npz variables file "
                    "(cli.import_keras output) instead of a train "
                    "checkpoint")
flags.DEFINE_string("bundle", "",
                    "extract with a one-file deployment bundle "
                    "(cli.export); its config record supplies network/"
                    "stem/head/embedding_dim/image_size/crop_from/"
                    "input_norm/quant mode — those flags are ignored")
flags.DEFINE_string("data", None, "FaceShard of eval faces")
flags.DEFINE_string("output", None,
                    "output path; format by extension: .npy (default), "
                    ".mat (MATLAB v5), .bin (TFFB raw f32)")
flags.DEFINE_string("network", "resnet_v1_50", "backbone name")
flags.DEFINE_enum("stem", "face", ["face", "imagenet", "space2depth"],
                  "backbone stem (must match the trained checkpoint)")
flags.DEFINE_enum("head", "gap", ["gap", "flatten"],
                  "embedding head variant (must match the checkpoint)")
flags.DEFINE_bool("quantized", False,
                  "serve with dynamic W8A8 int8 convs "
                  "(alias for --quant_mode=dynamic)")
flags.DEFINE_enum("quant_mode", "none", ["none", "dynamic", "static"],
                  "int8 serving mode: dynamic = per-sample scales (no "
                  "calibration, modest gain); static = frozen scales "
                  "calibrated on the first --calibrate_batches of the "
                  "eval data (the fast path: int8 residual carry, "
                  "~1.45x bf16 on the imagenet stem, ~1.55x on face)")
flags.DEFINE_integer("calibrate_batches", 4,
                     "calibration batches for --quant_mode=static")
flags.DEFINE_integer("embedding_dim", 512, "embedding size")
flags.DEFINE_integer("image_size", 112, "eval crop size")
flags.DEFINE_integer("crop_from", 0,
                     "resize source images to this size before the "
                     "center crop (0 = image_size + 8, matching the "
                     "training pipeline's scale; pass crop_from == "
                     "image_size for whole-image resize semantics)")
flags.DEFINE_integer("batch", 256, "extraction batch size")
flags.DEFINE_enum("engine", "auto", ["auto", "flax", "folded", "fused"],
                  "serving engine: auto = folded when serving fp, flax "
                  "for int8 modes; flax = net.apply; folded = BN folded "
                  "into conv scales/biases (serving/, ~4% faster on "
                  "bandwidth-bound stems, fp only); fused = folded + "
                  "Pallas fused blocks (experimental; measured slower "
                  "than XLA on v5e — see docs/design.md)")
flags.DEFINE_enum("loader", "auto",
                  ["auto", "native", "python", "native_dct",
                   "dct_domain"],
                  "host decode path: auto/native = C++ pool, python = "
                  "PIL threads, native_dct = entropy-decode only (TPU "
                  "finishes the JPEG — needs a cli.pack --recode_size "
                  "shard of crop_from geometry), dct_domain = "
                  "zero-decode coefficients straight into a stem=dct "
                  "backbone (shard recoded at image_size exactly)")
flags.DEFINE_integer("chunk_rows", 0,
                     "resumable bulk mode (.npy output only): write "
                     "embeddings into a disk-backed .npy in chunks of "
                     "this many rows, recording progress in a "
                     "<output>[.rows<lo>-<hi>].progress.json sidecar — "
                     "re-running after a crash skips finished chunks "
                     "(resume requires the same model + flags; the "
                     "sidecar records a weight digest). "
                     "0 = classic one-shot write")
flags.DEFINE_string("rows", "",
                    "extract only records [lo:hi) of the shard (e.g. "
                    "'0:1000000'); with --chunk_rows the rows land at "
                    "their true offsets in a full-length output, so "
                    "disjoint ranges can be sharded across jobs")
flags.DEFINE_enum("input_norm", "per_image", ["per_image", "fixed"],
                  "input standardization: per_image = the reference's "
                  "tf.image chain; fixed = (x-127.5)/127.5, what "
                  "InsightFace-ecosystem checkpoints (cli.import_torch, "
                  "iresnet_*) were trained with — serving an imported "
                  "model with the wrong norm silently destroys its "
                  "accuracy")
flags.DEFINE_bool("data_parallel", False,
                  "shard each extraction batch over ALL visible "
                  "devices (data-axis mesh, params replicated) — "
                  "multi-chip offline extraction from one process; "
                  "ragged tail batches are padded transparently. "
                  "Serves through net.apply (exclusive with "
                  "--engine folded/fused)")
flags.DEFINE_bool("bf16", True, "bfloat16 compute")
flags.DEFINE_enum("output_dtype", "float32", ["float32", "float16"],
                  "storage dtype of the dumped embeddings: float16 "
                  "halves gallery files (~1e-3 cosine quantization on "
                  "unit vectors — fine for search/identification "
                  "galleries; keep float32 for verification research). "
                  "Not available for .bin (fixed f32 format) or "
                  "--chunk_rows memmaps")
flags.DEFINE_string("output_quality", "",
                    "also write per-face quality scores (.npy, shape "
                    "(N,)): the PRE-normalization feature magnitude "
                    "‖(f(x)+f(flip))/2‖ — the quality signal MagFace "
                    "trains into the norm (Meng 2021), and a useful "
                    "proxy on any margin-softmax model (gallery "
                    "curation, enrollment gating). One-shot mode only "
                    "(not --chunk_rows)")
flags.DEFINE_bool("use_ema", False,
                  "extract with the EMA weights (if trained with EMA)")
flags.mark_flag_as_required("data")
flags.mark_flag_as_required("output")


# Shared with cli.serve and train.finetune; lives in a flag-free module
# so non-CLI code can use it without colliding absl namespaces.
from tf_face_toolbox_tpu.pretrained import load_variables  # noqa: E402


def _weights_fingerprint(variables, quant, config_tag=None) -> str:
    """Digest of the restored weights + serving config for the resume
    sidecar: resuming a chunked extraction with a DIFFERENT checkpoint
    (or quant mode / network shape) must recompute, not silently mix
    two models' embeddings in one output file. Per-leaf float64 sums
    are cheap (<1s for 25M params), deterministic, and change with any
    weight update (a later training step, EMA vs raw, a port)."""
    import hashlib

    import numpy as np

    leaves = []
    for path, leaf in sorted(
            jax.tree_util.tree_flatten_with_path(variables)[0],
            key=lambda kv: str(kv[0])):
        arr = np.asarray(jax.device_get(leaf))
        leaves.append(f"{path}:{arr.shape}:{arr.dtype}:"
                      f"{float(arr.astype(np.float64).sum()):.6e}")
    digest = hashlib.sha1("|".join(leaves).encode()).hexdigest()[:16]
    if config_tag is None:
        config_tag = (f"{FLAGS.network}/{FLAGS.stem}/{FLAGS.head}/"
                      f"dim={FLAGS.embedding_dim}/"
                      f"norm={FLAGS.input_norm}")
    return f"{config_tag}/q={quant}/bf16={FLAGS.bf16}/w={digest}"


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.data.pipeline import FaceShardSource
    from tf_face_toolbox_tpu.extract import extract_shard
    from tf_face_toolbox_tpu.train.checkpoint import save_embeddings

    quant = FLAGS.quant_mode if FLAGS.quant_mode != "none" else (
        "dynamic" if FLAGS.quantized else False)
    if FLAGS.network.startswith("densenet") and \
            FLAGS.stem == "space2depth":
        raise SystemExit(
            "--stem=space2depth is a resnet-family option; densenet "
            "supports stem=face|imagenet")
    dtype = jnp.bfloat16 if FLAGS.bf16 else jnp.float32
    image_size, crop_from, norm = (FLAGS.image_size, FLAGS.crop_from,
                                   FLAGS.input_norm)
    bundle_meta = None
    if FLAGS.bundle:
        if FLAGS.checkpoint_dir or FLAGS.variables_npz:
            raise SystemExit("--bundle is self-contained; drop "
                             "--checkpoint_dir/--variables_npz")
        if quant:
            raise SystemExit("--bundle bakes the quant mode and scales "
                             "in at export time; drop --quant_mode/"
                             "--quantized")
        from tf_face_toolbox_tpu.serving.bundle import (
            network_from_meta, read_bundle)

        variables, bundle_meta = read_bundle(FLAGS.bundle)
        variables = jax.tree.map(jnp.asarray, variables)
        quant = (False if bundle_meta["quant_mode"] == "none"
                 else bundle_meta["quant_mode"])
        net = network_from_meta(bundle_meta, dtype=dtype)
        image_size = int(bundle_meta["image_size"])
        crop_from = int(bundle_meta.get("crop_from", 0))
        norm = bundle_meta["input_norm"]
        logging.info("bundle: %s step=%s quant=%s norm=%s",
                     bundle_meta["network"], bundle_meta.get("step"),
                     bundle_meta["quant_mode"], norm)
    elif FLAGS.variables_npz:
        if FLAGS.checkpoint_dir:
            raise SystemExit(
                "--variables_npz and --checkpoint_dir are exclusive")
        from tf_face_toolbox_tpu.interop.port import load_variables_npz
        from tf_face_toolbox_tpu.models import create_network

        kwargs = dict(stem=FLAGS.stem, head_variant=FLAGS.head)
        if quant:
            kwargs["quantized"] = quant
        net = create_network(FLAGS.network,
                             embedding_dim=FLAGS.embedding_dim,
                             dtype=dtype, **kwargs)
        variables = load_variables_npz(FLAGS.variables_npz)
        logging.info("serving ported variables from %s",
                     FLAGS.variables_npz)
    else:
        net, variables = load_variables(
            FLAGS.checkpoint_dir, FLAGS.network, FLAGS.embedding_dim,
            FLAGS.image_size, dtype, use_ema=FLAGS.use_ema,
            stem=FLAGS.stem, head=FLAGS.head, quantized=quant)
    source = FaceShardSource(FLAGS.data)
    if quant == "static" and not FLAGS.bundle:
        from tf_face_toolbox_tpu.extract import calibrate_on_shard
        logging.info("calibrating static int8 scales on %d batches",
                     FLAGS.calibrate_batches)
        variables = calibrate_on_shard(
            FLAGS.network, variables, source,
            image_size=image_size, crop_from=crop_from,
            batch=min(FLAGS.batch, 128),
            num_batches=FLAGS.calibrate_batches,
            embedding_dim=FLAGS.embedding_dim, dtype=dtype,
            loader=FLAGS.loader, norm=norm,
            stem=FLAGS.stem, head_variant=FLAGS.head)
    extract_fn = None
    engine = FLAGS.engine
    if FLAGS.data_parallel:
        if engine in ("folded", "fused"):
            raise SystemExit("--data_parallel shards net.apply over the "
                             "device mesh; --engine folded/fused is "
                             "single-device — drop one of the two")
        from tf_face_toolbox_tpu.extract import make_extract_fn
        from tf_face_toolbox_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
        logging.info("data-parallel extraction over %d devices",
                     mesh.devices.size)
        extract_fn = make_extract_fn(net, donate=False, mesh=mesh,
                                     with_quality=bool(
                                         FLAGS.output_quality))
        engine = "flax"
    if engine == "auto":
        engine = "flax" if quant else "folded"
    if engine != "flax":
        if quant:
            raise SystemExit("--engine folded/fused serves fp; int8 "
                             "uses --engine flax (models/layers.py)")
        from tf_face_toolbox_tpu.extract import flip_averaged_embeddings
        from tf_face_toolbox_tpu.serving import make_serving_apply
        try:
            apply_fn = make_serving_apply(
                net, variables, use_pallas=engine == "fused")
        except ValueError as e:
            if FLAGS.engine != "auto":
                raise SystemExit(f"--engine {engine}: {e}") from e
            # auto: networks outside the engine's scope (grouped convs,
            # DenseNet topology) serve through net.apply
            logging.info("serving engine not applicable (%s); "
                         "using net.apply", e)
            apply_fn = None
        if apply_fn is not None:
            extract_fn = jax.jit(
                lambda v, x: flip_averaged_embeddings(
                    apply_fn, v, x,
                    with_quality=bool(FLAGS.output_quality)))
    if FLAGS.output_dtype == "float16":
        if FLAGS.output.endswith(".bin"):
            raise SystemExit("--output_dtype=float16 is not available "
                             "for .bin (TFFB is a fixed-f32 format); "
                             "use .npy/.npz/.mat")
        if FLAGS.chunk_rows:
            raise SystemExit("--output_dtype=float16 is not available "
                             "with --chunk_rows (the resumable memmap "
                             "is f32); cast the finished file instead")
    rows = None
    if FLAGS.rows:
        lo, _, hi = FLAGS.rows.partition(":")
        try:
            rows = (int(lo), int(hi))
        except ValueError:
            raise SystemExit(f"--rows wants 'lo:hi', got {FLAGS.rows!r}")
    progress = lambda done, n: logging.info(  # noqa: E731
        "extracted %d / %d", done, n)
    if FLAGS.chunk_rows:
        if not FLAGS.output.endswith(".npy"):
            raise SystemExit(
                "--chunk_rows writes a disk-backed .npy (the memmap "
                f"format); --output={FLAGS.output!r} is not .npy — "
                "drop --chunk_rows for .npz/.mat/.bin one-shot dumps")
        if FLAGS.output_quality:
            raise SystemExit(
                "--output_quality is one-shot-mode only (the resumable "
                "memmap stores embeddings alone); drop --chunk_rows")
        from tf_face_toolbox_tpu.extract import extract_shard_to_npy
        tag = None
        if bundle_meta is not None:
            tag = (f"{bundle_meta['network']}/{bundle_meta.get('stem')}/"
                   f"{bundle_meta.get('head_variant')}/"
                   f"dim={bundle_meta['embedding_dim']}/norm={norm}")
        emb = extract_shard_to_npy(
            net, variables, source, FLAGS.output,
            image_size=image_size, crop_from=crop_from,
            batch=FLAGS.batch, chunk_rows=FLAGS.chunk_rows,
            extract_fn=extract_fn, loader=FLAGS.loader,
            norm=norm, progress=progress, rows=rows,
            fingerprint=_weights_fingerprint(variables, quant, tag))
        lo, hi = rows if rows else (0, emb.shape[0])
        # emb is the FULL-length memmap; say what this job computed.
        print(f"wrote rows [{lo}:{hi}) of the {emb.shape} output "
              f"{FLAGS.output}")
    else:
        emb = extract_shard(
            net, variables, source,
            image_size=image_size, crop_from=crop_from,
            batch=FLAGS.batch, extract_fn=extract_fn,
            loader=FLAGS.loader, norm=norm,
            progress=progress, rows=rows,
            with_quality=bool(FLAGS.output_quality))
        if FLAGS.output_quality:
            emb, quality = emb
            np.save(FLAGS.output_quality, quality.astype(np.float32))
            print(f"wrote {quality.shape} quality scores to "
                  f"{FLAGS.output_quality}")
        if FLAGS.output_dtype == "float16":
            emb = emb.astype(np.float16)
        save_embeddings(FLAGS.output, emb)
        print(f"wrote {emb.shape} {emb.dtype} embeddings to "
              f"{FLAGS.output}")


if __name__ == "__main__":
    app.run(main)
