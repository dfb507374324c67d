"""Export a train checkpoint as a one-file deployment bundle.

The reference era's freeze_graph step [TF1-IDIOM]: collapse a train dir
plus its flag soup into one artifact the serving side boots from with
zero configuration (serving/bundle.py):

    python -m tf_face_toolbox_tpu.cli.export \
        --checkpoint_dir=/models/run --network=resnet_v1_50 \
        --use_ema --quant_mode=static --calibrate_data=/data/val.faceshard \
        --output=/models/resnet50.bundle.npz

    python -m tf_face_toolbox_tpu.cli.serve   --bundle=/models/resnet50.bundle.npz
    python -m tf_face_toolbox_tpu.cli.extract --bundle=... --data=... --output=...

Static-int8 calibration happens HERE, once, against a shard from the
serving distribution; the frozen scales ride in the bundle so serving
hosts need neither the shard nor the knowledge that int8 is in play.
"""

from __future__ import annotations

import datetime

import jax.numpy as jnp
from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint_dir", "", "orbax train dir")
flags.DEFINE_string("variables_npz", "",
                    "bundle imported variables (cli.import_*) instead "
                    "of a checkpoint")
flags.DEFINE_string("output", None, "bundle path to write (.npz)")
flags.DEFINE_string("network", "resnet_v1_50", "backbone name")
flags.DEFINE_enum("stem", "face", ["face", "imagenet", "space2depth"],
                  "backbone stem (ignored for registry-pinned nets)")
flags.DEFINE_enum("head", "gap", ["gap", "flatten"], "embedding head")
flags.DEFINE_integer("embedding_dim", 512, "embedding size")
flags.DEFINE_integer("image_size", 112, "served input size")
flags.DEFINE_integer("crop_from", 0,
                     "eval source scale (0 = image_size + 8)")
flags.DEFINE_enum("input_norm", "per_image", ["per_image", "fixed"],
                  "input standardization the model serves with")
flags.DEFINE_bool("use_ema", False, "export the EMA weights")
flags.DEFINE_integer("step", 0,
                     "export a specific retained checkpoint step "
                     "(0 = latest)")
flags.DEFINE_integer("average_last", 0,
                     "average the params of the last N retained "
                     "checkpoints (SWA-style weight averaging — the "
                     "flat-minimum trick; BN stats come from the "
                     "newest). 0/1 = no averaging")
flags.DEFINE_enum("quant_mode", "none", ["none", "dynamic", "static"],
                  "int8 serving mode baked into the bundle; static "
                  "runs calibration here (needs --calibrate_data)")
flags.DEFINE_string("calibrate_data", "",
                    "FaceShard sampled for static-int8 scales")
flags.DEFINE_integer("calibrate_batches", 4, "calibration batches")
flags.DEFINE_integer("calibrate_batch_size", 128, "calibration batch")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()

    import jax

    from tf_face_toolbox_tpu.serving.bundle import write_bundle

    if bool(FLAGS.checkpoint_dir) == bool(FLAGS.variables_npz):
        raise SystemExit(
            "pass exactly one of --checkpoint_dir / --variables_npz")
    if FLAGS.quant_mode == "static" and not FLAGS.calibrate_data:
        raise SystemExit("--quant_mode=static needs --calibrate_data")

    # Calibration/export math runs in f32: the bundle stores f32 params
    # and frozen f32 scales; compute dtype is a serving-side choice.
    dtype = jnp.float32
    step = None
    averaged_steps = None
    if FLAGS.variables_npz and (FLAGS.step or FLAGS.average_last > 1):
        raise SystemExit("--step/--average_last select train-dir "
                         "checkpoints; they don't apply to "
                         "--variables_npz")
    if FLAGS.variables_npz:
        from tf_face_toolbox_tpu.interop.port import load_variables_npz
        from tf_face_toolbox_tpu.models import create_network

        net = create_network(FLAGS.network,
                             embedding_dim=FLAGS.embedding_dim,
                             dtype=dtype, stem=FLAGS.stem,
                             head_variant=FLAGS.head)
        variables = load_variables_npz(FLAGS.variables_npz)
    else:
        from tf_face_toolbox_tpu.pretrained import load_variables
        from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(FLAGS.checkpoint_dir)
        step = FLAGS.step or mgr.latest_step()
        net, variables = load_variables(
            FLAGS.checkpoint_dir, FLAGS.network, FLAGS.embedding_dim,
            FLAGS.image_size, dtype, use_ema=FLAGS.use_ema,
            stem=FLAGS.stem, head=FLAGS.head, step=step)
        if FLAGS.average_last > 1:
            # SWA-style weight averaging over the retained tail: mean
            # of the params leaves; BN running stats stay the NEWEST
            # checkpoint's (averaging normalization statistics across
            # training points is not meaningful the way averaging
            # weights in one loss basin is — for exactness, re-running
            # calibration/eval recomputes what matters downstream).
            import numpy as np

            tail = [s for s in mgr.all_steps() if s <= step]
            averaged_steps = tail[-FLAGS.average_last:]
            if len(averaged_steps) < FLAGS.average_last:
                logging.warning(
                    "--average_last=%d but only %d retained "
                    "checkpoint(s) at/below step %s; averaging those",
                    FLAGS.average_last, len(averaged_steps), step)
            trees = [variables["params"]]
            for s in averaged_steps:
                if s == step:
                    continue
                _, v = load_variables(
                    FLAGS.checkpoint_dir, FLAGS.network,
                    FLAGS.embedding_dim, FLAGS.image_size, dtype,
                    use_ema=FLAGS.use_ema, stem=FLAGS.stem,
                    head=FLAGS.head, step=s)
                trees.append(v["params"])
            variables = dict(variables)
            variables["params"] = jax.tree.map(
                lambda *xs: np.mean(np.stack(
                    [np.asarray(x, np.float64) for x in xs]), axis=0
                ).astype(np.asarray(xs[0]).dtype), *trees)
            logging.info("averaged params over steps %s",
                         averaged_steps)

    if FLAGS.quant_mode == "static":
        from tf_face_toolbox_tpu.data.pipeline import FaceShardSource
        from tf_face_toolbox_tpu.extract import calibrate_on_shard

        logging.info("calibrating static-int8 scales on %d batches of %s",
                     FLAGS.calibrate_batches, FLAGS.calibrate_data)
        variables = calibrate_on_shard(
            FLAGS.network, variables,
            FaceShardSource(FLAGS.calibrate_data),
            image_size=FLAGS.image_size, crop_from=FLAGS.crop_from,
            batch=FLAGS.calibrate_batch_size,
            num_batches=FLAGS.calibrate_batches,
            embedding_dim=FLAGS.embedding_dim, dtype=dtype,
            norm=FLAGS.input_norm,
            stem=getattr(net, "stem", FLAGS.stem),
            head_variant=getattr(net, "head_variant", FLAGS.head))

    meta = {
        "network": FLAGS.network,
        "embedding_dim": FLAGS.embedding_dim,
        # RESOLVED module attributes (post registry pins), so loading
        # reconstructs exactly this net without warnings or drift.
        "stem": getattr(net, "stem", None),
        "head_variant": getattr(net, "head_variant", None),
        "image_size": FLAGS.image_size,
        "crop_from": FLAGS.crop_from,
        "input_norm": FLAGS.input_norm,
        "quant_mode": FLAGS.quant_mode,
        "use_ema": FLAGS.use_ema,
        "step": None if step is None else int(step),
        "averaged_steps": averaged_steps,
        "created": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
    }
    write_bundle(FLAGS.output, variables, meta)
    n_params = sum(int(p.size) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    print(f"exported {FLAGS.network} (step={meta['step']}, "
          f"quant={FLAGS.quant_mode}, ema={FLAGS.use_ema}, "
          f"{n_params / 1e6:.2f}M params) to {FLAGS.output}")


if __name__ == "__main__":
    app.run(main)
