"""Export a trained iresnet checkpoint as a PyTorch ``state_dict``.

The reverse of ``cli.import_torch``: a model trained (or fine-tuned)
here on TPU is handed back to the InsightFace/arcface_torch ecosystem —
torch-serving fleets, ONNX exporters, downstream research forks — as
the ``.pth`` state_dict layout those tools already consume
(interop/torch_iresnet.py documents the tensor-layout mapping):

    python -m tf_face_toolbox_tpu.cli.export_torch \
        --checkpoint_dir=/models/run --network=iresnet_50 \
        --use_ema --output=/models/ir50_tpu.pth

Models trained with the default per-image standardization must be fed
the same normalization on the torch side; fine-tunes of imported
checkpoints (``--input_norm=fixed``) drop into InsightFace pipelines
unchanged ((x − 127.5) / 127.5). The tool prints which applies based on
--input_norm so the hand-off note travels with the artifact.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint_dir", "", "orbax train dir")
flags.DEFINE_string("variables_npz", "",
                    "export an .npz variable dump (cli.import_* or "
                    "interop.port.save_variables_npz) instead of a "
                    "checkpoint")
flags.DEFINE_string("output", None, "output .pt/.pth path")
flags.DEFINE_string("network", "iresnet_50",
                    "iresnet registry name (sets the block layout)")
flags.DEFINE_integer("embedding_dim", 512, "embedding size")
flags.DEFINE_integer("image_size", 112, "input size for checkpoint "
                     "restore shape inference")
flags.DEFINE_bool("use_ema", False, "export the EMA weights")
flags.DEFINE_integer("step", 0,
                     "export a specific retained checkpoint step "
                     "(0 = latest)")
flags.DEFINE_enum("input_norm", "per_image", ["per_image", "fixed"],
                  "normalization the model was trained with (recorded "
                  "in the hand-off note; does not change the weights)")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.interop.torch_iresnet import (
        variables_to_iresnet_state_dict,
    )
    from tf_face_toolbox_tpu.models import _REGISTRY

    if not FLAGS.network.startswith("iresnet"):
        raise SystemExit(
            "cli.export_torch maps the iresnet family (the only "
            "architecture with a torch-ecosystem state_dict contract); "
            f"--network={FLAGS.network} has no torch key layout")
    if bool(FLAGS.checkpoint_dir) == bool(FLAGS.variables_npz):
        raise SystemExit(
            "pass exactly one of --checkpoint_dir / --variables_npz")
    if FLAGS.network not in _REGISTRY:
        have = sorted(k for k in _REGISTRY if k.startswith("iresnet"))
        raise SystemExit(f"unknown network {FLAGS.network!r}; "
                         f"iresnet registry names: {have}")
    pinned = _REGISTRY[FLAGS.network][1]

    if FLAGS.variables_npz:
        if FLAGS.step or FLAGS.use_ema:
            raise SystemExit("--step/--use_ema select train-dir "
                             "checkpoints; they don't apply to "
                             "--variables_npz")
        from tf_face_toolbox_tpu.interop.port import load_variables_npz
        variables = load_variables_npz(FLAGS.variables_npz)
        step = None
    else:
        from tf_face_toolbox_tpu.pretrained import load_variables
        from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

        step = FLAGS.step or CheckpointManager(
            FLAGS.checkpoint_dir).latest_step()
        _, variables = load_variables(
            FLAGS.checkpoint_dir, FLAGS.network, FLAGS.embedding_dim,
            FLAGS.image_size, jnp.float32, use_ema=FLAGS.use_ema,
            step=step)

    sd = variables_to_iresnet_state_dict(
        variables, stage_sizes=tuple(pinned["stage_sizes"]))

    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, FLAGS.output)
    n = sum(int(np.asarray(v).size) for v in sd.values())
    dim = sd["fc.bias"].shape[0]
    norm_note = ("(x - 127.5) / 127.5" if FLAGS.input_norm == "fixed"
                 else "per-image standardization (mean/std per face, "
                      "rsqrt(N) floor)")
    print(f"exported {n:,} weights ({dim}-d embedding"
          f"{'' if step is None else f', step={step}'}"
          f"{', EMA' if FLAGS.use_ema else ''}) to {FLAGS.output}; "
          f"feed the torch side {norm_note}")


if __name__ == "__main__":
    app.run(main)
