"""Import a PyTorch iresnet checkpoint (InsightFace/arcface_torch-style
``state_dict``) into a portable .npz served by ``cli.extract
--variables_npz`` / ``cli.serve --variables_npz``.

    python -m tf_face_toolbox_tpu.cli.import_torch \
        --pt=/models/ms1mv3_arcface_r50.pth \
        --output=/models/ir50.npz --network=iresnet_50

Serve the result with the fixed InsightFace normalization
(``--input_norm=fixed``) — see interop/torch_iresnet.py.
"""

from __future__ import annotations

import jax
import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS

flags.DEFINE_string("pt", None, ".pt/.pth state_dict checkpoint")
flags.DEFINE_string("output", None, "output .npz variables path")
flags.DEFINE_string("network", "iresnet_50",
                    "iresnet registry name (sets the block layout)")
flags.DEFINE_integer("image_size", 112, "input size for the shape check")
flags.DEFINE_bool("strict", True,
                  "fail on unconsumed state_dict entries (disable to "
                  "ignore e.g. a bundled classifier head)")
flags.mark_flag_as_required("pt")
flags.mark_flag_as_required("output")


def main(argv):
    del argv
    from tf_face_toolbox_tpu.cli import setup_platform
    setup_platform()
    from tf_face_toolbox_tpu.interop.port import save_variables_npz
    from tf_face_toolbox_tpu.interop.torch_iresnet import (
        iresnet_state_dict_to_variables,
        load_torch_state_dict,
    )
    from tf_face_toolbox_tpu.models import _REGISTRY, create_network, \
        init_variables

    if not FLAGS.network.startswith("iresnet"):
        raise SystemExit("cli.import_torch maps the iresnet family; for "
                         "TF1/Keras sources use import_tf1/import_keras")
    pinned = _REGISTRY[FLAGS.network][1]
    sd = load_torch_state_dict(FLAGS.pt)
    variables = iresnet_state_dict_to_variables(
        sd, stage_sizes=tuple(pinned["stage_sizes"]),
        strict=FLAGS.strict)

    # Shape-check against a fresh init of the target net: every leaf of
    # the imported tree must exist there with the same shape, so a
    # half-matching checkpoint fails HERE, not at serve time. The
    # embedding dim is read off the checkpoint itself.
    dim = variables["params"]["fc"]["bias"].shape[0]
    net = create_network(FLAGS.network, embedding_dim=dim)
    ref = init_variables(net, jax.random.key(0),
                         (1, FLAGS.image_size, FLAGS.image_size, 3))
    flat_ref = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_flatten_with_path(
                    {k: ref[k] for k in ("params", "batch_stats")})[0]}
    flat_imp = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
                jax.tree_util.tree_flatten_with_path(variables)[0]}
    if flat_ref != flat_imp:
        missing = sorted(set(flat_ref) - set(flat_imp))[:4]
        extra = sorted(set(flat_imp) - set(flat_ref))[:4]
        shapes = sorted(k for k in flat_ref.keys() & flat_imp.keys()
                        if flat_ref[k] != flat_imp[k])[:4]
        raise SystemExit(
            f"imported tree does not match {FLAGS.network}: "
            f"missing={missing} extra={extra} shape-mismatch={shapes}")

    save_variables_npz(FLAGS.output, variables)
    n = sum(np.asarray(v).size for v in
            jax.tree_util.tree_leaves(variables))
    print(f"imported {n:,} weights ({dim}-d embedding) from {FLAGS.pt} "
          f"to {FLAGS.output}; serve with --network={FLAGS.network} "
          f"--input_norm=fixed")


if __name__ == "__main__":
    app.run(main)
