"""Restore backbone variables from a train checkpoint (flag-free).

The logic behind every consumer of trained weights — ``cli.extract``,
``cli.serve``, and ``train.finetune`` warm starts — lives here rather
than in a CLI module because each CLI owns its own absl flag namespace
(one binary per entry point, like the reference's separate train.py /
features.py [TF1-IDIOM]); importing one CLI from another collides the
namespaces at import time.
"""

from __future__ import annotations

import jax
from absl import logging


def load_variables(checkpoint_dir: str, network: str, embedding_dim: int,
                   image_size: int, dtype, use_ema: bool = False,
                   stem: str = "face", head: str = "gap",
                   quantized: bool | str = False,
                   step: int | None = None):
    """Backbone variables from a train checkpoint (or fresh init).

    Returns ``(net, {"params": ..., "batch_stats": ...})``. The
    checkpoint's identity count and EMA-ness are read from its orbax
    metadata so the restore template matches exactly; ``use_ema``
    selects the EMA weight set (reference
    ``tf.train.ExponentialMovingAverage`` eval convention [TF1-IDIOM]).
    ``step`` pins a specific retained checkpoint (None = latest).
    """
    from tf_face_toolbox_tpu.models import create_network, init_variables

    kwargs = dict(stem=stem, head_variant=head)
    if quantized:
        kwargs["quantized"] = quantized
    net = create_network(network, embedding_dim=embedding_dim, dtype=dtype,
                         **kwargs)
    # Init with the fp twin: a quantized='static' module can't run
    # before calibration, and the param tree is identical by design.
    init_net = (net if not quantized else create_network(
        network, embedding_dim=embedding_dim, dtype=dtype,
        stem=stem, head_variant=head))
    variables = init_variables(init_net, jax.random.key(0),
                               (1, image_size, image_size, 3))
    if checkpoint_dir:
        from tf_face_toolbox_tpu.parallel.mesh import create_mesh
        from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager
        from tf_face_toolbox_tpu.train.trainer import (
            TrainConfig, create_train_state)

        # Restore shapes come from a state built with matching config.
        mgr = CheckpointManager(checkpoint_dir)
        mesh = create_mesh(data=1, devices=jax.devices()[:1])
        # num_classes (and whether EMA was on) are read back from the
        # checkpoint metadata so the template tree matches exactly.
        meta = mgr.tree_metadata(step)
        if meta is None:
            raise FileNotFoundError("no checkpoint found")
        heads = mgr.head_state_children(meta)
        # Template shapes must match the checkpoint exactly. The
        # classifier holds num_classes·subcenters rows and the center
        # table (when present) num_classes rows — recover both counts
        # from the saved shapes so sub-center checkpoints with center
        # loss rebuild the right template (values are unused at
        # serving time).
        # Row counts come from the GLOBAL saved shapes: _METADATA's
        # write_shape is per-shard (a classifier class-sharded over N
        # devices at train time records rows/N there, which rebuilt an
        # N-times-too-narrow template whenever num_classes divided the
        # device count).
        shapes = mgr.global_shapes(step)
        cls_rows = shapes["('classifier',)"][0]
        if "centers" in heads:
            ctr_rows = shapes["('head_state', 'centers')"][0]
            num_classes, subcenters = ctr_rows, cls_rows // ctr_rows
        else:
            num_classes, subcenters = cls_rows, 1
        template, _ = create_train_state(
            TrainConfig(network=network, stem=stem, head_variant=head,
                        embedding_dim=embedding_dim,
                        image_size=image_size, dtype=dtype,
                        num_classes=num_classes, subcenters=subcenters,
                        ema_decay=0.999 if mgr.has_ema(meta) else 0.0,
                        # loss-head aux state (AdaFace stats / center
                        # table) must exist in the template iff the
                        # checkpoint holds it
                        margin_mode=("adaface" if "adaface" in heads
                                     else "curricular"
                                     if "curricular" in heads
                                     else "fixed"),
                        center_weight=1.0 if "centers" in heads else 0.0),
            jax.random.key(0), mesh, net=init_net)
        state = mgr.restore(template, step)
        params = state.params
        if use_ema:
            if state.ema_params is None:
                raise ValueError("--use_ema set but checkpoint has no EMA")
            params = state.ema_params
        variables = {"params": params, "batch_stats": state.batch_stats}
        logging.info("restored step %d from %s (ema=%s)",
                     int(jax.device_get(state.step)), checkpoint_dir,
                     use_ema)
    return net, variables
