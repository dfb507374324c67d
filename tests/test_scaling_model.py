"""tools/scaling_model.py: the collective inventory read off the
lowered SPMD train step must match what the sharding design implies —
the falsifiable half of the v5e-8 performance prediction (VERDICT r3
next-step #3) is exercised end-to-end on the virtual CPU mesh.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools"))

import scaling_model  # noqa: E402

from tf_face_toolbox_tpu.parallel.mesh import create_mesh  # noqa: E402
from tf_face_toolbox_tpu.train.trainer import (  # noqa: E402
    TrainConfig,
    create_train_state,
    make_train_step,
)


def _tiny_cfg(**kw):
    return TrainConfig(network="resnet_tiny", embedding_dim=16,
                       num_classes=16, image_size=16, crop_from=20,
                       global_batch=16, augment=True,
                       dtype=jnp.float32, **kw)


def _analyze(data, model, **cfg_kw):
    cfg = _tiny_cfg(**cfg_kw)
    mesh = create_mesh(data=data, model=model)
    state, net = create_train_state(cfg, jax.random.key(0), mesh)
    step_fn = make_train_step(net, cfg, mesh, state)
    images = jax.ShapeDtypeStruct(
        (cfg.global_batch, cfg.crop_from, cfg.crop_from, 3), jnp.uint8)
    labels = jax.ShapeDtypeStruct((cfg.global_batch,), jnp.int32)
    report = scaling_model.analyze(step_fn, state, images, labels,
                                   data=data, model=model)
    params_bytes = sum(x.size * x.dtype.itemsize for x in
                       jax.tree_util.tree_leaves(state.params))
    return report, params_bytes


def test_pure_dp_gradient_allreduce_volume():
    """(8, 1) mesh: the dominant collective must be the backbone
    gradient all-reduce — its ring volume is predictable from the
    param count alone: 2 * P * (g-1)/g sent per chip."""
    report, params_bytes = _analyze(8, 1)
    rows = report["collectives"]
    # every group must span all 8 devices (model groups are trivial)
    real = [r for r in rows if r["ici_sent_mb_per_chip"] > 0]
    assert real and all(r["axis"] == "all" for r in real)
    total = sum(r["ici_sent_mb_per_chip"] for r in real) * 1e6
    floor = 2 * params_bytes * 7 / 8          # grads alone
    assert total >= floor * 0.98
    # and not wildly more: grads + loss scalars + classifier grads
    # (classifier here is tiny) stay within 2x of the floor
    assert total <= floor * 2.0
    assert report["ici_sent_mb_per_chip_per_step"] > 0


def test_tp_mesh_has_model_axis_collectives():
    """(4, 2) mesh with the class-sharded head: the lowered step must
    carry BOTH data-axis gradient reduction and model-axis head
    collectives (embedding all_gather / logit psum)."""
    report, params_bytes = _analyze(4, 2)
    axes = {r["axis"] for r in report["collectives"]
            if r["ici_sent_mb_per_chip"] > 0}
    assert "model" in axes
    assert axes & {"data", "all"}
    gathers = [r for r in report["collectives"]
               if r["kind"] == "all_gather" and r["axis"] == "model"
               and r["group_size"] == 2]
    assert gathers, "class-sharded head must all_gather over model axis"


def test_ici_cost_formulas():
    assert scaling_model.ici_sent_bytes("all_reduce", 100, 4) == 150.0
    assert scaling_model.ici_sent_bytes("all_gather", 100, 4) == 300.0
    assert scaling_model.ici_sent_bytes("reduce_scatter", 100, 4) == 75.0
    assert scaling_model.ici_sent_bytes("all_reduce", 100, 1) == 0.0


def test_classify_axis():
    # device id = d*model + m (create_mesh ordering), data=4, model=2
    data_groups = [[0, 2, 4, 6], [1, 3, 5, 7]]
    model_groups = [[0, 1], [2, 3], [4, 5], [6, 7]]
    assert scaling_model.classify_axis(data_groups, 4, 2) == "data"
    assert scaling_model.classify_axis(model_groups, 4, 2) == "model"
    assert scaling_model.classify_axis([list(range(8))], 4, 2) == "all"
    assert scaling_model.classify_axis(None, 4, 2) == "pairs"
    assert scaling_model.classify_axis([[0, 3]], 4, 2) == "other"


@pytest.mark.mid
def test_sampled_pfc_classifier_grad_collective_is_compact():
    """VERDICT r4 #2: with sampled Partial-FC the classifier-gradient
    data collective must move the COMPACT (budget, D) cotangent, not
    the full (C_local, D) shard. Read straight off the lowered HLO."""
    import math

    c, d_emb, model = 4096, 16, 4
    rate = 0.1
    def analyze_with(**kw):
        import scaling_model as sm
        cfg = TrainConfig(network="resnet_tiny", image_size=16,
                          crop_from=20, global_batch=16, augment=True,
                          dtype=jnp.float32, num_classes=c,
                          embedding_dim=d_emb, **kw)
        mesh = create_mesh(data=2, model=model)
        state, net = create_train_state(cfg, jax.random.key(0), mesh)
        step_fn = make_train_step(net, cfg, mesh, state)
        images = jax.ShapeDtypeStruct(
            (cfg.global_batch, cfg.crop_from, cfg.crop_from, 3),
            jnp.uint8)
        labels = jax.ShapeDtypeStruct((cfg.global_batch,), jnp.int32)
        return sm.analyze(step_fn, state, images, labels, data=2,
                          model=model)

    report = analyze_with(pfc_sample_rate=rate)
    c_local = c // model
    budget = min(max(math.ceil(rate * c_local), 16), c_local)  # 410
    full_bytes = c_local * d_emb * 4            # 65536
    compact_bytes = budget * d_emb * 4          # 26240
    data_rows = [r for r in report["collectives"]
                 if r["axis"] == "data" and r["group_size"] == 2]
    sizes = sorted(r["local_mb"] for r in data_rows)
    assert round(compact_bytes / 1e6, 3) in sizes, (sizes, compact_bytes)
    assert round(full_bytes / 1e6, 3) not in sizes, (sizes, full_bytes)

    # control: the exact head (rate 1.0) DOES move the full shard
    report_x = analyze_with(pfc_sample_rate=1.0)
    sizes_x = [r["local_mb"] for r in report_x["collectives"]
               if r["axis"] == "data" and r["group_size"] == 2]
    assert round(full_bytes / 1e6, 3) in sizes_x, (sizes_x, full_bytes)
