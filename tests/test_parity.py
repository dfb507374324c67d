"""Embedding parity gates (BASELINE: cosine ≥ 0.999 per face).

With the reference mount empty there is no TF checkpoint to compare
against (SURVEY.md §7 "hard parts"), so parity means self-consistency:
jit vs eager, bf16 vs f32 compute, and fused-Pallas vs XLA preprocessing
must all stay within the 0.999-cosine gate on the SAME weights.
"""

import pytest
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tf_face_toolbox_tpu.extract import flip_averaged_embeddings
from tf_face_toolbox_tpu.models import create_network, init_variables


def _cos(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    return (a * b).sum(1)


def _extract(net, variables, x, jit=True):
    fn = functools.partial(
        flip_averaged_embeddings,
        lambda v, i: net.apply(v, i, train=False))
    return jax.jit(fn)(variables, x) if jit else fn(variables, x)


@pytest.mark.mid
def test_jit_vs_eager_cosine():
    net = create_network("resnet_v1_50", embedding_dim=64)
    variables = init_variables(net, jax.random.key(0), (1, 32, 32, 3))
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    e_jit = _extract(net, variables, x, jit=True)
    e_eager = _extract(net, variables, x, jit=False)
    assert _cos(e_jit, e_eager).min() >= 0.999


@pytest.mark.mid
def test_bf16_vs_f32_cosine():
    """bf16 compute must stay within the 0.999 gate of f32 compute."""
    net32 = create_network("resnet_v1_50", embedding_dim=64)
    net16 = create_network("resnet_v1_50", embedding_dim=64,
                           dtype=jnp.bfloat16)
    variables = init_variables(net32, jax.random.key(0), (1, 32, 32, 3))
    x = jax.random.normal(jax.random.key(2), (4, 32, 32, 3))
    e32 = _extract(net32, variables, x)
    e16 = _extract(net16, variables, x)   # same params, bf16 compute
    assert _cos(e32, e16).min() >= 0.999


@pytest.mark.mid
def test_pallas_vs_xla_preprocess_cosine():
    """Fused input kernel must not move embeddings past the gate."""
    from tf_face_toolbox_tpu.ops import preprocess as pp
    from tf_face_toolbox_tpu.ops.pallas_preprocess import (
        fused_eval_preprocess)

    net = create_network("resnet_v1_50", embedding_dim=64)
    variables = init_variables(net, jax.random.key(0), (1, 24, 24, 3))
    raw = jnp.asarray(np.random.default_rng(3).integers(
        0, 256, (4, 28, 28, 3), dtype=np.uint8))
    x_xla = pp.preprocess_eval_resize(raw, 24, 24)
    x_pl = fused_eval_preprocess(raw, 24, 24, interpret=True)
    e1 = _extract(net, variables, x_xla)
    e2 = _extract(net, variables, x_pl)
    assert _cos(e1, e2).min() >= 0.999


@pytest.mark.mid
def test_bf16_weights_cosine():
    """Serving config (bench.py): bf16-stored weights must stay within
    the 0.999 gate of the f32 checkpoint weights."""
    net = create_network("resnet_v1_50", embedding_dim=64,
                         dtype=jnp.bfloat16)
    v = init_variables(net, jax.random.key(0), (1, 32, 32, 3))
    v16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        v)
    x = jax.random.normal(jax.random.key(4), (4, 32, 32, 3))
    e32 = _extract(net, v, x)
    e16 = _extract(net, v16, x)
    assert _cos(e32, e16).min() >= 0.999


@pytest.mark.mid
def test_int8_quantized_serving_cosine():
    """Dynamic W8A8 serving mode: same checkpoint tree as fp; embedding
    cosine vs the bf16 path stays high (documented: PTQ sits below the
    strict 0.999 gate; it is an opt-in throughput mode)."""
    net32 = create_network("resnet_v1_50", embedding_dim=64)
    net8 = create_network("resnet_v1_50", embedding_dim=64,
                          quantized=True)
    variables = init_variables(net32, jax.random.key(0), (1, 32, 32, 3))
    x = jax.random.normal(jax.random.key(5), (4, 32, 32, 3))
    e32 = _extract(net32, variables, x)
    e8 = _extract(net8, variables, x)   # same params, int8 convs
    c = _cos(e32, e8)
    assert np.isfinite(np.asarray(e8)).all()
    assert c.min() >= 0.98, c


# ---------------------------------------------------------------------------
# static-calibration int8 (round 2)
# ---------------------------------------------------------------------------

@pytest.mark.mid
def test_int8_static_calibrated_cosine():
    """Calibrate → quantized='static' serving: frozen per-tensor scales,
    cosine vs fp stays within the PTQ gate and the checkpoint tree
    (params/batch_stats) is untouched."""
    from tf_face_toolbox_tpu.models import calibrate_quant_stats

    net32 = create_network("resnet_v1_50", embedding_dim=64)
    variables = init_variables(net32, jax.random.key(0), (1, 32, 32, 3))
    calib_batches = [
        jax.random.normal(jax.random.key(10 + i), (4, 32, 32, 3))
        for i in range(2)]
    v_cal = calibrate_quant_stats(
        "resnet_v1_50", variables, calib_batches, embedding_dim=64)
    assert "quant_stats" in v_cal
    # params/batch_stats identical objects → same checkpoint serves all
    assert v_cal["params"] is variables["params"]

    net8 = create_network("resnet_v1_50", embedding_dim=64,
                          quantized="static")
    x = jax.random.normal(jax.random.key(5), (4, 32, 32, 3))
    e32 = _extract(net32, variables, x)
    e8 = _extract(net8, v_cal, x)
    c = _cos(e32, e8)
    assert np.isfinite(np.asarray(e8)).all()
    assert c.min() >= 0.98, c


@pytest.mark.mid
def test_int8_static_requires_calibration():
    import pytest

    net8 = create_network("resnet_v1_50", embedding_dim=64,
                          quantized="static")
    variables = init_variables(
        create_network("resnet_v1_50", embedding_dim=64),
        jax.random.key(0), (1, 32, 32, 3))
    x = jax.random.normal(jax.random.key(5), (2, 32, 32, 3))
    with pytest.raises(ValueError, match="calibrate"):
        _extract(net8, variables, x)


@pytest.mark.mid
def test_int8_static_batch_independent_embeddings():
    """Frozen scales ⇒ an image's embedding can't depend on what it was
    batched with (the property dynamic per-sample scales also have, and
    per-batch scales would violate)."""
    from tf_face_toolbox_tpu.models import calibrate_quant_stats

    variables = init_variables(
        create_network("resnet_v1_50", embedding_dim=32),
        jax.random.key(0), (1, 32, 32, 3))
    v_cal = calibrate_quant_stats(
        "resnet_v1_50", variables,
        [jax.random.normal(jax.random.key(3), (4, 32, 32, 3))],
        embedding_dim=32)
    net8 = create_network("resnet_v1_50", embedding_dim=32,
                          quantized="static")
    x = jax.random.normal(jax.random.key(6), (4, 32, 32, 3))
    e_full = np.asarray(_extract(net8, v_cal, x))
    e_solo = np.asarray(_extract(net8, v_cal, x[:1]))
    np.testing.assert_allclose(e_full[:1], e_solo, rtol=1e-5, atol=1e-5)


@pytest.mark.mid
def test_calibration_stats_monotone():
    """act_max only grows as more batches are seen."""
    from tf_face_toolbox_tpu.models import calibrate_quant_stats

    variables = init_variables(
        create_network("resnet_v1_50", embedding_dim=32),
        jax.random.key(0), (1, 32, 32, 3))
    small = [0.1 * jax.random.normal(jax.random.key(1), (2, 32, 32, 3))]
    big = small + [3.0 * jax.random.normal(jax.random.key(2),
                                           (2, 32, 32, 3))]
    v1 = calibrate_quant_stats("resnet_v1_50", variables, small,
                               embedding_dim=32)
    v2 = calibrate_quant_stats("resnet_v1_50", variables, big,
                               embedding_dim=32)
    l1 = jax.tree_util.tree_leaves(v1["quant_stats"])
    l2 = jax.tree_util.tree_leaves(v2["quant_stats"])
    assert all(float(b) >= float(a) for a, b in zip(l1, l2))
    assert any(float(b) > float(a) for a, b in zip(l1, l2))


@pytest.mark.mid
def test_int8_static_composes_with_se_and_groups():
    """The int8 residual carry must compose with SE gating and grouped
    convs (se_resnext family), not just plain ResNet."""
    from tf_face_toolbox_tpu.models import calibrate_quant_stats

    name = "se_resnext_50"
    net32 = create_network(name, embedding_dim=32)
    variables = init_variables(net32, jax.random.key(0), (1, 32, 32, 3))
    v_cal = calibrate_quant_stats(
        name, variables,
        [jax.random.normal(jax.random.key(9), (4, 32, 32, 3))],
        embedding_dim=32)
    net8 = create_network(name, embedding_dim=32, quantized="static")
    x = jax.random.normal(jax.random.key(8), (4, 32, 32, 3))
    e32 = _extract(net32, variables, x)
    e8 = _extract(net8, v_cal, x)
    c = _cos(e32, e8)
    assert np.isfinite(np.asarray(e8)).all()
    assert c.min() >= 0.98, c


@pytest.mark.mid
def test_densenet_int8_static_calibrated_cosine():
    """DenseNet static-int8 (VERDICT r2 #5): per-conv calibrated W8A8
    through the concat topology — same checkpoint tree, PTQ-gated
    cosine vs fp, batch-independent scales."""
    from tf_face_toolbox_tpu.models import calibrate_quant_stats

    kw = dict(stage_sizes=(2, 2), growth_rate=8, embedding_dim=32)
    net32 = create_network("densenet_121", **kw)
    variables = init_variables(net32, jax.random.key(0), (1, 32, 32, 3))
    calib = [jax.random.normal(jax.random.key(20 + i), (4, 32, 32, 3))
             for i in range(2)]
    v_cal = calibrate_quant_stats("densenet_121", variables, calib, **kw)
    assert "quant_stats" in v_cal
    assert v_cal["params"] is variables["params"]

    x = jax.random.normal(jax.random.key(6), (4, 32, 32, 3))
    e32 = _extract(net32, variables, x)
    e8 = _extract(create_network("densenet_121", quantized="static",
                                 **kw), v_cal, x)
    c = _cos(e32, e8)
    assert np.isfinite(np.asarray(e8)).all()
    assert c.min() >= 0.98, c

    # dynamic mode works off the raw checkpoint too
    e8d = _extract(create_network("densenet_121", quantized=True, **kw),
                   variables, x)
    assert _cos(e32, e8d).min() >= 0.98

    # static without calibration refuses loudly
    import pytest
    with pytest.raises(ValueError, match="calibrated quant_stats"):
        _extract(create_network("densenet_121", quantized="static",
                                **kw), variables, x)


@pytest.mark.mid
def test_resnext_int8_static_dense_mode():
    """static_dense: grouped 3x3s stay fp (their per-group MXU shapes
    can't profit from int8 — r3 ResNeXt finding), dense convs + the
    residual carry run calibrated int8; cosine gate as for static."""
    from tf_face_toolbox_tpu.models import calibrate_quant_stats

    kw = dict(stage_sizes=(1, 1), groups=8, width_per_group=4,
              expansion=2, embedding_dim=32)
    net32 = create_network("resnext_50", **{**kw, "stage_sizes": (1, 1)})
    variables = init_variables(net32, jax.random.key(0), (1, 32, 32, 3))
    calib = [jax.random.normal(jax.random.key(30 + i), (4, 32, 32, 3))
             for i in range(2)]
    v_cal = calibrate_quant_stats("resnext_50", variables, calib, **kw)
    x = jax.random.normal(jax.random.key(7), (4, 32, 32, 3))
    e32 = _extract(net32, variables, x)
    e8 = _extract(create_network("resnext_50",
                                 quantized="static_dense", **kw),
                  v_cal, x)
    c = _cos(e32, e8)
    assert np.isfinite(np.asarray(e8)).all()
    assert c.min() >= 0.98, c
