"""Serving engine parity: BN-folded + fused-Pallas forward == net.apply.

The engine executes the SAME checkpoint tree; these tests assert its
embeddings match the flax eval forward (the thing the cosine-parity
gate is anchored to) in f32 near-exactly and in bf16 within rounding.
Pallas runs in interpreter mode here (CPU); the compiled path is
exercised on hardware by bench.py --impl fused.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_face_toolbox_tpu.models import create_network, init_variables
from tf_face_toolbox_tpu.serving import make_serving_apply
from tf_face_toolbox_tpu.serving.fused_block import fused_bottleneck_stack

from tests.util import jit_apply


def _warm_variables(net, rng, shape, steps: int = 2):
    """Init + run train-mode steps so BN stats are non-trivial (folding
    against the init stats mean=0/var=1 would be a weak test)."""
    variables = init_variables(net, rng, shape)
    for i in range(steps):
        x = jax.random.normal(jax.random.key(10 + i), shape) * (1.5 + i)
        _, mutated = net.apply(variables, x, train=True,
                               mutable=["batch_stats"])
        variables = {**variables, "batch_stats": mutated["batch_stats"]}
    return variables


def _cosine(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-30)


# Small net covering: imagenet stem (s1 entry block WITH projection →
# fused entry path; width 32 so stage-0 out 128 != the stem's 64 and the
# projection exists), a strided stage entry (XLA), and fused tails.
_NET_KW = dict(stage_sizes=(2, 2), width_per_group=32, embedding_dim=32)


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.mid
def test_engine_matches_flax_f32(use_pallas):
    net = create_network("resnet_tiny", **_NET_KW, stem="imagenet")
    variables = _warm_variables(net, jax.random.key(0), (4, 32, 32, 3))
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    want = jit_apply(net, variables, x)
    fn = make_serving_apply(net, variables, use_pallas=use_pallas,
                            interpret=True)
    got = fn(None, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("stem", ["face", "space2depth"])
@pytest.mark.mid
def test_engine_stems(stem):
    net = create_network("resnet_tiny", **_NET_KW, stem=stem)
    variables = _warm_variables(net, jax.random.key(0), (2, 16, 16, 3))
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    want = jit_apply(net, variables, x)
    got = make_serving_apply(net, variables, interpret=True)(None, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.mid
def test_engine_bf16_cosine():
    net = create_network("resnet_tiny", **_NET_KW, stem="imagenet",
                         dtype=jnp.bfloat16)
    variables = _warm_variables(net, jax.random.key(0), (4, 32, 32, 3))
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    want = jit_apply(net, variables, x)
    got = make_serving_apply(net, variables, interpret=True)(None, x)
    cos = _cosine(got, want)
    assert cos.min() > 0.999, cos


@pytest.mark.mid
def test_engine_flatten_head_and_se():
    net = create_network("resnet_tiny", **_NET_KW, stem="imagenet",
                         head_variant="flatten", se_reduction=4)
    variables = _warm_variables(net, jax.random.key(0), (2, 32, 32, 3))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    want = jit_apply(net, variables, x)
    # SE blocks stay on the XLA path inside the engine
    got = make_serving_apply(net, variables, interpret=True)(None, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.mid
def test_engine_resnet50_slice():
    """Full-size stage shapes (one imagenet-stem r50 at tiny spatial
    input) — catches stacking/reshape bugs that tiny widths can hide."""
    net = create_network("resnet_v1_50", stem="imagenet")
    variables = _warm_variables(net, jax.random.key(0), (2, 64, 64, 3),
                                steps=1)
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    want = jit_apply(net, variables, x)
    got = make_serving_apply(net, variables, interpret=True)(None, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_engine_refuses_unsupported():
    dense = create_network("densenet_121")
    with pytest.raises(ValueError, match="ResNet family"):
        make_serving_apply(dense, {})
    rx = create_network("resnext_50")
    with pytest.raises(ValueError, match="grouped"):
        make_serving_apply(rx, {})
    q = create_network("resnet_tiny", quantized="static")
    with pytest.raises(ValueError, match="int8"):
        make_serving_apply(q, {})


@pytest.mark.mid
def test_fused_stack_matches_xla_block():
    """Kernel-level check: entry+tail kernel == folded XLA block chain."""
    from tf_face_toolbox_tpu.serving.engine import (
        _fused_operands, _plan_stage_fusion, build_plan)

    net = create_network("resnet_tiny", **_NET_KW, stem="imagenet")
    variables = _warm_variables(net, jax.random.key(0), (2, 32, 32, 3))
    plan = build_plan(net, variables)
    blocks = plan.stages[0]          # s1 entry w/ proj + 1 identity block
    n_xla, entry, tail = _plan_stage_fusion(blocks)
    assert n_xla == 0 and entry is not None and tail is not None

    x = jax.random.normal(jax.random.key(2), (2, 8, 8, 64))  # stem out
    want = x
    for blk in blocks:
        want = blk.apply_xla(want)
    got = fused_bottleneck_stack(x, entry, tail, h=8, w=8,
                                 images_per_step=1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_engine_refuses_dct_stem():
    """The engine's fold plan assumes a pixel stem; it must refuse
    stem='dct' at BUILD time, not crash at apply time (r3)."""
    net = create_network("dct_resnet_50", embedding_dim=32,
                         dtype=jnp.float32, stage_sizes=(1, 1, 1),
                         stage_widths=(16, 32, 64),
                         dct_stem_features=16)
    variables = init_variables(net, jax.random.key(0), (1, 112, 112, 3))
    with pytest.raises(ValueError, match="dct stem"):
        make_serving_apply(net, variables)
