"""Backbone zoo: shape/dtype/param-structure unit tests (SURVEY.md §4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_face_toolbox_tpu.models import create_network, init_variables, list_networks
from tests.util import jit_apply

# Small inputs keep CPU test time sane; stems are resolution-agnostic.
SMALL = 32

FAST_ZOO = ["resnet_v1_50", "se_resnet_50", "resnext_50", "se_resnext_50",
            "densenet_121"]
DEEP_ZOO = [n for n in list_networks() if n not in FAST_ZOO]
# Default gate keeps ONE full backbone shape smoke (resnet_v1_50);
# the other full-size variants compile 15-20 s each on this 1-CPU box
# and gate in the mid tier (make test-mid).
FAST_ZOO_PARAMS = [n if n == "resnet_v1_50"
                   else pytest.param(n, marks=pytest.mark.mid)
                   for n in FAST_ZOO]


@pytest.mark.parametrize("name", FAST_ZOO_PARAMS)
def test_backbone_shapes(name):
    net = create_network(name, embedding_dim=64)
    variables = init_variables(net, jax.random.key(0), (2, SMALL, SMALL, 3))
    emb = jit_apply(net, variables, jnp.zeros((2, SMALL, SMALL, 3)))
    assert emb.shape == (2, 64)
    assert emb.dtype == jnp.float32
    assert "params" in variables and "batch_stats" in variables


@pytest.mark.slow
@pytest.mark.parametrize("name", DEEP_ZOO)
def test_deep_backbone_shapes(name):
    net = create_network(name, embedding_dim=64)
    variables = init_variables(net, jax.random.key(0), (1, SMALL, SMALL, 3))
    emb = jit_apply(net, variables, jnp.zeros((1, SMALL, SMALL, 3)))
    assert emb.shape == (1, 64)


def test_factory_unknown_name():
    with pytest.raises(ValueError, match="unknown network"):
        create_network("vgg_16")


@pytest.mark.mid
def test_resnet50_train_mode_updates_batch_stats():
    net = create_network("resnet_v1_50", embedding_dim=32)
    x = jax.random.normal(jax.random.key(1), (2, SMALL, SMALL, 3))
    variables = init_variables(net, jax.random.key(0), x.shape)
    train_apply = jax.jit(functools.partial(
        net.apply, train=True, mutable=["batch_stats"]))
    emb, mutated = train_apply(variables, x)
    assert emb.shape == (2, 32)
    # Running stats must actually move in train mode.
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


@pytest.mark.mid
def test_bfloat16_compute_f32_params_f32_embedding():
    net = create_network("resnet_v1_50", embedding_dim=32, dtype=jnp.bfloat16)
    variables = init_variables(net, jax.random.key(0), (2, SMALL, SMALL, 3))
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    emb = jit_apply(net, variables, jnp.ones((2, SMALL, SMALL, 3)))
    assert emb.dtype == jnp.float32


@pytest.mark.mid
def test_deterministic_eval():
    net = create_network("se_resnet_50", embedding_dim=32)
    x = jax.random.normal(jax.random.key(2), (2, SMALL, SMALL, 3))
    variables = init_variables(net, jax.random.key(0), x.shape)
    e1 = jit_apply(net, variables, x)
    e2 = jit_apply(net, variables, x)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


@pytest.mark.mid
def test_resnext_grouped_conv_param_shape():
    # ResNeXt-50 stage-0 3x3 kernels must be grouped: kernel (3,3,4,128)
    # since in-channels 128 split over 32 groups = 4.
    net = create_network("resnext_50", embedding_dim=32)
    variables = init_variables(net, jax.random.key(0), (1, SMALL, SMALL, 3))
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    shapes = [tuple(l.shape) for _, l in flat if hasattr(l, "shape")]
    assert (3, 3, 4, 128) in shapes


@pytest.mark.mid
def test_space2depth_stem():
    """TResNet-style s2d stem: same stage resolutions as the face stem
    (final 7x7 map at 112 input → identical embedding pipeline), +11%
    measured extraction throughput on v5e."""
    net = create_network("resnet_v1_50", embedding_dim=32,
                         stem="space2depth")
    variables = init_variables(net, jax.random.key(0), (1, 32, 32, 3))
    emb = jit_apply(net, variables, jnp.zeros((2, 32, 32, 3)))
    assert emb.shape == (2, 32)
    # the s2d stem conv consumes 12 channels (2x2x3 re-layout)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    shapes = {tuple(l.shape) for _, l in flat if hasattr(l, "shape")}
    assert (3, 3, 12, 64) in shapes


@pytest.mark.mid
def test_save_convs_remat_grads_match():
    """remat='save_convs' (save only conv outputs, recompute BN/ReLU in
    backward) must be a pure scheduling change: identical grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf_face_toolbox_tpu.models.resnet import ResNet

    kwargs = dict(stage_sizes=(1, 1), width_per_group=16,
                  embedding_dim=8, stem="face")
    base = ResNet(**kwargs)
    remat = ResNet(remat="save_convs", **kwargs)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    v = jax.jit(lambda r: base.init(r, x, train=False))(jax.random.key(0))

    def loss(net):
        def f(params):
            out, _ = net.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return jax.jit(jax.grad(f))(v["params"])

    g1 = loss(base)
    g2 = loss(remat)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fake_quant_ste_grid_and_gradient():
    """STE fake-quant: forward lands exactly on the int8 grid (clipped
    at ±127·scale), backward is identity."""
    import jax
    import jax.numpy as jnp
    from tf_face_toolbox_tpu.models.layers import fake_quant_ste

    scale = jnp.float32(0.5)
    x = jnp.asarray([0.2, 0.26, -0.74, 63.6, 100.0, -100.0], jnp.float32)
    y = fake_quant_ste(x, scale)
    np.testing.assert_allclose(
        np.asarray(y), [0.0, 0.5, -0.5, 63.5, 63.5, -63.5])
    g = jax.grad(lambda v: fake_quant_ste(v, scale).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.ones(6))
