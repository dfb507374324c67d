"""MobileFaceNet: factory contract, GDConv math, training integration.

Beyond-reference family (SURVEY.md §2a zoo + models/mobilefacenet.py);
the GDConv einsum is oracle-checked against the depthwise-convolution
definition from the paper.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_face_toolbox_tpu.models import create_network, init_variables
from tf_face_toolbox_tpu.models.mobilefacenet import MobileFaceNet

SIZE = 16
DIM = 8


def _tiny():
    return create_network("mobilefacenet_tiny", embedding_dim=DIM)


@pytest.mark.mid
def test_factory_and_embedding_contract():
    net = _tiny()
    variables = init_variables(net, jax.random.key(0),
                               (1, SIZE, SIZE, 3))
    out = net.apply(variables, jnp.ones((2, SIZE, SIZE, 3)), train=False)
    assert out.shape == (2, DIM) and out.dtype == jnp.float32


def test_structural_pins_refuse():
    variables = init_variables(_tiny(), jax.random.key(0),
                               (1, SIZE, SIZE, 3))
    with pytest.raises(ValueError, match="int8"):
        create_network("mobilefacenet_tiny", quantized="static").apply(
            variables, jnp.ones((1, SIZE, SIZE, 3)), train=False)
    with pytest.raises(ValueError, match="GDConv"):
        MobileFaceNet(head_variant="gap").apply(
            variables, jnp.ones((1, SIZE, SIZE, 3)), train=False)


def test_gdconv_einsum_equals_depthwise_valid_conv():
    """einsum('nhwc,hwc->nc') == depthwise k×k VALID conv with a 1×1
    output map (the paper's GDConv definition)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, 7, 5)).astype(np.float32)
    w = rng.standard_normal((7, 7, 5)).astype(np.float32)
    got = np.einsum("nhwc,hwc->nc", x, w)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w)[:, :, None, :],  # HWIO, I=1, O=C
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=5)
    np.testing.assert_allclose(got, np.asarray(ref)[:, 0, 0, :],
                               rtol=2e-5, atol=2e-5)


def test_bottleneck_residual_only_on_matching_stride1():
    """Stride-1 same-width blocks carry the identity; the linear
    projection means zeroed block params give y == x exactly."""
    from tf_face_toolbox_tpu.models.mobilefacenet import Bottleneck

    blk = Bottleneck(features=6, expansion=2)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((2, 4, 4, 6)).astype(np.float32))
    variables = blk.init(jax.random.key(0), x, False)
    zeroed = jax.tree.map(jnp.zeros_like, variables["params"])
    # zero the projection conv only: output = BN(0) + x = shift + x;
    # with all-zero params BN scale=0 too, so y == x
    out = blk.apply({"params": zeroed,
                     "batch_stats": variables["batch_stats"]}, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               atol=1e-6)


@pytest.mark.mid
def test_full_geometry_and_param_count():
    """The paper net at 112²: FMap-end 7², ~1.2M params at D=512
    (0.99M at the paper's D=128 + the wider linear)."""
    net = create_network("mobilefacenet")
    variables = init_variables(net, jax.random.key(0), (1, 112, 112, 3))
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    assert 0.9e6 < n_params < 1.6e6, n_params
    # GDConv head saw a 7x7 map (the param shape proves the geometry)
    gd = variables["params"]["head"]["gdconv"]
    assert gd.shape == (7, 7, 512)
    out = net.apply(variables, jnp.ones((1, 112, 112, 3)), train=False)
    assert out.shape == (1, 512)


@pytest.mark.mid
def test_train_mode_updates_stats_and_grads_flow():
    net = _tiny()
    variables = init_variables(net, jax.random.key(1),
                               (1, SIZE, SIZE, 3))
    x = jax.random.normal(jax.random.key(2), (4, SIZE, SIZE, 3))

    def loss_fn(params):
        out, mutated = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2), mutated

    (loss, mutated), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    before = variables["batch_stats"]["conv1_bn"]["mean"]
    after = mutated["batch_stats"]["conv1_bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    gnorms = [float(jnp.linalg.norm(g)) for g in
              jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(gnorms)) and max(gnorms) > 0


@pytest.mark.mid
def test_trains_through_the_trainer():
    """Two SPMD train steps on the tiny variant: loss finite and
    params move (the zoo integration contract)."""
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    from tf_face_toolbox_tpu.train.trainer import (
        TrainConfig, create_train_state, make_train_step)

    cfg = TrainConfig(network="mobilefacenet_tiny", num_classes=4,
                      image_size=SIZE, global_batch=8,
                      embedding_dim=DIM, augment=False, base_lr=0.01,
                      warmup_steps=0, dropout_rate=0.1)
    mesh = create_mesh()
    state, net = create_train_state(cfg, jax.random.key(0), mesh)
    step_fn = make_train_step(net, cfg, mesh, state)
    imgs = jax.random.normal(jax.random.key(3), (8, SIZE, SIZE, 3))
    labels = jnp.arange(8, dtype=jnp.int32) % 4
    p0 = jax.tree.map(np.asarray, state.params)
    for _ in range(2):
        state, m = step_fn(state, imgs, labels)
    assert np.isfinite(float(m["loss"]))
    moved = jax.tree.map(lambda a, b: not np.allclose(a, np.asarray(b)),
                         p0, state.params)
    assert any(jax.tree_util.tree_leaves(moved))
