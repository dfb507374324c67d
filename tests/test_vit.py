"""FaceViT (JPEG-block-token ViT): factory contract, DCT-token parity,
attention math, training integration.

Beyond-reference family (SURVEY.md §2a zoo + models/vit.py; PAPERS.md
"RGB no more"). The contract under test: tokens are the 8×8 DCT blocks,
so the net shares the dct stem's two entry modes (pixels ≡ prepared
coefficients) and the frequency-domain flip — the whole zero-decode
serving path applies unchanged.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_face_toolbox_tpu.models import create_network, init_variables
from tf_face_toolbox_tpu.models.vit import FaceViT, MultiHeadAttention
from tf_face_toolbox_tpu.ops import dct as dct_ops

SIZE = 16   # 2×2 token grid
DIM = 8


def _tiny():
    return create_network("dct_vit_test", embedding_dim=DIM)


def _pixels(n=2, size=SIZE, seed=0):
    return jax.random.randint(jax.random.key(seed), (n, size, size, 3),
                              0, 256).astype(jnp.float32)


@pytest.mark.mid
def test_factory_and_embedding_contract():
    net = _tiny()
    variables = init_variables(net, jax.random.key(0),
                               (1, SIZE, SIZE, 3))
    out = net.apply(variables, jnp.ones((2, SIZE, SIZE, 3)), train=False)
    assert out.shape == (2, DIM) and out.dtype == jnp.float32


def test_pixels_and_coefficients_agree():
    """The two entry modes are the same computation (one param tree)."""
    net = _tiny()
    x = _pixels()
    v = init_variables(net, jax.random.key(0), (2, SIZE, SIZE, 3))
    e_pix = net.apply(v, x, train=False)
    e_coef = net.apply(v, dct_ops.block_dct(x), train=False)
    np.testing.assert_allclose(np.asarray(e_pix), np.asarray(e_coef),
                               atol=1e-5)


def test_frequency_domain_flip_matches_pixel_flip():
    """f(flip(x)) == f(flip_coefficients(dct(x))) — the identity the
    flip-averaged zero-decode extraction rides (extract.py)."""
    net = _tiny()
    x = _pixels()
    v = init_variables(net, jax.random.key(0), (2, SIZE, SIZE, 3))
    e_pixflip = net.apply(v, x[:, :, ::-1, :], train=False)
    e_coefflip = net.apply(v, dct_ops.flip_coefficients(
        dct_ops.block_dct(x)), train=False)
    np.testing.assert_allclose(np.asarray(e_pixflip),
                               np.asarray(e_coefflip), atol=1e-5)


def test_structural_pins_refuse():
    variables = init_variables(_tiny(), jax.random.key(0),
                               (1, SIZE, SIZE, 3))
    with pytest.raises(ValueError, match="int8"):
        create_network("dct_vit_test", quantized="static").apply(
            variables, jnp.ones((1, SIZE, SIZE, 3)), train=False)
    with pytest.raises(ValueError, match="DCT blocks"):
        FaceViT(depth=2, width=32, num_heads=2, stem="face").apply(
            variables, jnp.ones((1, SIZE, SIZE, 3)), train=False)
    with pytest.raises(ValueError, match="head"):
        FaceViT(depth=2, width=32, num_heads=2,
                head_variant="flatten").apply(
            variables, jnp.ones((1, SIZE, SIZE, 3)), train=False)


def test_rejects_bad_trailing_dim():
    with pytest.raises(ValueError, match="dct tokens"):
        _tiny().init(jax.random.key(0), jnp.zeros((1, 2, 2, 64)),
                     train=False)


def test_factory_pins_stem_over_cli_default():
    net = create_network("dct_vit_test", embedding_dim=DIM, stem="face")
    assert net.stem == "dct"


def test_attention_matches_naive_oracle():
    """The einsum MHA equals the per-head naive softmax(QKᵀ/√d)V."""
    mha = MultiHeadAttention(num_heads=2)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 5, 8)).astype(np.float32))
    v = mha.init(jax.random.key(0), x)
    got = np.asarray(mha.apply(v, x))

    wqkv = np.asarray(v["params"]["qkv"]["kernel"])
    bqkv = np.asarray(v["params"]["qkv"]["bias"])
    wout = np.asarray(v["params"]["out"]["kernel"])
    bout = np.asarray(v["params"]["out"]["bias"])
    qkv = np.asarray(x) @ wqkv + bqkv               # (2, 5, 24)
    qkv = qkv.reshape(2, 5, 3, 2, 4)
    heads = []
    for h in range(2):
        q, k, vv = qkv[:, :, 0, h], qkv[:, :, 1, h], qkv[:, :, 2, h]
        s = q @ k.transpose(0, 2, 1) / np.sqrt(4.0)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        heads.append(p @ vv)
    # head-major concat matches the module's (..., heads, dh) reshape
    want = np.concatenate(heads, axis=-1) @ wout + bout
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.mid
def test_geometry_and_param_count_small():
    """dct_vit_small at 112²: 196 tokens, ViT-S-class ~22M params."""
    net = create_network("dct_vit_small")
    variables = init_variables(net, jax.random.key(0), (1, 112, 112, 3))
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    assert 20e6 < n_params < 24e6, n_params
    pos = variables["params"]["pos_embedding"]
    assert pos.shape == (1, 196, 384)
    out = net.apply(variables, jnp.ones((1, 112, 112, 3)), train=False)
    assert out.shape == (1, 512)


def test_trains_through_the_trainer():
    """Two SPMD train steps: loss finite and params move (the zoo
    integration contract; the augment chain feeds pixels → in-net DCT)."""
    from tests.test_train import CFG, _run_steps
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh

    cfg = dataclasses.replace(CFG, embedding_dim=DIM)
    mesh = create_mesh()
    net = create_network("dct_vit_test", embedding_dim=DIM)
    state, losses = _run_steps(mesh, 2, cfg=cfg, net=net)
    assert int(state.step) == 2
    assert all(np.isfinite(l) for l in losses)


def test_extraction_flip_average_on_coefficients():
    """flip_averaged_embeddings dispatches the frequency-domain flip on
    192-channel inputs — pixel and coefficient extraction agree."""
    from tf_face_toolbox_tpu.extract import flip_averaged_embeddings

    net = _tiny()
    x = _pixels()
    v = init_variables(net, jax.random.key(0), (2, SIZE, SIZE, 3))

    def apply_fn(variables, images):
        return net.apply(variables, images, train=False)

    e_pix = flip_averaged_embeddings(apply_fn, v, x)
    e_coef = flip_averaged_embeddings(apply_fn, v, dct_ops.block_dct(x))
    np.testing.assert_allclose(np.asarray(e_pix), np.asarray(e_coef),
                               atol=1e-5)


@pytest.mark.mid
def test_drop_path_train_stochastic_eval_deterministic():
    """Stochastic depth: train mode varies with the dropout rng and
    differs from the rate-0 forward; eval mode is deterministic and
    EXACTLY the rate-0 network (no rescale residue)."""
    net = create_network("dct_vit_test", embedding_dim=DIM,
                         drop_path_rate=0.5)
    net0 = create_network("dct_vit_test", embedding_dim=DIM)
    x = _pixels(8)
    v = init_variables(net0, jax.random.key(0), (1, SIZE, SIZE, 3))

    def fwd_train(n, key):
        out, _ = n.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": key})
        return np.asarray(out)

    a = fwd_train(net, jax.random.key(1))
    b = fwd_train(net, jax.random.key(2))
    assert not np.allclose(a, b)                      # rng-dependent
    assert not np.allclose(a, fwd_train(net0, jax.random.key(1)))
    np.testing.assert_array_equal(                    # eval == rate 0
        np.asarray(net.apply(v, x, train=False)),
        np.asarray(net0.apply(v, x, train=False)))


def test_drop_path_trains_through_the_trainer_and_refuses_non_vit():
    from tests.test_train import CFG, _synthetic_batch
    from tf_face_toolbox_tpu.parallel.mesh import create_mesh
    from tf_face_toolbox_tpu.train.trainer import (
        create_train_state, make_train_step)

    cfg = dataclasses.replace(CFG, network="dct_vit_test",
                              embedding_dim=DIM, drop_path_rate=0.3)
    mesh = create_mesh()
    # net=None: the trainer itself must thread drop_path_rate through
    state, net = create_train_state(cfg, jax.random.key(0), mesh)
    assert net.drop_path_rate == 0.3
    step_fn = make_train_step(net, cfg, mesh, state)
    images, labels = _synthetic_batch(jax.random.key(5),
                                      cfg.global_batch, cfg.image_size,
                                      cfg.num_classes)
    state, metrics = step_fn(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    bad = dataclasses.replace(CFG, network="resnet_tiny",
                              drop_path_rate=0.3)
    with pytest.raises(ValueError, match="ViT-family"):
        create_train_state(bad, jax.random.key(0), mesh)


def test_resize_pos_embedding_serves_other_sizes():
    """A 16²-inited ViT re-targeted to 24² runs and keeps identity:
    resizing to the SAME grid is exact, and the resized model's output
    shape contract holds at the new size."""
    from tf_face_toolbox_tpu.models.vit import resize_pos_embedding

    net = _tiny()
    v16 = init_variables(net, jax.random.key(0), (1, SIZE, SIZE, 3))
    same = resize_pos_embedding(v16, (2, 2))
    np.testing.assert_allclose(
        np.asarray(same["params"]["pos_embedding"]),
        np.asarray(v16["params"]["pos_embedding"]), atol=1e-6)
    v24 = resize_pos_embedding(v16, (3, 3))
    assert v24["params"]["pos_embedding"].shape == (1, 9, 32)
    out = net.apply(v24, jnp.ones((2, 24, 24, 3)), train=False)
    assert out.shape == (2, DIM) and np.isfinite(np.asarray(out)).all()
    # the original tree is untouched
    assert v16["params"]["pos_embedding"].shape == (1, 4, 32)
    with pytest.raises(ValueError, match="token count"):
        resize_pos_embedding(v16, (3, 3), old_hw=(1, 3))
