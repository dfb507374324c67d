"""Warm-start (fine-tune) initialization: train.finetune.

The reference era fine-tunes by restoring a pretrained checkpoint while
excluding the classifier scope [TF1-IDIOM]; these tests pin the rebuilt
contract: backbone+BN grafted, classifier/optimizer/step fresh,
mismatched leaves skipped loudly, resume beats warm start.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_face_toolbox_tpu.models import create_network, init_variables
from tf_face_toolbox_tpu.parallel.mesh import create_mesh
from tf_face_toolbox_tpu.train.finetune import (
    graft_tree,
    load_pretrained_variables,
    warm_start_state,
)
from tf_face_toolbox_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
)

CFG = TrainConfig(
    network="resnet_tiny",
    num_classes=12,
    embedding_dim=16,
    image_size=16,
    global_batch=16,
    base_lr=0.05,
    warmup_steps=0,
    margin_m3=0.0,
    margin_scale=16.0,
    weight_decay=0.0,
    augment=False,
    dtype=jnp.float32,
)


def _tree_equal(a, b):
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_graft_tree_copies_matching_and_skips_rest():
    dst = {"a": np.zeros((2, 3)), "b": {"w": np.zeros(4),
                                        "missing": np.zeros(2)},
           "shape_clash": np.zeros((5,))}
    src = {"a": np.ones((2, 3)), "b": {"w": np.full(4, 7.0)},
           "shape_clash": np.ones((6,)), "extra": np.ones(9)}
    out, restored, skipped = graft_tree(dst, src)
    np.testing.assert_array_equal(out["a"], 1.0)
    np.testing.assert_array_equal(out["b"]["w"], 7.0)
    np.testing.assert_array_equal(out["b"]["missing"], 0.0)
    np.testing.assert_array_equal(out["shape_clash"], 0.0)
    assert sorted(restored) == ["a", "b/w"]
    assert any(s.startswith("b/missing") for s in skipped)
    assert any("shape" in s for s in skipped)  # clash is explained


def test_warm_start_grafts_backbone_keeps_classifier_fresh():
    mesh = create_mesh()
    state, net = create_train_state(CFG, jax.random.key(0), mesh)
    src_net = create_network("resnet_tiny", embedding_dim=16,
                             dtype=jnp.float32)
    src = init_variables(src_net, jax.random.key(99), (1, 16, 16, 3))
    assert not _tree_equal(state.params, src["params"])

    new = warm_start_state(state, dict(src))
    assert _tree_equal(new.params, src["params"])
    assert _tree_equal(new.batch_stats, src["batch_stats"])
    # fresh task state: classifier/optimizer/step untouched
    np.testing.assert_array_equal(np.asarray(new.classifier),
                                  np.asarray(state.classifier))
    assert int(new.step) == 0
    # and the grafted (numpy-leaf) state trains
    step_fn = make_train_step(net, CFG, mesh, new)
    images = jnp.zeros((16, 16, 16, 3), jnp.float32)
    labels = jnp.arange(16, dtype=jnp.int32) % 12
    new, metrics = step_fn(new, images, labels)
    assert np.isfinite(float(metrics["loss"]))


def test_warm_start_restarts_ema_from_grafted_weights():
    cfg = dataclasses.replace(CFG, ema_decay=0.9)
    mesh = create_mesh()
    state, _ = create_train_state(cfg, jax.random.key(0), mesh)
    src_net = create_network("resnet_tiny", embedding_dim=16,
                             dtype=jnp.float32)
    src = init_variables(src_net, jax.random.key(99), (1, 16, 16, 3))
    new = warm_start_state(state, dict(src))
    assert new.ema_params is not None
    assert _tree_equal(new.ema_params, src["params"])


def test_warm_start_skips_mismatched_head_restores_convs():
    """A source with a different embedding_dim restores every conv/BN
    and skips only the head projection (the slim exclude-scopes
    behavior, by shape instead of by name)."""
    mesh = create_mesh()
    state, _ = create_train_state(CFG, jax.random.key(0), mesh)
    src_net = create_network("resnet_tiny", embedding_dim=8,
                             dtype=jnp.float32)
    src = init_variables(src_net, jax.random.key(99), (1, 16, 16, 3))
    logs = []
    new = warm_start_state(state, dict(src),
                           log=lambda fmt, *a: logs.append(fmt % a))
    assert logs and "kept fresh" in logs[0]

    def flat(tree):
        return {"/".join(str(getattr(k, "key", k)) for k in p): np.asarray(l)
                for p, l in jax.tree_util.tree_flatten_with_path(tree)[0]}

    got, src_flat, fresh = (flat(new.params), flat(src["params"]),
                            flat(state.params))
    matched = mismatched = 0
    for name, arr in got.items():
        if name in src_flat and src_flat[name].shape == arr.shape:
            np.testing.assert_array_equal(arr, src_flat[name])
            matched += 1
        else:
            np.testing.assert_array_equal(arr, fresh[name])
            mismatched += 1
    assert matched > 0 and mismatched > 0  # both regimes exercised


def test_warm_start_raises_on_foreign_tree():
    mesh = create_mesh()
    state, _ = create_train_state(CFG, jax.random.key(0), mesh)
    with pytest.raises(ValueError, match="restored nothing"):
        warm_start_state(state, {"params": {"not": np.zeros(3)}})


def test_load_pretrained_from_npz(tmp_path):
    from tf_face_toolbox_tpu.interop.port import save_variables_npz

    src_net = create_network("resnet_tiny", embedding_dim=16,
                             dtype=jnp.float32)
    src = init_variables(src_net, jax.random.key(7), (1, 16, 16, 3))
    path = str(tmp_path / "vars.npz")
    save_variables_npz(path, dict(src))
    got = load_pretrained_variables(path)
    assert _tree_equal(got["params"], src["params"])
    with pytest.raises(ValueError, match="use_ema"):
        load_pretrained_variables(path, use_ema=True)


@pytest.mark.mid
def test_load_pretrained_from_train_dir_and_full_cycle(tmp_path):
    """Pretrain 2 steps → checkpoint → fine-tune run with a DIFFERENT
    identity count warm-starts from it: backbone equals the
    checkpointed weights, classifier is task-sized and fresh."""
    from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager

    mesh = create_mesh()
    state, net = create_train_state(CFG, jax.random.key(0), mesh)
    step_fn = make_train_step(net, CFG, mesh, state)
    images = jnp.zeros((16, 16, 16, 3), jnp.float32)
    labels = jnp.arange(16, dtype=jnp.int32) % 12
    for _ in range(2):
        state, _ = step_fn(state, images, labels)
    mgr = CheckpointManager(str(tmp_path / "pre"), save_every=1)
    assert mgr.maybe_save(state, force=True)
    mgr.wait()
    mgr.close()

    ft_cfg = dataclasses.replace(CFG, num_classes=5)
    fresh, _ = create_train_state(ft_cfg, jax.random.key(1), mesh)
    pretrained = load_pretrained_variables(str(tmp_path / "pre"))
    new = warm_start_state(fresh, pretrained)
    assert _tree_equal(new.params, state.params)
    assert _tree_equal(new.batch_stats, state.batch_stats)
    assert new.classifier.shape[0] != state.classifier.shape[0]
    assert int(new.step) == 0

    # architecture delta: a new run with a different embedding_dim must
    # graft every conv/BN and skip only the head projection — the raw
    # (template-free) restore is what makes this a graft-time skip
    # instead of an orbax shape error
    big_cfg = dataclasses.replace(CFG, embedding_dim=32)
    big, _ = create_train_state(big_cfg, jax.random.key(2), mesh)
    grafted = warm_start_state(big, pretrained)
    head = grafted.params["EmbeddingHead_0"]["Dense_0"]["kernel"]
    assert head.shape[-1] == 32                       # kept fresh
    np.testing.assert_array_equal(
        np.asarray(grafted.params["ConvBN_0"]["kernel"]),
        np.asarray(state.params["ConvBN_0"]["kernel"]))

    # CFG trains without EMA; asking for EMA weights must fail loudly
    with pytest.raises(ValueError, match="no EMA"):
        load_pretrained_variables(str(tmp_path / "pre"), use_ema=True)


@pytest.mark.mid
def test_train_loop_resume_beats_warm_start(tmp_path):
    """warm_start must NOT fire when train_dir already holds a
    checkpoint: a preempted fine-tune run resumes its own progress."""
    from tf_face_toolbox_tpu.train.loop import train_loop

    mesh = create_mesh()

    def batches():
        while True:
            yield {"image": np.zeros((16, 16, 16, 3), np.float32),
                   "label": (np.arange(16) % 12).astype(np.int32)}

    train_dir = str(tmp_path / "run")
    fired = []

    def warm(state):
        fired.append(True)
        return state

    train_loop(CFG, mesh, batches(), num_steps=1, train_dir=train_dir,
               save_every=1, log_every=1, warm_start=warm)
    assert fired == [True]  # fresh run: applied once
    train_loop(CFG, mesh, batches(), num_steps=2, train_dir=train_dir,
               save_every=1, log_every=1, warm_start=warm)
    assert fired == [True]  # resumed run: NOT applied again


@pytest.mark.slow
def test_cli_finetune_from(tmp_path):
    """End-to-end flag: pretrain on one shard, fine-tune a new run on
    a different identity count with --finetune_from."""
    import os
    import subprocess
    import sys

    from PIL import Image

    rng = np.random.default_rng(0)
    lines = []
    for i in range(12):
        arr = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"img{i}.jpg"),
                                  "JPEG", quality=95)
        lines.append(f"img{i}.jpg {i % 4}")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")

    def run(args):
        env = dict(os.environ, TFFT_PLATFORM="cpu")
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            " --xla_force_host_platform_device_count=8"
                            ).strip()
        r = subprocess.run([sys.executable, "-m"] + args,
                           capture_output=True, text=True, env=env)
        assert r.returncode == 0, f"{args}:\n{r.stdout}\n{r.stderr}"
        return r.stdout + r.stderr

    shard = str(tmp_path / "data.faceshard")
    run(["tf_face_toolbox_tpu.cli.pack",
         f"--list={tmp_path/'list.txt'}", f"--root={tmp_path}",
         f"--output={shard}"])
    common = ["--network=resnet_tiny", "--embedding_dim=16",
              "--image_size=12", "--crop_from=16", "--global_batch=8",
              "--nobf16", "--save_every=2", "--log_every=1",
              f"--data={shard}"]
    run(["tf_face_toolbox_tpu.cli.train", *common,
         f"--train_dir={tmp_path/'pre'}", "--num_steps=2"])
    out = run(["tf_face_toolbox_tpu.cli.train", *common,
               f"--train_dir={tmp_path/'ft'}", "--num_steps=2",
               "--num_classes=9",  # different identity space
               f"--finetune_from={tmp_path/'pre'}"])
    assert "warm start" in out and "done: step=2" in out
