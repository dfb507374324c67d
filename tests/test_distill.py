"""Embedding-space distillation: convergence, mesh invariance, CLI.

The deploy-a-small-net workflow (docs/design.md): a student minimizes
1 − cos against a frozen teacher's embeddings so enrolled galleries
keep working. Tests run on the fake 8-device CPU mesh (SURVEY.md §4).
"""

import dataclasses

import jax
import numpy as np
import pytest

from tests.test_train import CFG, _TinyNoBN, _synthetic_batch, _tiny_net
from tf_face_toolbox_tpu.models import init_variables
from tf_face_toolbox_tpu.parallel.mesh import create_mesh
from tf_face_toolbox_tpu.train.trainer import (
    create_train_state,
    make_train_step,
)


def _teacher(seed=7, net=None):
    net = net or _TinyNoBN()
    variables = init_variables(net, jax.random.key(seed), (1, 16, 16, 3))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    return net, variables


def _run_distill(mesh, n_steps, *, alpha, seed=0, net=None,
                 teacher=None):
    cfg = dataclasses.replace(CFG, distill_alpha=alpha)
    state, net = create_train_state(cfg, jax.random.key(seed), mesh,
                                    net=net or _tiny_net())
    step_fn = make_train_step(net, cfg, mesh, state,
                              teacher=teacher or _teacher())
    metrics = {}
    hist = []
    for i in range(n_steps):
        images, labels = _synthetic_batch(
            jax.random.key(100 + i), cfg.global_batch, cfg.image_size,
            cfg.num_classes)
        state, metrics = step_fn(state, images, labels)
        hist.append(float(metrics["distill_loss"]))
    return state, net, metrics, hist


def _cos(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    return (a * b).sum(-1)


@pytest.mark.mid
def test_pure_distill_converges_toward_teacher():
    mesh = create_mesh()
    t_net, t_vars = _teacher()
    state, net, metrics, hist = _run_distill(
        mesh, 15, alpha=1.0, teacher=(t_net, t_vars))
    assert "margin_loss" not in metrics      # labels unused at alpha=1
    assert np.mean(hist[-3:]) < np.mean(hist[:3]), hist
    # held-out batch: student embeddings now point toward teacher's
    images, _ = _synthetic_batch(jax.random.key(999), 16, 16, 12)
    s_emb = net.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      images, train=False)
    t_emb = t_net.apply(t_vars, images, train=False)
    assert _cos(s_emb, t_emb).mean() > 1.0 - np.mean(hist[-3:]) - 0.05


def test_mixed_alpha_reports_both_parts():
    mesh = create_mesh()
    _, _, metrics, hist = _run_distill(mesh, 2, alpha=0.5)
    assert np.isfinite(metrics["distill_loss"])
    assert np.isfinite(metrics["margin_loss"])
    expected = 0.5 * metrics["distill_loss"] + 0.5 * metrics["margin_loss"]
    np.testing.assert_allclose(float(metrics["loss"]), float(expected),
                               rtol=1e-5)


def test_distill_dp_tp_matches_single_device():
    """2 data x 4 model mesh == single device for the mixed loss: pins
    the ÷model-size algebra of the distill term's gradient exchange."""
    t = _teacher()
    mesh24 = create_mesh(data=2, model=4)
    mesh1 = create_mesh(data=1, devices=jax.devices()[:1])
    s24, _, m24, h24 = _run_distill(mesh24, 2, alpha=0.5, seed=3,
                                    net=_TinyNoBN(), teacher=t)
    s1, _, m1, h1 = _run_distill(mesh1, 2, alpha=0.5, seed=3,
                                 net=_TinyNoBN(), teacher=t)
    np.testing.assert_allclose(h24, h1, rtol=2e-4)
    np.testing.assert_allclose(float(m24["loss"]), float(m1["loss"]),
                               rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s24.params),
                    jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)
    c24 = np.asarray(jax.device_get(s24.classifier))
    c1 = np.asarray(jax.device_get(s1.classifier))
    np.testing.assert_allclose(c24, c1, atol=2e-4)


def test_alpha_validation():
    mesh = create_mesh()
    cfg = dataclasses.replace(CFG, distill_alpha=0.0)
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=_tiny_net())
    with pytest.raises(ValueError, match="distill_alpha"):
        make_train_step(net, cfg, mesh, state, teacher=_teacher())


@pytest.mark.slow
def test_distill_cli_e2e(tmp_path):
    """teacher npz → cli.train --distill_from: the CLI wiring."""
    import os
    import subprocess
    import sys

    import numpy as np
    from PIL import Image

    from tf_face_toolbox_tpu.interop.port import save_variables_npz
    from tf_face_toolbox_tpu.models import create_network

    # teacher: a resnet_tiny with random (but fixed) weights
    t_net = create_network("resnet_tiny", embedding_dim=16)
    t_vars = init_variables(t_net, jax.random.key(1), (1, 12, 12, 3))
    npz = str(tmp_path / "teacher.npz")
    save_variables_npz(npz, {"params": t_vars["params"],
                             "batch_stats": t_vars["batch_stats"]})

    rng = np.random.default_rng(0)
    lines = []
    for i in range(16):
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"f{i}.jpg"), "JPEG")
        lines.append(f"f{i}.jpg {i % 4}")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")

    env = dict(os.environ)
    env["TFFT_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _run(args):
        r = subprocess.run([sys.executable, "-m"] + args,
                           capture_output=True, text=True, env=env,
                           cwd=cwd)
        assert r.returncode == 0, f"{args}:\n{r.stdout}\n{r.stderr}"
        return r.stdout

    shard = str(tmp_path / "d.faceshard")
    _run(["tf_face_toolbox_tpu.cli.pack",
          f"--list={tmp_path / 'list.txt'}", f"--root={tmp_path}",
          f"--output={shard}"])
    out = _run(["tf_face_toolbox_tpu.cli.train", f"--data={shard}",
                f"--train_dir={tmp_path / 'run'}",
                "--network=resnet_tiny", "--embedding_dim=16",
                "--image_size=12", "--crop_from=16", "--global_batch=8",
                "--num_steps=2", "--save_every=2", "--log_every=1",
                "--nobf16", f"--distill_from={npz}",
                "--distill_network=resnet_tiny", "--distill_alpha=1.0"])
    assert "done: step=2" in out
