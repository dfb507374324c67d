"""iresnet family: flax module, torch state_dict importer, CLI e2e.

The parity oracle is a freshly-written torch expression of the same
architecture (the arcface_torch iresnet block diagram — BN-first basic
blocks, per-channel PReLU, stride-2-per-stage, BN/flatten/FC/BN1d "E"
head) with InsightFace's state_dict naming, so the importer is tested
against exactly the key layout real published checkpoints use.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_face_toolbox_tpu.interop.torch_iresnet import (
    iresnet_state_dict_to_variables,
)
from tf_face_toolbox_tpu.models import create_network, init_variables
from tf_face_toolbox_tpu.models.iresnet import IResNet

STAGES = (1, 2)
WIDTHS = (8, 16)
DIM = 8
SIZE = 16


def _torch_iresnet(stages=STAGES, widths=WIDTHS, dim=DIM,
                   size=SIZE):
    """A torch iresnet with InsightFace state_dict key names."""
    import torch
    from torch import nn as tnn

    class Block(tnn.Module):
        def __init__(self, inp, planes, stride):
            super().__init__()
            self.bn1 = tnn.BatchNorm2d(inp)
            self.conv1 = tnn.Conv2d(inp, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.prelu = tnn.PReLU(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1,
                                    bias=False)
            self.bn3 = tnn.BatchNorm2d(planes)
            self.downsample = None
            if stride != 1 or inp != planes:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes))

        def forward(self, x):
            y = self.bn3(self.conv2(self.prelu(
                self.bn2(self.conv1(self.bn1(x))))))
            return y + (x if self.downsample is None
                        else self.downsample(x))

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, widths[0], 3, 1, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(widths[0])
            self.prelu = tnn.PReLU(widths[0])
            inp = widths[0]
            for s, (n, w) in enumerate(zip(stages, widths)):
                blocks = []
                for b in range(n):
                    blocks.append(Block(inp, w, 2 if b == 0 else 1))
                    inp = w
                setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))
            self.bn2 = tnn.BatchNorm2d(inp)
            sp = size // (2 ** len(stages))
            self.fc = tnn.Linear(inp * sp * sp, dim)
            self.features = tnn.BatchNorm1d(dim)

        def forward(self, x):
            x = self.prelu(self.bn1(self.conv1(x)))
            for s in range(len(stages)):
                x = getattr(self, f"layer{s + 1}")(x)
            x = torch.flatten(self.bn2(x), 1)
            return self.features(self.fc(x))

    torch.manual_seed(3)
    net = Net()
    # Randomize everything the importer must carry: conv/fc weights,
    # BN affines, per-channel PReLU slopes...
    for name, p in net.named_parameters():
        with torch.no_grad():
            if "bn" in name or "features" in name or \
                    "downsample.1" in name:
                p.add_(0.3 * torch.randn_like(p))
            else:
                p.copy_(0.2 * torch.randn_like(p))
    # ...and the BN running stats (a couple of train-mode batches moves
    # them off their mean-0/var-1 init).
    net.train()
    for i in range(2):
        net(torch.randn(8, 3, size, size))
    net.eval()
    return net


def _flax_net():
    return IResNet(stage_sizes=STAGES, stage_widths=WIDTHS,
                   embedding_dim=DIM)


@pytest.mark.mid
def test_torch_state_dict_parity():
    """Imported torch weights reproduce the torch forward exactly
    (the cosine >=0.999 currency, but asserted at f32 allclose)."""
    import torch

    tnet = _torch_iresnet()
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = iresnet_state_dict_to_variables(sd, stage_sizes=STAGES)

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, SIZE, SIZE, 3)).astype(np.float32)
    xn = (u8 - 127.5) / 127.5
    with torch.no_grad():
        ref = tnet(torch.tensor(xn).permute(0, 3, 1, 2)).numpy()
    out = _flax_net().apply(variables, jnp.asarray(xn), train=False)
    np.testing.assert_allclose(np.asarray(out), ref,
                               rtol=2e-4, atol=5e-4)


def test_exporter_roundtrips_to_torch():
    """variables → state_dict loads into a real torch module with
    strict=True and reproduces the original torch forward; and
    import(export(v)) is bit-identical on every leaf (the two mappings
    are exact inverses)."""
    import torch

    from tf_face_toolbox_tpu.interop.torch_iresnet import (
        variables_to_iresnet_state_dict,
    )

    tnet = _torch_iresnet()
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = iresnet_state_dict_to_variables(sd, stage_sizes=STAGES)

    out_sd = variables_to_iresnet_state_dict(variables,
                                             stage_sizes=STAGES)
    # Same keys as a real torch module (incl. num_batches_tracked),
    # and strict load succeeds.
    assert set(out_sd) == set(sd)
    tnet2 = _torch_iresnet()
    tnet2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in out_sd.items()}, strict=True)
    tnet2.eval()
    x = torch.tensor(np.random.default_rng(1).normal(
        size=(3, 3, SIZE, SIZE)).astype(np.float32))
    with torch.no_grad():
        np.testing.assert_allclose(tnet2(x).numpy(), tnet(x).numpy(),
                                   rtol=1e-5, atol=1e-5)

    # flax-side round trip: bit-exact on every leaf.
    back = iresnet_state_dict_to_variables(out_sd, stage_sizes=STAGES)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(back)[0],
            jax.tree_util.tree_flatten_with_path(variables)[0]):
        assert pa == pb
        np.testing.assert_array_equal(a, b, err_msg=str(pa))


def test_importer_strict_catches_mismatch():
    import torch  # noqa: F401

    tnet = _torch_iresnet()
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    sd["kps.weight"] = np.zeros(3, np.float32)  # a bundled extra head
    with pytest.raises(ValueError, match="unconsumed"):
        iresnet_state_dict_to_variables(sd, stage_sizes=STAGES)
    variables = iresnet_state_dict_to_variables(sd, stage_sizes=STAGES,
                                                strict=False)
    assert "conv1" in variables["params"]


def test_imported_tree_matches_init_tree():
    """The importer's tree is structurally identical to net.init's —
    what cli.import_torch's shape gate enforces for real checkpoints."""
    import torch  # noqa: F401

    tnet = _torch_iresnet()
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    imported = iresnet_state_dict_to_variables(sd, stage_sizes=STAGES)
    ref = init_variables(_flax_net(), jax.random.key(0),
                         (1, SIZE, SIZE, 3))
    ref = {k: ref[k] for k in ("params", "batch_stats")}
    assert jax.tree_util.tree_structure(imported) == \
        jax.tree_util.tree_structure(jax.tree.map(np.asarray, ref))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(imported)[0],
            jax.tree_util.tree_flatten_with_path(ref)[0]):
        assert a.shape == b.shape, (pa, a.shape, b.shape)


def test_factory_and_embedding_contract():
    net = create_network("iresnet_tiny", embedding_dim=DIM)
    variables = init_variables(net, jax.random.key(0),
                               (1, SIZE, SIZE, 3))
    out = net.apply(variables, jnp.ones((2, SIZE, SIZE, 3)), train=False)
    assert out.shape == (2, DIM) and out.dtype == jnp.float32
    # structural pins refuse wrong configs loudly
    with pytest.raises(ValueError, match="int8"):
        create_network("iresnet_tiny", quantized="static").apply(
            variables, jnp.ones((1, SIZE, SIZE, 3)), train=False)


@pytest.mark.mid
def test_train_mode_updates_stats_and_grads_flow():
    net = _flax_net()
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
    # BN stats moved and every param got a gradient signal path
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    gnorms = [float(jnp.linalg.norm(g)) for g in
              jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(gnorms)) and max(gnorms) > 0


@pytest.mark.slow
def test_export_torch_cli_roundtrip(tmp_path):
    """npz → cli.export_torch → cli.import_torch → npz: the TPU→torch
    hand-off survives a full CLI round trip bit-exactly."""
    from tf_face_toolbox_tpu.interop.port import (
        load_variables_npz,
        save_variables_npz,
    )

    net = create_network("iresnet_tiny", embedding_dim=DIM)
    variables = init_variables(net, jax.random.key(7),
                               (1, SIZE, SIZE, 3))
    variables = {k: variables[k] for k in ("params", "batch_stats")}
    npz = str(tmp_path / "in.npz")
    save_variables_npz(npz, variables)

    def _run(args):
        env = dict(os.environ)
        env["TFFT_PLATFORM"] = "cpu"
        r = subprocess.run([sys.executable, "-m"] + args,
                           capture_output=True, text=True, env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        assert r.returncode == 0, f"{args}:\n{r.stdout}\n{r.stderr}"
        return r.stdout

    pt = str(tmp_path / "out.pth")
    out = _run(["tf_face_toolbox_tpu.cli.export_torch",
                f"--variables_npz={npz}", f"--output={pt}",
                "--network=iresnet_tiny", "--input_norm=fixed"])
    assert "feed the torch side (x - 127.5) / 127.5" in out

    npz2 = str(tmp_path / "back.npz")
    _run(["tf_face_toolbox_tpu.cli.import_torch", f"--pt={pt}",
          f"--output={npz2}", "--network=iresnet_tiny",
          f"--image_size={SIZE}"])
    back = load_variables_npz(npz2)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(back)[0],
            jax.tree_util.tree_flatten_with_path(
                jax.tree.map(np.asarray, variables))[0]):
        assert pa == pb
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b, dtype=np.float32),
            err_msg=str(pa))


@pytest.mark.slow
def test_import_torch_cli_e2e(tmp_path):
    """torch.save → cli.import_torch → cli.extract --input_norm=fixed:
    the published-checkpoint serving chain, end to end (over the
    registry's iresnet_tiny layout: stages (1, 1), widths (8, 16))."""
    import torch
    from PIL import Image

    tnet = _torch_iresnet(stages=(1, 1))
    pt = str(tmp_path / "ckpt.pth")
    torch.save(tnet.state_dict(), pt)

    def _run(args):
        env = dict(os.environ)
        env["TFFT_PLATFORM"] = "cpu"
        r = subprocess.run([sys.executable, "-m"] + args,
                           capture_output=True, text=True, env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        assert r.returncode == 0, f"{args}:\n{r.stdout}\n{r.stderr}"
        return r.stdout

    npz = str(tmp_path / "ir.npz")
    out = _run(["tf_face_toolbox_tpu.cli.import_torch", f"--pt={pt}",
                f"--output={npz}", "--network=iresnet_tiny",
                f"--image_size={SIZE}"])
    assert "serve with" in out

    rng = np.random.default_rng(5)
    lines = []
    for i in range(8):
        arr = rng.integers(0, 256, (SIZE + 4, SIZE + 4, 3),
                           dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"f{i}.jpg"),
                                  "JPEG", quality=95)
        lines.append(f"f{i}.jpg {i % 2}")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    shard = str(tmp_path / "d.faceshard")
    _run(["tf_face_toolbox_tpu.cli.pack",
          f"--list={tmp_path / 'list.txt'}", f"--root={tmp_path}",
          f"--output={shard}"])
    emb_path = str(tmp_path / "e.npy")
    out = _run(["tf_face_toolbox_tpu.cli.extract",
                f"--variables_npz={npz}", f"--data={shard}",
                f"--output={emb_path}", "--network=iresnet_tiny",
                f"--embedding_dim={DIM}", f"--image_size={SIZE}",
                "--input_norm=fixed", "--batch=8", "--nobf16"])
    assert f"wrote (8, {DIM})" in out
    emb = np.load(emb_path)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0,
                               atol=1e-4)
