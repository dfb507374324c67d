"""QAT study on hardware: does int8-grid-aware training close the PTQ gap?

Trains the convergence-demo workload (structured synthetic identities,
CosFace, ResNet-50 imagenet stem, real v5e chip) twice — full-precision
and with --qat fake-quant (models/layers.py fake_quant_ste) — then
serves BOTH checkpoints through the calibrate -> static-int8 path and
reports:

  - held-out verification accuracy served fp vs served int8
  - per-face embedding cosine between the fp and int8 servings

The claim under test: QAT raises the fp-vs-int8 cosine (the BASELINE
parity currency) at equal verification accuracy.

Run: python tools/qat_study.py [--steps 300]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tf_face_toolbox_tpu.extract import flip_averaged_embeddings
from tf_face_toolbox_tpu.models import (
    calibrate_quant_stats, create_network)
from tf_face_toolbox_tpu.ops.verification import verify_pairs
from tf_face_toolbox_tpu.parallel.mesh import create_mesh
from tf_face_toolbox_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step)

NUM_IDS, SIZE, B = 200, 112, 256


def make_templates():
    rng = np.random.default_rng(0)
    freqs = rng.uniform(0.02, 0.2, (NUM_IDS, 6))
    phases = rng.uniform(0, 6.28, (NUM_IDS, 6))
    y, x = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    t = np.zeros((NUM_IDS, SIZE, SIZE, 3), np.float32)
    for i in range(NUM_IDS):
        for c in range(3):
            t[i, :, :, c] = (
                np.sin(freqs[i, 2 * c] * y * 6.28 + phases[i, 2 * c])
                + np.cos(freqs[i, 2 * c + 1] * x * 6.28
                         + phases[i, 2 * c + 1]))
    return (t - t.mean()) / (t.std() + 1e-6)


TEMPLATES = make_templates()
# ONE 30 MB transfer; per-step batches are synthesized on device (the
# tunnel's host->device path is ~10 MB/s — staging numpy batches is
# transfer-bound, see tools/convergence_demo.py note).
_TEMPLATES_DEV = None


def _templates_dev():
    global _TEMPLATES_DEV
    if _TEMPLATES_DEV is None:
        _TEMPLATES_DEV = jax.device_put(jnp.asarray(TEMPLATES))
    return _TEMPLATES_DEV


@jax.jit
def make_batch(templates, key):
    kl, kn = jax.random.split(key)
    labels = jax.random.randint(kl, (B,), 0, NUM_IDS)
    imgs = (templates[labels]
            + 2.5 * jax.random.normal(kn, (B, SIZE, SIZE, 3)))
    return imgs, labels.astype(jnp.int32)


def train(quantized, steps, stem):
    cfg = TrainConfig(
        network="resnet_v1_50", num_classes=NUM_IDS, image_size=SIZE,
        global_batch=B, dtype=jnp.bfloat16, augment=False, base_lr=0.05,
        warmup_steps=50, weight_decay=5e-4, margin_scale=32.0,
        margin_m3=0.2, lr_boundaries=(250, 350), stem=stem,
        quantized=quantized)
    mesh = create_mesh()
    state, net = create_train_state(cfg, jax.random.key(0), mesh)
    step_fn = make_train_step(net, cfg, mesh, state)
    t0 = time.time()
    tpl = _templates_dev()
    for step in range(steps):
        imgs, labels = make_batch(tpl, jax.random.key(1000 + step))
        state, m = step_fn(state, imgs, labels)
        if step == 0 or (step + 1) % 100 == 0:
            print(f"  [{quantized or 'fp'}] step {step+1} "
                  f"loss {float(m['loss']):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return state


def eval_faces():
    r = np.random.default_rng(999)
    labels = np.repeat(r.choice(NUM_IDS, 20, replace=False),
                       6).astype(np.int32)
    # synthesize on device (see make_batch note)
    imgs = (_templates_dev()[jnp.asarray(labels)]
            + 2.5 * jax.random.normal(jax.random.key(999),
                                      (120, SIZE, SIZE, 3)))
    return imgs, labels


def verification(emb, labels):
    same, diff = [], []
    n = len(labels)
    for i in range(n):
        for j in range(i + 1, n):
            (same if labels[i] == labels[j] else diff).append((i, j))
    same, diff = same[:100], diff[:100]
    i1 = np.array([p[0] for p in same + diff])
    i2 = np.array([p[1] for p in same + diff])
    lab = np.array([1] * len(same) + [0] * len(diff))
    order = np.argsort(np.tile(np.arange(len(same)), 2), kind="stable")
    return verify_pairs(emb[i1][order], emb[i2][order],
                        lab[order])["accuracy_mean"]


def serve(state, mode, stem):
    """mode: False (fp) or 'static'."""
    imgs, labels = eval_faces()
    variables = {"params": state.params,
                 "batch_stats": state.batch_stats}
    if mode == "static":
        calib = [np.asarray(TEMPLATES[np.random.default_rng(5 + i)
                                      .integers(0, NUM_IDS, 16)])
                 for i in range(2)]
        variables = calibrate_quant_stats(
            "resnet_v1_50", variables, [jnp.asarray(c) for c in calib],
            dtype=jnp.bfloat16, stem=stem)
    net = create_network("resnet_v1_50", dtype=jnp.bfloat16,
                         stem=stem,
                         **({"quantized": mode} if mode else {}))
    fn = jax.jit(lambda v, im: flip_averaged_embeddings(
        lambda vv, xx: net.apply(vv, xx, train=False), v, im))
    emb = np.asarray(fn(variables, imgs))
    return emb, verification(emb, labels)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--stem", default="imagenet",
                   choices=["imagenet", "face", "space2depth"])
    args = p.parse_args()

    for label, q in (("fp", False), ("qat", "qat")):
        print(f"== training: {label} ==", flush=True)
        state = train(q, args.steps, args.stem)
        emb_fp, acc_fp = serve(state, False, args.stem)
        emb_i8, acc_i8 = serve(state, "static", args.stem)
        cos = (emb_fp * emb_i8).sum(1)
        print(f"{label}: verif fp={acc_fp:.3f} int8={acc_i8:.3f}  "
              f"fp-vs-int8 cosine mean={cos.mean():.4f} "
              f"min={cos.min():.4f}", flush=True)


if __name__ == "__main__":
    main()
