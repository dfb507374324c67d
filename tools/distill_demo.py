"""Hardware distillation demo: big-net teacher → mobilefacenet student.

The deployment story measured end-to-end on the real chip
(docs/design.md "Embedding-space distillation"):

1. train a ResNet-50 teacher (CosFace, structured synthetic
   identities — the convergence-demo workload);
2. distill a MobileFaceNet student against the FROZEN teacher
   (pure embedding-space cosine, ``cli.train --distill_from``'s
   ``make_train_step(teacher=...)`` path, labels unused);
3. report: teacher/student verification accuracy, student↔teacher
   embedding cosine, **cross-model verification** — gallery embedded
   by the TEACHER, probes by the STUDENT (the no-re-enrollment
   claim), and extraction throughput of both (chained RTT-free
   timing).

Batches are synthesized ON DEVICE from a ~30 MB template bank (the
tunnel's H2D is too slow to stage batches — see tools/qat_study.py).

Run: python tools/distill_demo.py [--teacher_steps 400]
     [--student_steps 600]
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
if os.environ.get("TFFT_PLATFORM"):
    # the axon sitecustomize hook clears JAX_PLATFORMS; the config knob
    # survives it (same recipe as tf_face_toolbox_tpu.cli)
    jax.config.update("jax_platforms", os.environ["TFFT_PLATFORM"])

from tf_face_toolbox_tpu.extract import flip_averaged_embeddings
from tf_face_toolbox_tpu.models import create_network
from tf_face_toolbox_tpu.ops.verification import verify_pairs
from tf_face_toolbox_tpu.parallel.mesh import create_mesh
from tf_face_toolbox_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step)
from tf_face_toolbox_tpu.utils.profiling import chained_seconds_per_call

# module-level workload knobs (overridable for the CPU smoke test)
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


_TPL = None


def templates_dev():
    global _TPL
    if _TPL is None:
        _TPL = jax.device_put(jnp.asarray(make_templates()))
    return _TPL


@jax.jit
def make_batch(tpl, key):
    kl, kn = jax.random.split(key)
    labels = jax.random.randint(kl, (B,), 0, NUM_IDS)
    imgs = tpl[labels] + 2.5 * jax.random.normal(kn, (B, SIZE, SIZE, 3))
    return imgs, labels.astype(jnp.int32)


def run_training(cfg, net, mesh, steps, label, teacher=None):
    state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                    net=net)
    step_fn = make_train_step(net, cfg, mesh, state, teacher=teacher)
    tpl = templates_dev()
    t0 = time.time()
    for step in range(steps):
        imgs, labels = make_batch(tpl, jax.random.key(1000 + step))
        state, m = step_fn(state, imgs, labels)
        if step == 0 or (step + 1) % 100 == 0:
            extra = ""
            if "distill_loss" in m:
                extra = f" distill {float(m['distill_loss']):.4f}"
            print(f"  [{label}] step {step + 1} "
                  f"loss {float(m['loss']):.3f}{extra} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return state, net


def eval_faces():
    r = np.random.default_rng(999)
    labels = np.repeat(r.choice(NUM_IDS, 20, replace=False),
                       6).astype(np.int32)
    imgs = (templates_dev()[jnp.asarray(labels)]
            + 2.5 * jax.random.normal(jax.random.key(999),
                                      (120, SIZE, SIZE, 3)))
    return imgs, labels


def make_extractor(net):
    return jax.jit(lambda v, im: flip_averaged_embeddings(
        lambda vv, xx: net.apply(vv, xx, train=False), v, im))


def paired_eval(emb_a, emb_b, labels):
    """Verification where side 1 comes from emb_a, side 2 from emb_b
    (a == b: ordinary eval; a != b: cross-model enrollment)."""
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
    return verify_pairs(emb_a[i1][order], emb_b[i2][order],
                        lab[order])["accuracy_mean"]


def main():
    global NUM_IDS, SIZE, B
    p = argparse.ArgumentParser()
    p.add_argument("--teacher_steps", type=int, default=400)
    p.add_argument("--student_steps", type=int, default=600)
    p.add_argument("--bench_batch", type=int, default=128)
    p.add_argument("--ids", type=int, default=NUM_IDS)
    p.add_argument("--size", type=int, default=SIZE)
    p.add_argument("--batch", type=int, default=B)
    args = p.parse_args()
    NUM_IDS, SIZE, B = args.ids, args.size, args.batch
    mesh = create_mesh()

    small = SIZE < 112          # CPU smoke: tiny nets, same plumbing
    t_name = "resnet_tiny" if small else "resnet_v1_50"
    s_name = "mobilefacenet_tiny" if small else "mobilefacenet"
    t_cfg = TrainConfig(
        network=t_name, num_classes=NUM_IDS, image_size=SIZE,
        global_batch=B, dtype=jnp.bfloat16, augment=False, base_lr=0.05,
        warmup_steps=50, weight_decay=5e-4, margin_scale=32.0,
        margin_m3=0.2, lr_boundaries=(250, 350),
        stem="face" if small else "imagenet")
    t_net = create_network(t_name, dtype=jnp.bfloat16,
                           **({} if small else {"stem": "imagenet"}))
    print(f"== teacher: {t_name} (CosFace) ==", flush=True)
    t_state, t_net = run_training(t_cfg, t_net, mesh,
                                  args.teacher_steps, "teacher")
    t_vars = {"params": t_state.params,
              "batch_stats": t_state.batch_stats}

    s_cfg = TrainConfig(
        network=s_name, num_classes=NUM_IDS, image_size=SIZE,
        global_batch=B, dtype=jnp.bfloat16, augment=False,
        optimizer="adam", base_lr=2e-3, warmup_steps=20,
        weight_decay=0.0, lr_boundaries=(400,), distill_alpha=1.0)
    s_net = create_network(s_name, dtype=jnp.bfloat16)
    print(f"== student: {s_name} (pure cosine distill) ==", flush=True)
    s_state, s_net = run_training(s_cfg, s_net, mesh,
                                  args.student_steps, "student",
                                  teacher=(t_net, t_vars))
    s_vars = {"params": s_state.params,
              "batch_stats": s_state.batch_stats}

    imgs, labels = eval_faces()
    t_ex, s_ex = make_extractor(t_net), make_extractor(s_net)
    t_emb = np.asarray(t_ex(t_vars, imgs))
    s_emb = np.asarray(s_ex(s_vars, imgs))
    cos = (t_emb * s_emb).sum(1)
    print(f"teacher verification: {paired_eval(t_emb, t_emb, labels):.4f}",
          flush=True)
    print(f"student verification: {paired_eval(s_emb, s_emb, labels):.4f}",
          flush=True)
    print(f"CROSS (teacher gallery / student probe): "
          f"{paired_eval(t_emb, s_emb, labels):.4f}", flush=True)
    print(f"student<->teacher cosine mean={cos.mean():.4f} "
          f"min={cos.min():.4f}", flush=True)

    nb = args.bench_batch
    bench_imgs = jnp.zeros((nb, SIZE, SIZE, 3), jnp.float32)
    for name, ex, v in (("teacher", t_ex, t_vars),
                        ("student", s_ex, s_vars)):
        sec = chained_seconds_per_call(
            lambda im, ex=ex, v=v: ex(v, im), bench_imgs)
        print(f"{name} extraction: {nb / sec:,.0f} faces/sec "
              f"(b{nb}, flip-averaged, chained)", flush=True)


if __name__ == "__main__":
    main()
