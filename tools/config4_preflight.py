"""CONFIG_4 preflight at scale (VERDICT r2 next-step #6).

The longest affordable single-chip hardware rehearsal of BASELINE
configs[3] ("margin-softmax training on CASIA-WebFace, single chip")
before real data lands: ~1k synthetic identities, batch 512, a few
thousand CosFace steps with the in-training eval hook writing an
accuracy-vs-step curve in TensorBoard format, then PTQ + cosine gates
on the TRAINED checkpoint (the r2 gates so far only ran on random
weights).

    python tools/config4_preflight.py --train_dir /tmp/c4 \
        --steps 1500 --network resnet_v1_50 --stem imagenet

Input staging: this image's TPU tunnel moves H2D at ~1-10 MB/s, so
feeding fresh b512 batches from host per step is transfer-bound
(~2-20 s/step of pure copy; see tools/convergence_demo.py). Default
--data=device ships the identity-template bank once and synthesizes
every batch ON-DEVICE (fresh gaussian samples each step, one tiny jit);
--data=pool stages a cycled batch pool instead. Either way the REAL
on-device augment chain runs (random crop 120²→112² + flip +
standardize) with fresh RNG per step. The host input pipeline itself is
exercised by the CLI e2e tests; the slow link is an image artifact, not
a v5e property.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse
import dataclasses  # noqa: F401  (used via TrainConfig fields)
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# TFFT_PLATFORM=cpu gives a deterministic CPU smoke (the env
# JAX_PLATFORMS route is unreliable on this image — cli/__init__.py)
from tf_face_toolbox_tpu.cli import setup_platform  # noqa: E402

setup_platform()

from tf_face_toolbox_tpu.extract import flip_averaged_embeddings  # noqa: E402
from tf_face_toolbox_tpu.models import (  # noqa: E402
    calibrate_quant_stats,
    create_network,
)
from tf_face_toolbox_tpu.ops.verification import verify_pairs  # noqa: E402
from tf_face_toolbox_tpu.parallel.mesh import create_mesh  # noqa: E402
from tf_face_toolbox_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from tf_face_toolbox_tpu.train.trainer import (  # noqa: E402
    TrainConfig,
    create_train_state,
    make_train_step,
)
from tf_face_toolbox_tpu.utils.metrics import MetricLogger  # noqa: E402


def make_templates(num_ids: int, size: int, seed: int = 0) -> np.ndarray:
    """Smooth low-frequency per-identity patterns (convergence_demo's
    recipe, scaled up)."""
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(0.02, 0.2, (num_ids, 6))
    phases = rng.uniform(0, 6.28, (num_ids, 6))
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    t = np.zeros((num_ids, size, size, 3), np.float32)
    for i in range(num_ids):
        for c in range(3):
            t[i, :, :, c] = (
                np.sin(freqs[i, 2 * c] * y * 6.28 + phases[i, 2 * c])
                + np.cos(freqs[i, 2 * c + 1] * x * 6.28
                         + phases[i, 2 * c + 1]))
    return t


def to_u8(arr: np.ndarray) -> np.ndarray:
    return np.clip(arr * 40.0 + 128.0, 0, 255).astype(np.uint8)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--train_dir", required=True)
    p.add_argument("--network", default="resnet_v1_50")
    p.add_argument("--stem", default="imagenet")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--num_ids", type=int, default=1000)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--pool", type=int, default=24,
                   help="device-staged batch pool size (--data=pool)")
    p.add_argument("--data", default="device",
                   choices=["device", "pool"],
                   help="device = ship the templates once and "
                        "synthesize every batch on-device (fresh "
                        "samples each step, ~10x less H2D); pool = "
                        "stage a cycled batch pool")
    p.add_argument("--eval_every", type=int, default=250)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--noise", type=float, default=2.0)
    p.add_argument("--base_lr", type=float, default=0.1)
    p.add_argument("--margin", default="cosface",
                   choices=["cosface", "arcface", "adaface", "magface",
                            "curricular"],
                   help="loss head (r3: the adaptive family preflights "
                        "through the same harness/gates)")
    p.add_argument("--qat", action="store_true",
                   help="train with fake-quant (quantized='qat'): the "
                        "PTQ remedy for stems whose trained weights "
                        "fall under the 0.999 cosine gate. Typical use: "
                        "copy a finished fp train_dir, rerun with "
                        "--qat --steps <old+300> --base_lr 0.001 — the "
                        "resume path turns it into a QAT fine-tune, "
                        "then the same gates run on the QAT weights.")
    args = p.parse_args()

    size, crop_from = 112, 120
    margin_kw = {"cosface": dict(margin_m3=0.2),
                 "arcface": dict(margin_m2=0.3)}.get(args.margin)
    if margin_kw is None:
        from tf_face_toolbox_tpu.ops.losses import (AdaFaceConfig,
                                                    MagFaceConfig)
        margin_kw = {
            "adaface": dict(margin_mode="adaface",
                            adaface=AdaFaceConfig(m=0.25)),
            "magface": dict(margin_mode="magface",
                            magface=MagFaceConfig(l_m=0.2, u_m=0.45,
                                                  lambda_g=5.0)),
            "curricular": dict(margin_mode="curricular", margin_m2=0.3),
        }[args.margin]
    cfg = TrainConfig(
        network=args.network, stem=args.stem,
        num_classes=args.num_ids, image_size=size,
        global_batch=args.batch, dtype=jnp.bfloat16,
        augment=True, crop_from=crop_from,
        base_lr=args.base_lr, warmup_steps=100,
        lr_boundaries=(int(args.steps * 0.6), int(args.steps * 0.85)),
        margin_scale=32.0, weight_decay=5e-4,
        quantized="qat" if args.qat else False, **margin_kw)

    print(f"# templates: {args.num_ids} ids at {crop_from}²", flush=True)
    templates = make_templates(args.num_ids, crop_from)
    rng = np.random.default_rng(1)

    def sample_u8(n):
        labels = rng.integers(0, args.num_ids, n)
        imgs = templates[labels] + args.noise * rng.normal(
            size=(n, crop_from, crop_from, 3)).astype(np.float32)
        return to_u8(imgs), labels.astype(np.int32)

    mesh = create_mesh()
    state, net = create_train_state(cfg, jax.random.key(0), mesh)
    step_fn = make_train_step(net, cfg, mesh, state)
    mgr = CheckpointManager(args.train_dir, save_every=args.save_every)
    logger = MetricLogger(args.train_dir, batch_size=args.batch)
    start = 0
    if mgr.tree_metadata() is not None:
        # Preemption rehearsal: a killed run restarts with the same
        # command and continues from the last flushed checkpoint (the
        # same restore path cli.train uses; bit-exact resume is pinned
        # by tests/test_train.py on the CPU mesh).
        state = mgr.restore(state)
        start = int(jax.device_get(state.step))
        print(f"# resumed from {args.train_dir} at step {start}",
              flush=True)

    if args.data == "pool":
        print(f"# staging {args.pool} x b{args.batch} batches on device "
              f"(~{args.pool * args.batch * crop_from**2 * 3 >> 20} MB)",
              flush=True)
        pool = []
        for _ in range(args.pool):
            imgs, labels = sample_u8(args.batch)
            pool.append((jax.device_put(imgs), jax.device_put(labels)))

        def next_batch(i):
            return pool[i % args.pool]
    else:
        # ship the template bank once (u8), synthesize batches on-device
        # — the tunnel's H2D is the bottleneck, and fresh samples every
        # step beat a cycled pool anyway
        print(f"# staging template bank "
              f"(~{args.num_ids * crop_from**2 * 3 >> 20} MB) + "
              f"on-device batch synthesis", flush=True)
        bank = jax.device_put(to_u8(templates))

        @jax.jit
        def synth(key):
            kl, kn = jax.random.split(key)
            labels = jax.random.randint(kl, (args.batch,), 0,
                                        args.num_ids)
            base = bank[labels].astype(jnp.float32)
            noise = (args.noise * 40.0) * jax.random.normal(
                kn, (args.batch, crop_from, crop_from, 3))
            imgs = jnp.clip(base + noise, 0, 255).astype(jnp.uint8)
            return imgs, labels.astype(jnp.int32)

        def next_batch(i):
            return synth(jax.random.key(777 + i))

    # held-out eval: fresh noise on a template subset, LFW-style pairs
    # 2*n pairs must split into the 10 LFW folds
    n_eval_ids = max(5, min(300, args.num_ids) // 5 * 5)
    eval_ids = np.arange(n_eval_ids)
    ev_imgs_a = to_u8(templates[eval_ids][:, 4:116, 4:116]
                      + args.noise * rng.normal(
                          size=(n_eval_ids, size, size, 3)))
    ev_imgs_b = to_u8(templates[eval_ids][:, 4:116, 4:116]
                      + args.noise * rng.normal(
                          size=(n_eval_ids, size, size, 3)))
    # pairs: (a_i, b_i) same; (a_i, b_{i+1}) diff — interleaved
    from tf_face_toolbox_tpu.ops.preprocess import per_image_standardization
    ev_a = jax.device_put(per_image_standardization(
        jnp.asarray(ev_imgs_a, jnp.float32)))
    ev_b = jax.device_put(per_image_standardization(
        jnp.asarray(ev_imgs_b, jnp.float32)))

    extract = jax.jit(lambda v, im: flip_averaged_embeddings(
        lambda vv, xx: net.apply(vv, xx, train=False), v, im))

    def evaluate(variables):
        ea = np.asarray(extract(variables, ev_a))
        eb = np.asarray(extract(variables, ev_b))
        e1 = np.concatenate([ea, ea])
        e2 = np.concatenate([eb, np.roll(eb, -1, axis=0)])
        labels01 = np.array([1] * n_eval_ids + [0] * n_eval_ids)
        order = np.argsort(np.tile(np.arange(n_eval_ids), 2),
                           kind="stable")
        return verify_pairs(e1[order], e2[order], labels01[order])

    curve = []
    t0 = time.time()
    for i in range(start, args.steps):
        imgs, labels = next_batch(i)
        state, metrics = step_fn(state, imgs, labels)
        step = i + 1
        if step % 50 == 0 or step == args.steps:
            host = {k: float(v) for k, v in
                    jax.device_get(metrics).items()}
            host["steps_per_sec"] = (step - start) / (time.time() - t0)
            logger.log(step, host)
            print(f"step {step}: loss={host['loss']:.4f} "
                  f"({host['steps_per_sec']:.2f} steps/s wall)",
                  flush=True)
        if step % args.eval_every == 0 or step == args.steps:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            r = evaluate(variables)
            curve.append((step, r["accuracy_mean"]))
            logger.log(step, {"eval/verification_accuracy":
                              r["accuracy_mean"]})
            print(f"step {step}: verification="
                  f"{r['accuracy_mean']:.4f} ±{r['accuracy_std']:.4f}",
                  flush=True)
        mgr.maybe_save(state, step=step)
    mgr.maybe_save(state, step=args.steps, force=True)
    mgr.wait()
    logger.flush()

    # ---- PTQ + cosine gates on the TRAINED weights ----
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    e_fp = np.asarray(extract(variables, ev_a))
    kwargs = dict(stem=args.stem) if not args.network.startswith(
        "dct") else {}
    int8_fields = {}
    try:
        print("# calibrating static-int8 on trained weights", flush=True)
        v_cal = calibrate_quant_stats(
            args.network, variables,
            [ev_a[i:i + 128] for i in range(0, min(256, n_eval_ids), 128)],
            dtype=jnp.bfloat16, **kwargs)
        net8 = create_network(args.network, dtype=jnp.bfloat16,
                              quantized="static", **kwargs)
        extract8 = jax.jit(lambda v, im: flip_averaged_embeddings(
            lambda vv, xx: net8.apply(vv, xx, train=False), v, im))
        e_i8 = np.asarray(extract8(v_cal, ev_a))
        cos = np.sum(e_fp * e_i8, axis=1)
        ea8 = e_i8
        eb8 = np.asarray(extract8(v_cal, ev_b))
        e1 = np.concatenate([ea8, ea8])
        e2 = np.concatenate([eb8, np.roll(eb8, -1, axis=0)])
        labels01 = np.array([1] * n_eval_ids + [0] * n_eval_ids)
        order = np.argsort(np.tile(np.arange(n_eval_ids), 2),
                           kind="stable")
        r8 = verify_pairs(e1[order], e2[order], labels01[order])
        int8_fields = {
            "final_verification_int8": r8["accuracy_mean"],
            "int8_cosine_min": float(cos.min()),
            "int8_cosine_mean": float(cos.mean()),
        }
    except ValueError as e:
        # ViT/MobileFaceNet refuse int8 by design — the fp curve is
        # still the point of the run; record the refusal verbatim
        print(f"# int8 stage skipped: {e}", flush=True)
        int8_fields = {"int8": f"refused: {e}"}

    summary = {
        "network": args.network, "stem": args.stem,
        "steps": args.steps, "num_ids": args.num_ids,
        "batch": args.batch, "qat": args.qat,
        "curve": curve,
        "final_verification_fp": curve[-1][1],
        "wall_seconds": round(time.time() - t0, 1),
        **int8_fields,
    }
    out = os.path.join(args.train_dir, "preflight_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
