"""Sampled Partial-FC hardware A/B at 10^6 identities (r3).

Measures the single-chip train-step rate of resnet_v1_50 with a
1,000,000-class CosFace head, exact full softmax vs sampled Partial-FC
(parallel/sharded_softmax.py), same everything else. At this identity
count the (N, C) logit GEMM + its HBM traffic rival the whole backbone;
sampling at rate r cuts the head's work ~r while keeping the gradient
unbiased (importance-corrected denominator — tests/test_parallel.py).

Timing: each step's state depends on the previous (the natural chain),
so we dispatch K steps and materialize ONE final scalar, differencing
two chain lengths to cancel the tunnel RTT (same methodology as
bench.py; naive per-step block_until_ready lies on this image).

    python tools/pfc_bench.py --num_classes 1000000 --rate 0.01
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tf_face_toolbox_tpu.parallel.mesh import create_mesh  # noqa: E402
from tf_face_toolbox_tpu.train.trainer import (  # noqa: E402
    TrainConfig,
    create_train_state,
    make_train_step,
)


def time_steps(step_fn, state, imgs, labels, *, k1=2, k2=6,
               repeats=5) -> tuple[float, object]:
    """Seconds/step by differenced chained dispatch; returns (t, state)."""
    def run(state, iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step_fn(state, imgs, labels)
        loss = float(jax.device_get(metrics["loss"]))  # forces the chain
        assert loss == loss, "NaN loss"
        return time.perf_counter() - t0, state

    t, state = run(state, k1)   # compile + warm
    samples = []
    for _ in range(repeats):
        t1, state = run(state, k1)
        t2, state = run(state, k2)
        if t2 > t1:
            samples.append((t2 - t1) / (k2 - k1))
    if not samples:
        raise RuntimeError("all timing pairs degenerate")
    samples.sort()
    return samples[len(samples) // 2], state


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--num_classes", type=int, default=1_000_000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--rate", type=float, default=0.01)
    p.add_argument("--network", default="resnet_v1_50")
    p.add_argument("--stem", default="imagenet")
    p.add_argument("--skip_exact", action="store_true",
                   help="only measure the sampled head (exact at 10^6 "
                        "ids is slow/memory-heavy — that is the point)")
    args = p.parse_args()

    mesh = create_mesh()
    imgs = jax.random.normal(jax.random.key(1),
                             (args.batch, 112, 112, 3), jnp.float32)
    labels = jax.random.randint(jax.random.key(2), (args.batch,), 0,
                                args.num_classes, jnp.int32)

    out = {"num_classes": args.num_classes, "batch": args.batch,
           "network": args.network, "stem": args.stem,
           "rate": args.rate}
    for mode, rate in (("sampled", args.rate), ("exact", 1.0)):
        if mode == "exact" and args.skip_exact:
            continue
        cfg = TrainConfig(
            network=args.network, stem=args.stem,
            num_classes=args.num_classes, image_size=112,
            global_batch=args.batch, dtype=jnp.bfloat16,
            augment=False, pfc_sample_rate=rate)
        state, net = create_train_state(cfg, jax.random.key(0), mesh)
        step_fn = make_train_step(net, cfg, mesh, state)
        print(f"# {mode}: compiling + timing...", flush=True)
        sec, state = time_steps(step_fn, state, imgs, labels)
        del state
        out[mode] = {"sec_per_step": round(sec, 4),
                     "faces_per_sec": round(args.batch / sec, 1)}
        print(f"# {mode}: {sec * 1e3:.1f} ms/step "
              f"({args.batch / sec:,.0f} faces/sec)", flush=True)
    if "exact" in out and "sampled" in out:
        out["speedup"] = round(out["exact"]["sec_per_step"]
                               / out["sampled"]["sec_per_step"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
