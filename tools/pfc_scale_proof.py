"""Sampled Partial-FC at 10^7 identities: the memory-bound proof.

docs/design.md claims that at 10^7 ids sampling "is what makes the step
fit at all". This tool turns that claim into a measured artifact: it
runs the REAL sharded train step (trainer.make_train_step — the same
program CONFIG_5 compiles) with a 512-d, 10,000,000-class CosFace head
on the virtual 8-device CPU mesh (model=8 class sharding), and reports

- per-step loss (finite, ~log C scale) and wall seconds/step,
- peak RSS against the analytic floor (classifier W + SGD momentum =
  2 x 4CD bytes), i.e. proof that the sampled program materializes no
  hidden O(C) buffer (full logits, full one-hot, unsharded gathers)
  beyond the weights themselves.

The backbone is a deliberately tiny conv net: at this scale the head IS
the model (W = 20.5 GB at C=10^7, D=512), and the point is the head's
memory behavior, not conv throughput. A single v5e chip (16 GB HBM)
cannot hold W+momentum at this scale — fitting requires the model-axis
sharding measured here (2.56 GB/device at model=8) — while SAMPLING is
what bounds the step's logit/gradient work (exact scoring of 10^7
classes per step is the compute wall; rate 0.002 scores 20k).

    python tools/pfc_scale_proof.py                     # 10M ids, ~80 GB RAM
    python tools/pfc_scale_proof.py --num_classes 1000000 --dim 64  # smoke
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8"
                           # 8 virtual devices on a small host serialize
                           # onto few cores; at 20 GB of sharded state a
                           # device thread can lag the all-gather
                           # rendezvous past the 20s/40s defaults and XLA
                           # aborts the run (rendezvous.cc). Generous
                           # timeouts keep the memory proof alive.
                           " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
                           " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
                           ).strip()

import argparse
import json
import resource
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _reset_peak_rss() -> bool:
    """Reset the kernel's VmHWM high-water mark (Linux >= 4.0).

    ru_maxrss is a process-LIFETIME peak: init transients (the numpy
    fill + jnp copy + *0.01 of a 20 GB classifier coexisting) dominate
    it, so a lifetime number cannot prove the train STEP materializes
    no hidden O(C) buffer — a regression could hide under the init
    high-water mark. Resetting after init makes VmHWM a step-phase
    peak, which is the claim under test."""
    try:
        with open("/proc/self/clear_refs", "w") as f:
            f.write("5")
        return True
    except OSError:
        return False


def _peak_rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1]) / 2**20  # kB -> GB
    except OSError:
        pass
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tf_face_toolbox_tpu.parallel.mesh import create_mesh  # noqa: E402
from tf_face_toolbox_tpu.train.trainer import (  # noqa: E402
    TrainConfig,
    create_train_state,
    make_train_step,
)


class _TinyBackbone(nn.Module):
    """Minimal embedding net: the head is the experiment."""
    dim: int

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(self.dim)(x)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--num_classes", type=int, default=10_000_000)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--rate", type=float, default=0.002)
    p.add_argument("--model", type=int, default=8)
    p.add_argument("--steps", type=int, default=3)
    args = p.parse_args()

    cfg = TrainConfig(
        num_classes=args.num_classes, embedding_dim=args.dim,
        image_size=16, global_batch=args.batch,
        pfc_sample_rate=args.rate, augment=False,
        weight_decay=0.0, warmup_steps=0, base_lr=0.01,
        margin_m3=0.35, margin_scale=64.0, dtype=jnp.float32)
    mesh = create_mesh(data=1, model=args.model)
    w_gb = 4 * args.num_classes * args.dim / 2**30

    t0 = time.perf_counter()
    # Tool-local init shortcut: jax's threefry normal generates ~2-3
    # GB/min on this 1-core host — 20.5 GB of classifier would spend
    # half an hour on an init whose DISTRIBUTION is irrelevant to the
    # memory proof (the step program is what's under test). numpy's
    # generator fills the same leaf two orders of magnitude faster;
    # small leaves (the backbone) keep the real init path.
    orig_normal = jax.random.normal

    def fast_normal(key, shape, dtype=jnp.float32, **kw):
        if np.prod(shape) < 1e8:
            return orig_normal(key, shape, dtype, **kw)
        rng_np = np.random.default_rng(0)
        out = np.empty(shape, np.float32)
        step = max(1, int(1e8) // int(np.prod(shape[1:]) or 1))
        for i in range(0, shape[0], step):
            out[i:i + step] = rng_np.standard_normal(
                out[i:i + step].shape, dtype=np.float32)
        return jnp.asarray(out).astype(dtype)

    jax.random.normal = fast_normal
    try:
        state, net = create_train_state(cfg, jax.random.key(0), mesh,
                                        net=_TinyBackbone(args.dim))
    finally:
        jax.random.normal = orig_normal
    step_fn = make_train_step(net, cfg, mesh, state)
    print(f"init: {time.perf_counter() - t0:.1f}s  "
          f"(W = {w_gb:.1f} GB + momentum {w_gb:.1f} GB, "
          f"{2 * w_gb / args.model:.2f} GB/device at model={args.model})",
          flush=True)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(args.batch, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, args.num_classes,
                          size=(args.batch,)).astype(np.int32)

    lifetime_peak_before = _peak_rss_gb()
    step_scoped = _reset_peak_rss()
    losses, times = [], []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, jnp.asarray(images),
                                 jnp.asarray(labels))
        loss = float(jax.device_get(metrics["loss"]))
        times.append(time.perf_counter() - t0)
        losses.append(loss)
        print(f"step {i}: loss={loss:.3f}  {times[-1]:.1f}s", flush=True)
        assert np.isfinite(loss), "loss diverged"

    peak_gb = _peak_rss_gb()
    print(json.dumps({
        "num_classes": args.num_classes, "dim": args.dim,
        "rate": args.rate, "model_shards": args.model,
        "w_plus_momentum_gb": round(2 * w_gb, 2),
        # step-phase peak (VmHWM reset after init) when the kernel
        # supports clear_refs; else the lifetime peak, marked as such
        "peak_rss_gb": round(peak_gb, 2),
        "rss_scope": "steps" if step_scoped else "lifetime",
        "init_peak_rss_gb": round(lifetime_peak_before, 2),
        "rss_over_floor": round(peak_gb / max(2 * w_gb, 1e-9), 2),
        "loss_first": round(losses[0], 3),
        "loss_last": round(losses[-1], 3),
        "sec_per_step_last": round(times[-1], 2),
    }))


if __name__ == "__main__":
    main()
