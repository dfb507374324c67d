"""Per-stage microbench: fused Pallas block stack vs folded-XLA chain.

For each ResNet-50 stage (face stem geometry by default) this times the
stage's fusable segment both ways on the real device and prints a table
— the tuning loop for serving/fused_block.py.

Usage: python tools/stage_bench.py [--stem face] [--batch 256] [--g G]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stem", default="face")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--g", type=int, default=0,
                   help="force images_per_step (0 = auto)")
    p.add_argument("--stage", type=int, default=-1, help="-1 = all")
    p.add_argument("--conv", default="",
                   help="override fused_block.CONV3X3_MODE "
                        "(roll|slice|mm; mm = wrong numerics, MXU "
                        "ceiling probe)")
    args = p.parse_args()

    from tf_face_toolbox_tpu.models import create_network, init_variables
    from tf_face_toolbox_tpu.serving import fused_block
    from tf_face_toolbox_tpu.serving.engine import (
        _plan_stage_fusion, build_plan)
    from tf_face_toolbox_tpu.utils.profiling import chained_seconds_per_call

    if args.conv:
        fused_block.CONV3X3_MODE = args.conv

    net = create_network("resnet_v1_50", dtype=jnp.bfloat16,
                         stem=args.stem)
    variables = init_variables(net, jax.random.key(0), (1, 112, 112, 3))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    plan = build_plan(net, variables)

    # stage input sizes for 112x112 (face: 56/56/28/14; imagenet: 28/28/14/7)
    if args.stem == "face":
        sizes = [56, 28, 14, 7]
    else:
        sizes = [28, 14, 7, 4]

    if args.stage == 99:  # time the NON-tail parts: stem, entries, head
        from flax import linen as nn
        x = jax.random.normal(
            jax.random.key(1),
            (args.batch, 112, 112, 3)).astype(jnp.bfloat16)

        def run_stem(xx):
            xx = plan.stem(xx)
            if plan.stem_kind == "imagenet":
                xx = nn.max_pool(xx, (3, 3), strides=(2, 2),
                                 padding="SAME")
            return xx
        t = chained_seconds_per_call(run_stem, x)
        print(f"stem: {t*1e3:7.3f} ms", flush=True)
        x = run_stem(x)
        for si, blocks in enumerate(plan.stages):
            t = chained_seconds_per_call(blocks[0].apply_xla, x)
            x = blocks[0].apply_xla(x)
            print(f"entry block s{si}: {blocks[0].conv2.strides} "
                  f"{x.shape} {t*1e3:7.3f} ms", flush=True)
            for blk in blocks[1:]:
                x = blk.apply_xla(x)

        def run_head(xx):
            wv, bv = plan.head_dense
            e = jnp.dot(jnp.mean(xx, axis=(1, 2)).astype(jnp.bfloat16),
                        wv, preferred_element_type=jnp.float32)
            return e + bv
        t = chained_seconds_per_call(run_head, x)
        print(f"head: {t*1e3:7.3f} ms", flush=True)
        return

    for si, blocks in enumerate(plan.stages):
        if args.stage >= 0 and si != args.stage:
            continue
        n_xla, entry, tail = _plan_stage_fusion(blocks)
        if entry is None and tail is None:
            print(f"stage {si}: nothing fusable")
            continue
        s = sizes[si]
        cin = (blocks[0].conv1.kernel.shape[2] if entry is not None
               else blocks[-1].conv3.kernel.shape[-1])
        x = jax.random.normal(
            jax.random.key(1), (args.batch, s, s, cin)).astype(jnp.bfloat16)
        k = tail["w1s"].shape[0] if tail is not None else 0
        b = blocks[0].conv1.kernel.shape[-1]
        c = blocks[0].conv3.kernel.shape[-1]
        g = args.g or fused_block.pick_images_per_step(
            args.batch, s * s, cin, c, b, k, 2)

        def run_xla(xx):
            for blk in blocks[n_xla:]:
                xx = blk.apply_xla(xx)
            return xx

        t_xla = chained_seconds_per_call(run_xla, x)

        if g:
            def run_fused(xx):
                return fused_block.fused_bottleneck_stack(
                    xx, entry, tail, h=s, w=s, images_per_step=g)
            t_fused = chained_seconds_per_call(run_fused, x)
            note = f"g={g}"
        else:
            t_fused, note = float("inf"), "no fit"
        speed = t_xla / t_fused if t_fused else 0
        print(f"stage {si}: {s:3d}^2 cin={cin:4d} c={c:4d} b={b:3d} "
              f"k={k} entry={entry is not None} [{note}]  "
              f"xla {t_xla*1e3:7.3f} ms  fused {t_fused*1e3:7.3f} ms  "
              f"ratio {speed:.2f}x", flush=True)


if __name__ == "__main__":
    main()
