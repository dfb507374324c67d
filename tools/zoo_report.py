"""Zoo report: params / forward GFLOPs / HBM bytes per backbone.

Measured off the COMPILED forward (XLA cost analysis of the jitted
eval apply at the given batch), not hand math — the same numbers the
roofline notes in docs/design.md are built from. Run on CPU
(TFFT_PLATFORM=cpu) for a quick table or on the TPU for
device-accurate byte counts.

    TFFT_PLATFORM=cpu python tools/zoo_report.py \
        --networks resnet_v1_50,dct_vit_small --batch 8

One JSON line per network: params_m, gflops_per_face (single forward
— flip-averaged extraction doubles it), bytes_per_face.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tf_face_toolbox_tpu.cli import setup_platform  # noqa: E402

setup_platform()

from tf_face_toolbox_tpu.models import (  # noqa: E402
    create_network,
    init_variables,
)

DEFAULT = ("resnet_v1_50,se_resnet_50,resnext_50,densenet_121,"
           "dct_resnet_50,dct_vit_small,dct_vit_tiny,iresnet_50,"
           "mobilefacenet")


def report(name: str, *, batch: int, size: int, dtype) -> dict:
    net = create_network(name, dtype=dtype)
    variables = init_variables(net, jax.random.key(0),
                               (1, size, size, 3))
    params_m = sum(int(p.size) for p in
                   jax.tree_util.tree_leaves(variables["params"])) / 1e6
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    fn = jax.jit(lambda v, im: net.apply(v, im, train=False))
    cost = fn.lower(variables, x).compile().cost_analysis()
    row = {"network": name, "params_m": round(params_m, 2),
           "batch": batch, "image_size": size}
    if getattr(net, "stem", None):
        row["stem"] = net.stem   # registry resnets default to "face"
    flops = cost.get("flops") if cost else None
    if flops:
        row["gflops_per_face"] = round(float(flops) / batch / 1e9, 3)
    byts = cost.get("bytes accessed") if cost else None
    if byts:
        row["mbytes_per_face"] = round(float(byts) / batch / 1e6, 2)
    return row


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--networks", default=DEFAULT,
                   help="comma-separated registry names")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image_size", type=int, default=112)
    p.add_argument("--bf16", action="store_true",
                   help="compute dtype bfloat16 (the serving config)")
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    for name in args.networks.split(","):
        name = name.strip()
        try:
            row = report(name, batch=args.batch, size=args.image_size,
                         dtype=dtype)
        except Exception as e:  # a missing net shouldn't kill the sweep
            row = {"network": name, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
