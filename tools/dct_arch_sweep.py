"""Hardware sweep over dct_resnet architecture knobs (r3 tuning).

The JPEG-domain backbone (models/resnet.py stem="dct", PAPERS.md
Gueguen et al. 2018) trades the 56² stage for frequency channels; this
tool measures flip-averaged bf16 extraction throughput for candidate
(stage_sizes, stage_widths) settings with bench.py's RTT-free chained
timing, so the registry entry is picked from measurements, not guesses.

    python tools/dct_arch_sweep.py --batch 256 \
        --variant "4,6,3/96,256,512" --variant "3,6,3/128,256,512"
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_chain, measure  # noqa: E402  (shares cache cfg)
from tf_face_toolbox_tpu.models import init_variables  # noqa: E402
from tf_face_toolbox_tpu.models.resnet import ResNet  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--variant", action="append", required=True,
                   help="'s0,s1,s2/w0,w1,w2[/stem_features]'")
    args = p.parse_args()

    for spec in args.variant:
        parts = spec.split("/")
        sizes = tuple(int(x) for x in parts[0].split(","))
        widths = tuple(int(x) for x in parts[1].split(","))
        stemf = int(parts[2]) if len(parts) > 2 else 256
        net = ResNet(stage_sizes=sizes, stage_widths=widths,
                     stem="dct", dct_stem_features=stemf,
                     dtype=jnp.bfloat16)
        variables = init_variables(net, jax.random.key(0),
                                   (1, 112, 112, 3))
        chain = build_chain(net)
        stats = measure(chain, variables, args.batch)
        print(json.dumps({"variant": spec, "batch": args.batch,
                          **{k: round(v, 1) for k, v in stats.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
