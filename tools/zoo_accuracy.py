"""Accuracy points for the previously-unmeasured zoo tier (VERDICT r3 #2).

Reuses tools/margin_study.py's protocol — structured synthetic
identities (noise 3.5x template scale), 400 steps, batch 256, ArcFace
head — but parameterized over the backbone, so every registry entry
that isn't a _tiny/_test fixture gets a held-out verification accuracy
point measured on the same hardware and task the resnet family's
margin-ordering numbers came from.

    python tools/zoo_accuracy.py [net ...|all]     # ~5 min per net

Measured on v5e-1 (recorded in docs/design.md's zoo table):
the resnet_v1_50 arcface row on this same task is 0.995 — that is the
bar a zoo entry must be within noise of to keep its "accuracy-class"
label.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import margin_study  # noqa: E402  (shares templates + run_variant)

# Per-net TrainConfig overrides. ViTs: SGD at the CNN lr diverges on
# transformers at this tiny step count; 0.02 + longer warmup trains.
NETS = {
    "iresnet_50": dict(),
    "iresnet_100": dict(),
    "mobilefacenet": dict(),
    "mobilefacenet_x2": dict(),
    "dct_vit_small": dict(base_lr=0.02, warmup_steps=100),
    "dct_vit_tiny": dict(base_lr=0.02, warmup_steps=100),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["mobilefacenet", "dct_vit_tiny"]
    if names == ["all"]:
        names = list(NETS)
    for n in names:
        margin_study.run_variant(
            f"{n:18s} arcface(m2=0.3)", 0.3, 0.0, network=n,
            **NETS[n])
