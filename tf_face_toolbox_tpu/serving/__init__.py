"""TPU serving engine: BN-folded inference with fused Pallas blocks.

The training-side model (models/resnet.py) is a flax module whose eval
forward XLA compiles well — but XLA still materializes every conv output
of every bottleneck block in HBM, and the extraction path is
bandwidth-bound (docs/design.md roofline: the bf16 face stem moves
~15 GB/batch for 120 MFLOP/face of math). This package is the serving
counterpart: it takes the SAME checkpoint tree and executes it with

- batch-norm statistics folded into conv scales/biases (fold.py), and
- whole residual blocks fused into single Pallas kernels that read the
  block input from HBM once and write the block output once; every
  intermediate (1x1 -> 3x3 -> 1x1, biases, ReLUs, the residual add)
  stays in VMEM (fused_block.py, engine.py).

Equivalent of the reference's frozen-graph deployment path
(ref: upstream features.py restore-and-run [UPSTREAM-K]); the fusion
itself has no reference equivalent — it is what the TPU memory
hierarchy makes the right design.
"""

from tf_face_toolbox_tpu.serving.engine import (  # noqa: F401
    ServingPlan,
    build_plan,
    make_serving_apply,
)
