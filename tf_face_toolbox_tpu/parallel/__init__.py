"""Distributed execution: mesh construction, collectives, sharded heads.

The reference's parallelism was a single-host multi-GPU tower loop with
gradient averaging on one device (ref: upstream train.py [TF1-IDIOM];
SURVEY.md §2c/§2d). Here that becomes a first-class module: a
``jax.sharding.Mesh`` over TPU chips, explicit axis names, ``psum``
gradient exchange over ICI, and a Partial-FC-style class-sharded
margin-softmax head for giant identity counts.
"""

from tf_face_toolbox_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    local_batch_size,
)
