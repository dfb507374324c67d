"""TF_Face_Toolbox-TPU: a TPU-native JAX face-recognition framework.

A ground-up rebuild of the capabilities of medivhna/TF_Face_Toolbox
(a TF-1.x multi-GPU face-recognition toolbox) designed TPU-first:

- backbone zoo (ResNet / SE-ResNet / ResNeXt / DenseNet) in NHWC with
  conv+BN+ReLU expressed for XLA fusion (ref: upstream ``nets/`` [UPSTREAM-K])
- flip-averaged, L2-normalized 512-d embedding extraction (ref: upstream
  ``features.py`` [UPSTREAM-K]; BASELINE.json north_star)
- fused on-device preprocessing (crop / resize / flip / per-image
  standardization) via XLA + a Pallas TPU kernel (ref: upstream tf.image
  chain [TF1-IDIOM])
- margin-softmax (CosFace/ArcFace-style) large-batch training (ref:
  upstream ``train.py`` [UPSTREAM-K])
- data parallelism over a ``jax.sharding.Mesh`` with explicit ``psum``
  gradient exchange, replacing the reference's multi-GPU tower loop
  [TF1-IDIOM], plus Partial-FC-style class-sharded classifier heads
- LFW-style 10-fold pair verification as batched on-device cosine matmuls

See SURVEY.md for the full blueprint and provenance notes (the reference
mount was empty; upstream paths are cited as [UPSTREAM-K] reconstructions).
"""

__version__ = "0.1.0"

from tf_face_toolbox_tpu.models import (  # noqa: F401
    create_network,
    init_variables,
    list_networks,
)


def __getattr__(name):
    """Lazy top-level conveniences (keeps bare import light)."""
    if name in ("make_extract_fn", "flip_averaged_embeddings",
                "extract_dataset"):
        import tf_face_toolbox_tpu.extract as m
        return getattr(m, name)
    if name in ("TrainConfig", "create_train_state", "make_train_step"):
        import tf_face_toolbox_tpu.train.trainer as m
        return getattr(m, name)
    if name in ("verify_pairs", "cosine_similarity", "similarity_matrix",
                "identification_rank_k"):
        import tf_face_toolbox_tpu.ops.verification as m
        return getattr(m, name)
    if name == "MarginConfig":
        from tf_face_toolbox_tpu.ops.losses import MarginConfig
        return MarginConfig
    if name == "create_mesh":
        from tf_face_toolbox_tpu.parallel.mesh import create_mesh
        return create_mesh
    raise AttributeError(name)
