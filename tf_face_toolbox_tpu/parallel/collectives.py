"""Collective primitives: the named gradient-sync component.

SURVEY.md §2d requires the cross-device communication layer to be "a
named component ... not an implicit detail". These wrappers are what the
trainer calls; XLA lowers them to ICI all-reduces within a slice (DCN
across slices on multi-slice deployments — same call sites).
"""

from __future__ import annotations

from typing import Any

import jax

from tf_face_toolbox_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def sync_gradients(grads: Any, *, model_partial: bool = True) -> Any:
    """The DP gradient exchange (reference: tower averaging [TF1-IDIOM]).

    ``model_partial=True``: model-axis devices hold complementary
    partials of the row loss (the Partial-FC backbone case) — sum over
    `model`, then average rows over `data`. With a size-1 model axis
    both collectives are identity-cost.
    """
    if model_partial:
        grads = jax.lax.psum(grads, MODEL_AXIS)
    return jax.lax.pmean(grads, DATA_AXIS)


def sync_classifier_gradients(grads: Any) -> Any:
    """Class-shard gradients live on one model column each: average
    over `data` only."""
    return jax.lax.pmean(grads, DATA_AXIS)


def sync_batch_stats(stats: Any) -> Any:
    """Keep replicated BN running statistics identical across devices
    (per-replica batch stats remain local — SURVEY.md §7)."""
    return jax.lax.pmean(stats, (DATA_AXIS, MODEL_AXIS))


def replicate_mean(value: Any) -> Any:
    """Scalar metric reduction across the data axis."""
    return jax.lax.pmean(value, DATA_AXIS)
