"""Train state pytree: params, BN stats, classifier shard, optimizer state.

A flax.struct dataclass so the whole state jits, shards, donates, and
checkpoints as one pytree — the rebuild of the reference's implicit
(graph variables + Saver) state [TF1-IDIOM].
"""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array            # () int32
    params: Any                # backbone params
    batch_stats: Any           # BN running stats
    classifier: jax.Array      # (C or C_local, D) margin-softmax weights
    opt_state: Any             # optax state for (params, classifier)
    # PRNG key stored as RAW uint32 key data (jax.random.key_data) so the
    # state serializes through orbax/tensorstore; wrap with
    # jax.random.wrap_key_data before use.
    rng: jax.Array
    # Exponential moving average of backbone params (the reference's
    # tf.train.ExponentialMovingAverage [TF1-IDIOM]); None when disabled.
    ema_params: Any = None
    # Loss-head auxiliary state, present only when the config needs it:
    #   "adaface": {"norm_mean", "norm_std"} — EMA feature-norm batch
    #      stats (ops/losses.adaface_stats_init);
    #   "centers": (C_local, D) f32 center-loss table, sharded over the
    #      model axis exactly like `classifier`, trained by the delta
    #      rule (not the optimizer).
    head_state: Any = None
