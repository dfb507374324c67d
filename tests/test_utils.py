"""utils: profiling timer and metric logger."""

import jax
import jax.numpy as jnp
import numpy as np

from tf_face_toolbox_tpu.utils.metrics import MetricLogger
from tf_face_toolbox_tpu.utils.profiling import (
    chained_seconds_per_call,
    throughput,
)


def test_chained_timer_positive_and_sane():
    def f(x):
        return x * 2.0 + 1.0

    x = jnp.ones((64, 64))
    per = chained_seconds_per_call(f, x, k1=2, k2=6, repeats=2)
    assert per > 0
    assert per < 1.0  # a trivial elementwise op is far below 1s/call


def test_throughput_scales_with_batch():
    def f(x):
        return jnp.tanh(x)

    fps = throughput(f, jnp.ones((32, 16)), batch=32, k1=2, k2=6,
                     repeats=2)
    assert fps > 0


def test_metric_logger_console_only(tmp_path):
    logger = MetricLogger(None, batch_size=8)
    logger.log(1, {"loss": 1.0})
    logger.log(2, {"loss": 0.5})   # second call gains steps_per_sec
    logger.flush()
    logger.close()


def test_metric_logger_writes_files(tmp_path):
    logger = MetricLogger(str(tmp_path), batch_size=4)
    logger.log(1, {"loss": 2.0})
    logger.flush()
    logger.close()
    # clu default writer emits TensorBoard event files
    assert any(p.name.startswith("events") or p.is_dir()
               for p in tmp_path.iterdir())
