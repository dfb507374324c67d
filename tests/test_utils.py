"""utils: profiling timer and metric logger."""

import pytest
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


@pytest.mark.mid
def test_zoo_report_tool_smoke():
    """tools/zoo_report.py emits params + compiled-cost rows."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, TFFT_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "zoo_report.py"),
         "--networks", "resnet_tiny", "--batch", "2",
         "--image_size", "16"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert row["network"] == "resnet_tiny" and row["params_m"] > 0
    assert "mbytes_per_face" in row
