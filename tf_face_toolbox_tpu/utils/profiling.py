"""Profiling: device-true throughput timing + jax.profiler traces.

SURVEY.md §5: the rebuild's tracing/profiling subsystem. Two tools:

- ``chained_seconds_per_call``: the ONLY reliable way to time device
  work on this image — the TPU tunnel's ``block_until_ready`` returns
  before real completion, so naive loops report >100x peak FLOPs.
  We chain K calls on-device inside one jitted fori_loop (each
  iteration carries a zero-valued data dependency on the previous
  result), force one scalar D2H, and difference two chain lengths to
  cancel the constant dispatch/RTT overhead. Validated at 196 TFLOP/s
  on a bf16 matmul chain == the v5e peak.
- ``trace``: context manager around jax.profiler for TensorBoard-
  viewable device traces.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp


def chained_seconds_per_call(fn: Callable, *args, k1: int = 3,
                             k2: int = 13, repeats: int = 3) -> float:
    """Seconds per ``fn(*args)`` call, RTT-free.

    ``fn`` must map its first positional array argument to a pytree;
    the chain feeds a zero-valued dependency back into that argument.
    """
    first = args[0]

    @functools.partial(jax.jit, static_argnums=len(args))
    def chain(*chain_args):
        *rest, iters = chain_args
        x0, tail = rest[0], rest[1:]

        def body(_, carry):
            x, acc = carry
            out = fn(x, *tail)
            s = jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda t: t.sum().astype(jnp.float32), out))
            return x + (s * 0).astype(x.dtype), acc + s

        return jax.lax.fori_loop(0, iters, body,
                                 (x0, jnp.float32(0.0)))[1]

    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        v = float(chain(*args, iters))
        if v != v:  # NaN guard
            raise RuntimeError("non-finite chain result")
        return time.perf_counter() - t0

    timed(k1), timed(k2)  # compile both chain lengths
    t1 = min(timed(k1) for _ in range(repeats))
    t2 = min(timed(k2) for _ in range(repeats))
    # Sub-dispatch-noise workloads can difference negative; floor at the
    # amortized long-chain time, which is then dispatch-bound but sane.
    return max((t2 - t1) / (k2 - k1), t2 / (k2 * 10), 1e-9)


def throughput(fn: Callable, *args, batch: int, **kw) -> float:
    """items/sec for a batched device fn, using chained timing."""
    return batch / chained_seconds_per_call(fn, *args, **kw)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
