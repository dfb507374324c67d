"""Shared test helpers."""

import functools

import jax


@functools.lru_cache(maxsize=None)
def _jitted_apply_cache(net):
    return jax.jit(functools.partial(net.apply, train=False))


def jit_apply(net, variables, x, **kwargs):
    """Jitted eval-mode forward — eager flax dispatch on this 1-CPU box
    is 10-100x slower than compiled execution."""
    if kwargs:
        return jax.jit(
            functools.partial(net.apply, train=False, **kwargs))(variables, x)
    return _jitted_apply_cache(net)(variables, x)
