"""Test configuration: fake 8-device CPU backend + persistent compile cache.

``--xla_force_host_platform_device_count=8`` gives 8 CPU "devices" so the
real shard_map/psum data-parallel path runs on one host (SURVEY.md §4
"Distributed without a cluster").

IMPORTANT (this image): the axon sitecustomize hook registers the TPU
tunnel PJRT plugin in every interpreter and *clears JAX_PLATFORMS*, so
the env-var route to CPU silently loses the race and tests end up on the
remote TPU tunnel (slow remote compiles, wedge-prone). The reliable
switch is ``jax.config.update("jax_platforms", "cpu")`` after importing
jax — do not "simplify" this back to the env var.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# This box has ONE physical CPU: compiles dominate test time. The
# persistent cache makes re-runs ~free; eager dispatch is avoided by
# jitting every model call in the tests themselves.
_CACHE = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
