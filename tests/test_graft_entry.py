"""Driver-contract tests for __graft_entry__.py.

The round-1 multichip gate failed because the driver invoked
``dryrun_multichip(8)`` bare (no XLA_FLAGS, 1-chip default platform)
and the function did not provision its own virtual mesh
(MULTICHIP_r01.json: rc=1). These tests pin the fixed contract:
the call must succeed from a pristine interpreter.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def _run_bare(code: str, *, env_overrides=None, timeout=600):
    """Run `code` in a fresh interpreter WITHOUT the conftest CPU-mesh
    provisioning — the driver-shaped invocation."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # Keep child off the wedge-prone TPU tunnel: the provisioning under
    # test must steer to CPU *itself*; JAX_PLATFORMS is unreliable on
    # this image (axon hook clears it) so passing it does NOT pre-solve
    # the problem for the code under test.
    env.update(env_overrides or {})
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_dryrun_multichip_bare_invocation():
    """Exactly what the driver runs: no flags, no conftest, 8 devices."""
    r = _run_bare(
        "import sys; sys.path.insert(0, %r); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
        % REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(8): mesh=" in r.stdout, r.stdout


@pytest.mark.slow
def test_dryrun_multichip_stale_small_device_count():
    """A stale smaller count flag in the environment must be replaced,
    not trusted (the subprocess-fallback inherits parent env)."""
    r = _run_bare(
        "import sys; sys.path.insert(0, %r); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
        % REPO,
        env_overrides={
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(8): mesh=" in r.stdout, r.stdout


def test_provision_devices_native_when_enough():
    """Under the conftest 8-CPU mesh, provisioning is a no-op."""
    import jax

    jax.device_count()  # force backend init: the branch under test
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__
        assert __graft_entry__._provision_devices(8) == "native"
        assert __graft_entry__._provision_devices(1) == "native"
    finally:
        sys.path.remove(REPO)


def test_provision_devices_subprocess_when_short():
    import jax

    jax.device_count()
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__
        assert __graft_entry__._provision_devices(64) == "subprocess"
    finally:
        sys.path.remove(REPO)
