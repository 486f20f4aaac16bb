"""Driver-contract tests: exercise __graft_entry__ the way the DRIVER does.

The round-1 regression: ``dryrun_multichip`` passed under conftest's
pre-forced 8-device CPU mesh but failed when the driver imported the module
in a clean process (no XLA_FLAGS, sitecustomize forcing the axon platform)
and called the function directly. These tests reproduce the external
invocation via subprocess with a scrubbed environment so any reintroduction
of that class of bug fails in-suite (VERDICT round 1, "Next round" #1/#8).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Environment as the driver sees it: no test-harness JAX hints."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYVISIM_DRYRUN",
                     "JAX_NUM_CPU_DEVICES", "PYVISIM_TEST_TPU")
    }
    # Keep the dryrun off the real chip even if a TPU relay is reachable:
    # the driver's own invocation provisions CPU devices before backend init,
    # which is exactly the path under test.
    return env

def _run(code, timeout=600):
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_driver_dryrun_multichip_clean_process():
    """python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" == rc 0."""
    res = _run("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert res.returncode == 0, (
        f"driver-shaped dryrun failed\nstdout:\n{res.stdout}\n"
        f"stderr:\n{res.stderr}"
    )
    assert "dryrun_multichip OK on 8 devices" in res.stdout


@pytest.mark.slow
def test_driver_dryrun_after_backend_init():
    """Re-exec fallback: backend already up with 1 device -> still rc 0."""
    res = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    assert res.returncode == 0, (
        f"re-exec dryrun failed\nstdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    )


@pytest.mark.slow
def test_driver_entry_compile_check_clean_process():
    """The driver's single-chip compile check, on CPU in a clean process."""
    res = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import __graft_entry__ as g; fn, args = g.entry(); "
        "out = jax.jit(fn).lower(*args); "
        "print('LOWER_OK', out is not None)"
    )
    assert res.returncode == 0, (
        f"entry compile check failed\nstdout:\n{res.stdout}\n"
        f"stderr:\n{res.stderr}"
    )
    assert "LOWER_OK True" in res.stdout
