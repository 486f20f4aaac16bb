"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; the standard JAX trick is to force
the host platform to expose 8 virtual devices so sharding/collective code
paths execute for real (SURVEY.md §4).

Note: this image's sitecustomize registers the 'axon' TPU backend and sets
``jax_platforms`` via config (env vars are ignored), so we must override the
config directly before any backend initializes. Set PYVISIM_TEST_TPU=1 to run
the suite on the real chip instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("PYVISIM_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    """Build the native C++ JPEG loader if this checkout hasn't yet
    (tools/build_native.py output is a build artifact, not tracked in
    git — a fresh clone would otherwise fail test_io's loader tests)."""
    import pathlib
    import subprocess

    repo = pathlib.Path(__file__).resolve().parent.parent
    so = repo / "pyvisim_tpu" / "io" / "libpyvisim_io.so"
    if not so.exists():
        subprocess.run(
            ["python", str(repo / "tools" / "build_native.py")],
            check=False, capture_output=True, timeout=300,
        )


@pytest.fixture
def rng():
    return np.random.default_rng(42)
