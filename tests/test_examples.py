"""Suite-gated example smoke runs (VERDICT r4 task 4).

SURVEY.md §4 identifies the reference's notebooks as its de-facto
integration tests; our `examples/*.py` mirror them but previously only
ran inside manual verify drives, so rot was invisible to CI. Each script
honors ``PYVISIM_EXAMPLE_FAST=1`` (CPU-sized problem, identical flow)
and is executed here in a subprocess on the virtual 8-device CPU mesh,
asserting a clean exit.

The subprocess must flip jax to the CPU platform BEFORE backend init
(this image's sitecustomize forces the TPU backend via jax.config and
ignores env vars — see CLAUDE.md), hence the ``-c`` runner shim.
"""
import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).resolve().parent.parent / "examples"
SCRIPTS = sorted(p.name for p in EXAMPLES_DIR.glob("*.py"))


def test_every_example_is_covered():
    """A new example script must be added here implicitly: the glob picks
    it up, so this just documents the expected set."""
    assert len(SCRIPTS) >= 7


@pytest.mark.parametrize("script", SCRIPTS)
def test_example_runs_clean(script):
    path = EXAMPLES_DIR / script
    env = dict(os.environ)
    env["PYVISIM_EXAMPLE_FAST"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    runner = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import runpy; runpy.run_path(%r, run_name='__main__')" % str(path)
    )
    proc = subprocess.run(
        [sys.executable, "-c", runner],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=str(EXAMPLES_DIR.parent),
    )
    assert proc.returncode == 0, (
        f"{script} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}"
    )
