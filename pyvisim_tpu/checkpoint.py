"""Checkpoint / resume for training state and codebooks.

The reference persists only fitted sklearn estimators as joblib pickles
(SURVEY.md §5; reference pyvisim/_utils.py:830-850) and has no
training-state resume (nothing long-running to resume). Here the Siamese
trainer's full state (params + optimizer + step) checkpoints through
Orbax — sharded-array aware, safe for multi-chip training — and codebooks
use the .npz format from ops/codebooks.py.
"""
from __future__ import annotations

import pathlib
from typing import Any

from ._config import get_logger

logger = get_logger("checkpoint")

__all__ = ["save_train_state", "restore_train_state", "latest_step"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(directory: str, state: Any, step: int | None = None) -> str:
    """Save a TrainState (or any pytree) under ``directory/step_<n>``."""
    import jax

    if step is None:
        step = int(jax.device_get(state.step)) if hasattr(state, "step") else 0
    path = pathlib.Path(directory) / f"step_{step:08d}"
    _checkpointer().save(path.absolute(), state, force=True)
    logger.info("checkpoint saved: %s", path)
    return str(path)


def latest_step(directory: str) -> int | None:
    d = pathlib.Path(directory)
    if not d.exists():
        return None
    steps = sorted(
        int(p.name.split("_")[1]) for p in d.glob("step_*") if p.is_dir()
    )
    return steps[-1] if steps else None


def restore_train_state(directory: str, target: Any, step: int | None = None) -> Any:
    """Restore the latest (or a specific) checkpoint into ``target``'s
    structure (pass a template TrainState from ``create_train_state``).

    Multi-chip resume: restore host-side with this function, then re-apply
    the mesh placement with ``parallel.shard_train_state(state, mesh)``
    (tested in test_parallel.py::test_sharded_checkpoint_resume)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {directory}")
    path = pathlib.Path(directory) / f"step_{step:08d}"
    return _checkpointer().restore(path.absolute(), item=target)
