"""Multi-host (multi-process) runtime scaffolding.

The reference has no distributed runtime at all (SURVEY.md §2/§5); the
TPU-native scaling model beyond one host is:

1. every host process calls :func:`init_distributed` once before first
   backend use (wraps ``jax.distributed.initialize`` — the JAX/XLA
   coordination service that makes all hosts' chips visible as one global
   device set);
2. build a DCN-aware mesh with :func:`make_hybrid_mesh`: the leading
   (data-parallel) axis spans hosts over DCN, the remaining axes
   (``model`` / ``cluster``) stay within a host so their collectives ride
   ICI — the placement recipe of the public scaling playbooks.

Actual multi-host execution cannot run in this single-host image; the mesh
*planning* logic is pure and unit-tested (tests/test_parallel.py), and all
helpers degrade to single-process no-ops so the same script runs anywhere.
"""
from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh

from .._config import get_logger

logger = get_logger(__name__)

__all__ = ["init_distributed", "plan_hybrid_mesh", "make_hybrid_mesh"]


def _env_int(name: str) -> int | None:
    val = os.environ.get(name)
    return int(val) if val else None


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> bool:
    """Initialize the multi-host JAX runtime; no-op for single-process runs.

    Reads ``PYVISIM_COORDINATOR`` / ``PYVISIM_NUM_PROCESSES`` /
    ``PYVISIM_PROCESS_ID`` when arguments are omitted. On TPU pods and
    under SLURM/OpenMPI, ``jax.distributed.initialize`` autodetects all
    three, so passing just ``coordinator_address`` (or nothing at all on a
    pod) is enough. Returns True when the distributed runtime was
    initialized, False when running single-process.

    Call before the first ``jax.devices()`` touch; afterwards
    ``jax.devices()`` is the *global* device list and ``jax.process_count()``
    reflects the job size.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "PYVISIM_COORDINATOR"
    )
    num_processes = (
        num_processes
        if num_processes is not None
        else _env_int("PYVISIM_NUM_PROCESSES")
    )
    process_id = (
        process_id if process_id is not None else _env_int("PYVISIM_PROCESS_ID")
    )
    # An explicit num_processes=1 always means single-process — even when a
    # coordinator address is (stray) in the environment; callers use this to
    # make dryruns environment-independent.
    if num_processes == 1 or (coordinator_address is None and num_processes is None):
        logger.info("single-process run; skipping jax.distributed.initialize")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    logger.info(
        "distributed runtime up: process %d/%d, %d local of %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def plan_hybrid_mesh(
    n_processes: int,
    local_device_count: int,
    axis_names: tuple[str, ...] = ("data", "model"),
    within_host_shape: tuple[int, ...] | None = None,
) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Pure mesh-shape planning: ``(ici_shape, dcn_shape)`` per axis.

    Axis 0 (conventionally ``data``) is the only axis that crosses hosts —
    its DCN extent is ``n_processes`` and it additionally absorbs any local
    chips left over after the within-host axes. Axes 1.. (``model`` /
    ``cluster``) must fit inside one host so their collectives stay on ICI.

    :param within_host_shape: sizes of axes 1..; defaults to all remaining
        local chips on axis 1 (or nothing when there is only one axis).
    :raises ValueError: when the within-host axes don't divide the local
        device count.
    """
    n_within_axes = len(axis_names) - 1
    if within_host_shape is None:
        within_host_shape = (
            () if n_within_axes == 0 else (local_device_count,) + (1,) * (n_within_axes - 1)
        )
    if len(within_host_shape) != n_within_axes:
        raise ValueError(
            f"within_host_shape {within_host_shape} must size axes "
            f"{axis_names[1:]}"
        )
    within_total = int(np.prod(within_host_shape)) if within_host_shape else 1
    if local_device_count % within_total != 0:
        raise ValueError(
            f"within-host axes {dict(zip(axis_names[1:], within_host_shape))} "
            f"need {within_total} chips but each host has {local_device_count}"
        )
    local_data = local_device_count // within_total
    ici_shape = (local_data, *within_host_shape)
    dcn_shape = (n_processes,) + (1,) * n_within_axes
    return ici_shape, dcn_shape


def make_hybrid_mesh(
    axis_names: tuple[str, ...] = ("data", "model"),
    within_host_shape: tuple[int, ...] | None = None,
    devices=None,
) -> Mesh:
    """DCN-aware named mesh: ``data`` over hosts (and leftover local chips),
    the remaining axes within each host.

    Single-process runs collapse to an ordinary local mesh of the same
    logical shape, so code written against this helper runs unchanged from
    a laptop CPU mesh to a multi-host pod.
    """
    n_proc = jax.process_count()
    local = (
        jax.local_device_count()
        if devices is None
        else len(devices) // max(n_proc, 1)
    )
    ici_shape, dcn_shape = plan_hybrid_mesh(
        n_proc, local, axis_names, within_host_shape
    )
    if n_proc > 1:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devices
        )
        return Mesh(dev_array, axis_names)
    devices = list(devices if devices is not None else jax.devices())
    shape = tuple(i * d for i, d in zip(ici_shape, dcn_shape))
    return Mesh(np.array(devices).reshape(shape), axis_names)
