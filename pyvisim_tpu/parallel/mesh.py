"""Device mesh construction.

The reference has no distributed runtime at all (SURVEY.md §2: serial
per-image Python loops, no communication backend). The TPU-native scaling
model is ``jax.sharding``: build a named mesh over the available devices
and annotate shardings; XLA inserts the collectives (psum / all_gather /
reduce_scatter) over ICI.

Axes:
  * ``data``    — image batch / descriptor rows (DP; the primary axis)
  * ``cluster`` — the K centroid/component axis of VLAD/FV vocabularies
                  (the EP-analog: each device owns K/devices clusters)
  * ``model``   — channel axis of dense/conv kernels (TP) in the Siamese head
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "P", "NamedSharding"]


def make_mesh(
    n_devices: int | None = None,
    axis_names: tuple[str, ...] = ("data",),
    shape: tuple[int, ...] | None = None,
    devices=None,
) -> Mesh:
    """Build a named mesh.

    :param n_devices: number of devices to use (default: all available).
    :param axis_names: mesh axis names, e.g. ("data",) or ("data", "model").
    :param shape: explicit per-axis sizes; default puts everything on the
        first axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
