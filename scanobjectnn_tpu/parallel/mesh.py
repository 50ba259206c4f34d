"""Device mesh + sharding helpers: the framework's scale-out layer.

The reference has NO multi-device execution (SURVEY.md §2.6 — single GPU,
feed_dict per batch).  Here data parallelism is first-class: a 1-D
``Mesh(('data',))`` over all chips, the global batch sharded on its leading
axis, parameters/optimizer state replicated, and XLA/GSPMD inserting the
gradient psums and cross-chip BatchNorm reductions over ICI automatically
when the train step is jitted with these shardings.

The mesh is deliberately N-D-ready (``make_mesh(axes=...)``) so tensor or
pipeline axes can be added later, but reference parity needs only DP —
every model here is ≤ ~12M params (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    axes: Sequence[str] = ("data",),
    shape: Sequence[int] | None = None,
) -> Mesh:
    """A mesh over ``devices`` (default: all).  With one axis, all devices go
    to it; otherwise ``shape`` gives the per-axis extents."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        if len(axes) != 1:
            raise ValueError("shape required for multi-axis meshes")
        shape = (len(devices),)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a host batch so its leading axis is split across the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
