"""Device-mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: dict[str, int] | None = None, devices: Sequence | None = None
) -> Mesh:
    """Build a named device mesh.

    ``axis_sizes`` maps axis names to sizes, e.g. ``{"data": 4, "tile": 2}``;
    ``None`` puts all devices on a single ``"data"`` axis.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, only {len(devices)} available")
    grid = np.array(devices[:n]).reshape(sizes)
    return Mesh(grid, names)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place an array with its leading (batch) dim sharded over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    """Fully replicate an array (or pytree) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), x)
