"""Device-mesh construction helpers.

The reference has no distributed runtime (SURVEY §2.2/§2.4); this layer is
designed from scratch for TPU: a named mesh with ``data`` (tile-batch data
parallelism) and ``graph`` (spatial/edge partition) axes, used via
jax.jit + NamedSharding so XLA inserts ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    graph_axis: int = 1,
    axis_names: Tuple[str, str] = ("data", "graph"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """data x graph mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % graph_axis != 0:
        raise ValueError(f"{n} devices not divisible by graph axis {graph_axis}")
    arr = np.asarray(devices).reshape(n // graph_axis, graph_axis)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a leading batch dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(tree, mesh: Mesh):
    """Place a [B, ...] pytree with B sharded over the data axis."""
    s = batch_sharding(mesh)

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
