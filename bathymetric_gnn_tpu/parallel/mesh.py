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


# ---------------------------------------------------------------------------
# multi-host (multi-process) scaffolding — SURVEY §2.4/§7.1 step 8.
#
# On a pod slice each host runs one process owning its local chips;
# jax.distributed.initialize() wires the processes together, after which
# jax.devices() is GLOBAL and a Mesh over it spans hosts. Within a slice
# the collectives ride ICI; meshes should be laid out so the fast-changing
# axis (graph/halo ppermutes) maps to intra-host chips and the data axis
# to the DCN-adjacent dimension. The reference has no distributed runtime
# at all (SURVEY §2.2); this is new TPU-native capability.


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> dict:
    """Initialize multi-host JAX (idempotent; no-op single-process).

    With no arguments, relies on the TPU pod's automatic environment
    discovery (JAX reads the TPU metadata / COORDINATOR_ADDRESS env);
    explicit arguments support GPU/CPU process groups and tests. Returns
    a summary {processes, process_id, local_devices, global_devices}.
    """
    if (coordinator_address or num_processes
            or "COORDINATOR_ADDRESS" in __import__("os").environ):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                local_device_ids=local_device_ids,
            )
        except RuntimeError as e:  # already initialized
            if "already" not in str(e).lower():
                raise
    return {
        "processes": jax.process_count(),
        "process_id": jax.process_index(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def make_host_mesh(
    graph_axis: int = 1,
    axis_names: Tuple[str, str] = ("data", "graph"),
) -> Mesh:
    """Host-count-aware global mesh: the ``graph`` (halo/ppermute) axis is
    kept within hosts whenever graph_axis divides the per-host device
    count, so per-layer halo exchanges ride ICI and only the data-parallel
    psums cross DCN."""
    per_host = len(jax.local_devices())
    n_proc = jax.process_count()
    n = per_host * n_proc
    if n % graph_axis != 0:
        raise ValueError(f"{n} devices not divisible by graph={graph_axis}")
    if graph_axis > per_host and graph_axis % per_host != 0:
        raise ValueError(
            f"graph axis {graph_axis} spans hosts unevenly "
            f"({per_host} devices/host)")
    # jax.devices() orders devices process-major, so a [data, graph]
    # reshape with graph minor keeps graph groups host-local when
    # graph_axis <= per_host
    arr = np.asarray(jax.devices()).reshape(n // graph_axis, graph_axis)
    return Mesh(arr, axis_names)


def host_local_batch_to_global(tree, mesh: Mesh, spec_fn=None):
    """Assemble a global [B_global, ...] batch from each process's local
    [B_local, ...] arrays (per-host input pipelines — each host loads its
    own tiles; nothing is gathered through host 0).

    ``spec_fn(x) -> PartitionSpec`` overrides the default data-only
    sharding — e.g. the dp x sp halo batch uses P("data", "graph", None)
    on [B, rows, W] tiles: only the leading (data) dim may cross
    processes; within-process axes like ``graph`` are carved out of each
    host's full local arrays by make_array_from_process_local_data.

    Single-process this reduces to a device_put with the same spec."""
    if spec_fn is None:
        def spec_fn(x):
            return P("data", *([None] * (x.ndim - 1)))
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, spec_fn(x))),
            tree)

    def put(x):
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec_fn(x)), np.asarray(x), global_shape)

    return jax.tree.map(put, tree)
