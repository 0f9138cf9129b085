"""Mesh construction and batch-sharding utilities."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up (jax.distributed.initialize), idempotent.

    On single-host (or when coordinator env vars are absent) this is a
    no-op, so the same entry points run everywhere.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # already initialized or single-process without coordinator


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices (all by
    default).  Device order follows ``jax.devices()``, which places
    ICI-adjacent chips adjacently, so the all-reduce rides ICI first."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the galaxy batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host-local batch dict onto the mesh, sharded along axis 0.

    Single-process: a device_put with a NamedSharding.  Multi-process: each
    process passes its local slice and the global array is assembled with
    ``jax.make_array_from_process_local_data`` (global batch = sum of local
    batches).
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v)) for k, v in batch.items()
    }
