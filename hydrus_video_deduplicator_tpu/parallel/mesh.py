"""Mesh helpers for multi-chip execution.

The framework's parallelism is data-parallel over videos/frames (hashing)
and row-sharded over the pair matrix (search): both shard a leading batch
axis, so a 1-D mesh over all chips rides ICI with no cross-axis traffic.
Collectives appear only in the search engine's column broadcast
(all-gather) which XLA inserts from the shardings.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_count() -> int:
    return len(jax.devices())


def build_mesh(n_devices: int | None = None, axis_name: str = "d") -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def row_sharding(mesh: Mesh, axis_name: str = "d") -> NamedSharding:
    """Shard the leading axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
