"""Device-mesh helpers.

The reference's only parallelism is communication-free ``jax.pmap``
replication (SURVEY.md §2g: zero collectives in the whole repo). Here the
mesh is the single source of truth: data-parallel sweeps, the ring force
pass, and sharded Monte Carlo all run as ``shard_map`` programs over a
``jax.sharding.Mesh``, letting XLA compile collectives onto ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "d",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_along(mesh: Mesh, axis_name: str = "d", dim: int = 0) -> NamedSharding:
    """NamedSharding that splits array dimension ``dim`` over the mesh axis."""
    spec = [None] * (dim + 1)
    spec[dim] = axis_name
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, p: int) -> int:
    return ((n + p - 1) // p) * p
