"""Mesh construction and sharding rules.

Axis conventions:
  * `data`  — batch dimension (pure data parallelism; gradient psum rides ICI)
  * `width` — panorama width (spatial/context parallelism for 64x256+
    configs; cyclic halos via ppermute, see skyhdr.parallel.spatial)
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process.

    The reference has no multi-node story at all (SURVEY.md §2.3); on TPU
    pods this one call makes jax.devices() span all hosts and every
    mesh/collective in this package work unchanged.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(data: int = 0, width: int = 1, devices=None) -> Mesh:
    """Create a (data, width) mesh. data=0 means 'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == 0:
        assert n % width == 0, (n, width)
        data = n // width
    assert data * width <= n, (data, width, n)
    devs = np.asarray(devices[: data * width]).reshape(data, width)
    return Mesh(devs, axis_names=("data", "width"))


def batch_sharding(mesh: Mesh, shard_width: bool = False) -> NamedSharding:
    """[b, h, w, c] batches: batch over `data`, optionally width over
    `width`."""
    if shard_width:
        return NamedSharding(mesh, P("data", None, "width", None))
    return NamedSharding(mesh, P("data"))


def vector_sharding(mesh: Mesh) -> NamedSharding:
    """[b] per-sample scalars (elevations): batch over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
