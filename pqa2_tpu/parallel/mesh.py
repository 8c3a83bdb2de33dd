"""Mesh construction and sharding helpers.

Axis conventions (used across the framework):
  "data"  — frame batch axis (DP). Primary scaling axis.
  "space" — frame-row axis (spatial partitioning of one frame, for 4K+).

``make_mesh()`` with no arguments uses every visible device on "data" — the
right default for VMAF where frames vastly outnumber chips.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    n_data: Optional[int] = None,
    n_space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "space") mesh over the visible devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    if n_data * n_space > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_space} needs {n_data * n_space} devices, "
            f"have {len(devices)}"
        )
    dev_array = np.asarray(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(dev_array, (DATA_AXIS, SPACE_AXIS))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (N, H, W) frame batches: N over data, H over space."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_frames(frames, mesh: Mesh):
    """device_put a host (N, H, W) batch with the canonical frame sharding.

    N must be divisible by the data axis (pad at the caller if needed —
    pipeline.scoring pads chunks to static shapes already).
    """
    return jax.device_put(frames, frame_sharding(mesh))
