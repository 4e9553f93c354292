"""Mesh construction helpers.

The reference's 'mesh' is a hard-wired 4x4 AIE tile grid with hand-routed
FIFOs and locks (reference src/aie2.py:72-154). Here a mesh is a
jax.sharding.Mesh over real devices; collectives replace the lock network
(SURVEY.md §2.5: SPMD collectives synchronize by construction).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if num_devices is None:
        num_devices = len(devs)
    if len(devs) < num_devices:
        raise ValueError(f"need {num_devices} devices, have {len(devs)}")
    return jax.make_mesh((num_devices,), (axis,), devices=devs[:num_devices])


def make_mesh_2d(dp: int, sp: int, axes: tuple[str, str] = ("dp", "x")) -> Mesh:
    """(data-parallel batch axis, shard axis) mesh for batched distributed
    NTTs: batch rides `dp`, coefficients ride `sp`."""
    return jax.make_mesh((dp, sp), axes)


def shard_vector(x, mesh: Mesh, axis: str = "x"):
    """Place a flat (n,) array contiguously over the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))
