"""Mesh construction helpers.

The reference's 'mesh' is a hard-wired 4x4 AIE tile grid with hand-routed
FIFOs and locks (reference src/aie2.py:72-154). Here a mesh is a
jax.sharding.Mesh over real devices; collectives replace the lock network
(SURVEY.md §2.5: SPMD collectives synchronize by construction).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_AUTO = (jax.sharding.AxisType.Auto,)


def make_mesh(num_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if num_devices is None:
        num_devices = len(devs)
    if len(devs) < num_devices:
        raise ValueError(f"need {num_devices} devices, have {len(devs)}")
    # Auto axis types: jax.make_mesh defaults to Explicit sharding-in-types,
    # under which plain reshapes of sharded results (e.g. flattening a plan
    # output, or the timing fence's tiny ravel readback) raise. Every
    # sharding here is already explicit via shard_map in_specs/out_specs.
    return jax.make_mesh((num_devices,), (axis,), devices=devs[:num_devices],
                         axis_types=_AUTO)


def make_mesh_2d(dp: int, sp: int, axes: tuple[str, str] = ("dp", "x")) -> Mesh:
    """(data-parallel batch axis, shard axis) mesh for batched distributed
    NTTs: batch rides `dp`, coefficients ride `sp`."""
    return jax.make_mesh((dp, sp), axes, axis_types=_AUTO * 2)


def make_mesh_hier(groups: int, per_group: int,
                   axes: tuple[str, str] = ("dcn", "ici")) -> Mesh:
    """Two-level (major, minor) mesh for hierarchical distributed plans:
    `groups` hosts/pods on the major (DCN) axis x `per_group` chips on the
    minor (ICI) axis. Pass axes to build_distributed_plan(hier_axes=...)
    so the transpose collective decomposes per network tier. On a real
    multi-host slice jax.devices() orders devices host-major, which is
    exactly this mesh's layout; on a single host the decomposition is a
    structural/correctness mode (same bytes, two collectives)."""
    return jax.make_mesh((groups, per_group), axes, axis_types=_AUTO * 2)


def shard_vector(x, mesh: Mesh, axis: str = "x"):
    """Place a flat (n,) array contiguously over the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))
