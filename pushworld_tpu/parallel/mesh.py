"""Device-mesh helpers for SPMD planning.

The reference has no distributed runtime at all (SURVEY.md §2e); the natural
parallel axes of this domain are independent *puzzles* (data parallel,
reference analog: the benchmark harness's per-puzzle isolation) and
within-puzzle *rollout/frontier batches*.  Meshes here arrange devices as
('puzzle',) or ('puzzle', 'rollout'); cross-host launches use
``jax.distributed.initialize`` in the usual way before building a mesh.
"""

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    devices: Optional[Sequence] = None, axis_name: str = "puzzle"
) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    puzzle_axis: int, rollout_axis: int, devices: Optional[Sequence] = None
) -> Mesh:
    """A ('puzzle', 'rollout') mesh of the given shape."""
    if devices is None:
        devices = jax.devices()
    arr = np.asarray(devices[: puzzle_axis * rollout_axis]).reshape(
        (puzzle_axis, rollout_axis)
    )
    return Mesh(arr, ("puzzle", "rollout"))


def shard_leading(mesh: Mesh, tree, axis_name: str = "puzzle"):
    """device_puts every array in ``tree`` sharded along its leading axis."""
    sharding = NamedSharding(mesh, PartitionSpec(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
