"""Device mesh and sharding helpers.

The reference has no distributed backend at all (single ``cuda``-or-``cpu``
device, ``ZERO_JOINT_BOUNDS.py:17``); this module is the TPU-native
equivalent layer: a 1-D data-parallel mesh over ICI.  Batches are sharded on
their leading axis, parameters and the cached prompt bank are replicated,
and gradient/metric reductions are XLA collectives inserted by the compiler
— there is no NCCL/MPI analogue to port.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = DATA_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 1-D mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # silently truncating would run a different sharding/padding
            # than the user asked for (same contract as tp.create_mesh_2d)
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int = 2, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis over the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def stacked_batch_sharding(mesh: Mesh, ndim: int, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 1 — the row axis of the whole-run fold's (U, n_pad, ...)
    stacked unit slabs (engine/trainer.py::train_incremental_run) — and
    replicate the unit axis and everything trailing."""
    return NamedSharding(mesh, P(None, axis_name, *([None] * (ndim - 2))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place a pytree of host arrays batch-sharded on the mesh.

    Leading axes must be divisible by the mesh size (callers pad final
    batches to a static batch size, so this holds by construction).
    """

    def _put(x):
        nd = np.ndim(x)
        if nd == 0:
            # a rank-1 spec on a scalar leaf is invalid; replicate it
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, batch_sharding(mesh, nd, axis_name))

    return jax.tree_util.tree_map(_put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, prompt bank) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
