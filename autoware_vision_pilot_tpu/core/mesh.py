"""Device mesh helpers.

The reference scales training with torch DDP over NCCL
(Models/training/auto_speed_trainer.py:298). The TPU-native equivalent is a
``jax.sharding.Mesh`` with the batch dimension sharded over the ``data``
axis; XLA inserts the gradient ``psum`` over ICI automatically under jit.

All helpers work on any device count (1 real TPU chip, or N virtual CPU
devices via ``--xla_force_host_platform_device_count``).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(axis_sizes: Sequence[int] | None = None,
              axis_names: Sequence[str] = (DATA_AXIS,),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    With no arguments: a 1-D data-parallel mesh over all devices.
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dimension `axis` of an ndim-array over the data mesh axis."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
