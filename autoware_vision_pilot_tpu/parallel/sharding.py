"""Sharding / collective helpers over the device mesh.

The TPU-native replacement for the reference's NCCL DDP layer
(auto_speed_trainer.py:298): under jit with NamedSharding-annotated
inputs, XLA inserts the gradient all-reduce automatically; these helpers
cover the places where explicit collectives are clearer (shard_map-based
custom reductions, batch sharding, replica-mean of host metrics).
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.mesh import DATA_AXIS, data_sharding


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """device_put every array in the pytree with dim-0 sharded over the
    data axis (replicates when dim 0 does not divide the mesh)."""
    n = mesh.devices.size

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, data_sharding(mesh, x.ndim))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)


def all_reduce_mean(mesh: Mesh, value):
    """Mean of a replicated-per-shard scalar/array across the data axis
    via an explicit shard_map psum (the NCCL allreduce analog)."""
    @partial(shard_map, mesh=mesh, in_specs=P(DATA_AXIS),
             out_specs=P())
    def _mean(v):
        return jax.lax.psum(jnp.mean(v, keepdims=True),
                            DATA_AXIS) / mesh.shape[DATA_AXIS]

    return _mean(value)


def pmean_gradients(grads, axis_name: str = DATA_AXIS):
    """Explicit gradient pmean for shard_map-style training loops."""
    return jax.tree.map(lambda g: jax.lax.pmean(g, axis_name), grads)


def cross_replica_psum(x, axis_name: str = DATA_AXIS):
    return jax.lax.psum(x, axis_name)
