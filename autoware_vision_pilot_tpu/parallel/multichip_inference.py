"""Multi-chip batch-parallel inference.

The batched-clip configuration (BASELINE config 3; SURVEY §5.7: the time
dimension of a video clip is the shardable axis) scaled over a mesh:
params replicated, the frame batch sharded on 'data', one jit — XLA keeps
every chip busy on its shard with zero collectives in the forward.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.mesh import make_mesh, data_sharding, replicated


def make_sharded_infer(model_apply: Callable, variables, mesh=None):
    """Returns infer(batch) running batch-sharded over the mesh.

    model_apply(variables, x) -> outputs. The batch dim of x must divide
    the mesh size.
    """
    mesh = mesh or make_mesh()
    rep = replicated(mesh)
    variables = jax.device_put(variables, rep)

    @jax.jit
    def _fwd(v, x):
        return model_apply(v, x)

    def infer(batch):
        batch = jax.device_put(batch, data_sharding(mesh, batch.ndim))
        return _fwd(variables, batch)

    return infer
