"""Tensor parallelism for the conv nets: channel-sharded weights +
activations over a 'model' mesh axis.

The reference has no TP (SURVEY §2.3 — torch DDP only); this is the
optional TPU-native extension the survey calls out ("optional pjit
sharding of conv channels"): conv kernels are sharded on their OUTPUT
channel dim, activations on their channel dim, and XLA inserts the
all-to-alls/all-gathers over ICI where a layer's input sharding does not
match the producer. Useful when one chip's HBM cannot hold the
activations of a large batch/clip, or combined with DP as a 2-D mesh
(data, model).

Usage:
    mesh = make_mesh((dp, tp), axis_names=("data", "model"))
    tp_vars = shard_variables_tp(variables, mesh)
    fwd = make_tp_infer(model.apply, tp_vars, mesh)
    out = fwd(batch)    # batch sharded on data axis, channels on model
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"
DATA_AXIS = "data"


def _kernel_spec(path_leaf_name: str, ndim: int, shape, tp_size: int):
    """PartitionSpec for a param leaf: conv kernels (HWIO) shard O,
    conv-transpose kernels (kh,kw,O,I) shard O, linear kernels (I,O)
    shard O, biases/scales shard their (only) channel dim — all only
    when divisible by the axis size."""
    if ndim == 4:
        # 'w' HWIO -> dim 3; 'wt' (kh,kw,O,I) -> dim 2
        dim = 2 if path_leaf_name == "wt" else 3
    elif ndim == 2:
        dim = 1
    elif ndim == 1:
        dim = 0
    else:
        return P()
    if shape[dim] % tp_size != 0:
        return P()
    spec = [None] * ndim
    spec[dim] = MODEL_AXIS
    return P(*spec)


def shard_variables_tp(variables, mesh: Mesh):
    """Place every param leaf with its TP sharding on `mesh`."""
    tp_size = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        spec = _kernel_spec(name, getattr(leaf, "ndim", 0),
                            getattr(leaf, "shape", ()), tp_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, variables)


def make_tp_infer(model_apply: Callable, tp_variables, mesh: Mesh):
    """Jitted forward with the batch sharded over 'data' and the
    channel dim of activations over 'model'. XLA propagates the weight
    shardings through the convs and inserts the ICI collectives."""
    data_sharded = NamedSharding(mesh, P(DATA_AXIS))

    @jax.jit
    def fwd(v, x):
        x = jax.lax.with_sharding_constraint(x, data_sharded)
        return model_apply(v, x)

    def infer(batch):
        batch = jax.device_put(batch, data_sharded)
        return fwd(tp_variables, batch)

    return infer
