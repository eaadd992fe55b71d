"""Data-parallel training step over a jax.sharding.Mesh.

TPU-native replacement for the reference's torch DDP/NCCL training
(Models/training/auto_speed_trainer.py:56-61, 298): the batch dimension is
sharded over the mesh's 'data' axis with NamedSharding; jit compiles ONE
SPMD program and XLA inserts the gradient all-reduce over ICI — there is no
explicit communication code to write. Gradient accumulation (the reference's
batch-size-by-accumulation trick, train_scene_seg.py:113-129) is a
lax.scan over microbatches inside the same jit.

bf16 compute replaces AMP autocast+GradScaler (no loss scaling needed).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.mesh import make_mesh, data_sharding, replicated


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None

    def tree_flatten(self):  # simple pytree registration
        return ((self.params, self.batch_stats, self.opt_state, self.step,
                 self.ema_params), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def create_seg_train_state(model, input_shape, rng, tx, ema: bool = False):
    # jit the init: one compiled program instead of one eager compile per op
    init_fn = jax.jit(lambda k: model.init(
        k, jnp.zeros(input_shape, jnp.float32), train=False))
    vars_ = init_fn(rng)
    params = vars_["params"]
    batch_stats = vars_.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def make_seg_train_step(model, tx, loss_fn: Callable,
                        mesh=None, microbatches: int = 1,
                        ema_decay: Optional[float] = None,
                        donate: bool = True, scan_unroll: int = 1):
    """Build a jitted SPMD train step.

    loss_fn(logits, targets) -> scalar.
    Batch arrays are expected sharded over mesh axis 'data' on dim 0.
    With microbatches>1 the leading batch dim is split and scanned with
    gradient accumulation (mean over microbatches).

    scan_unroll: lax.scan unroll factor for the microbatch loop. On TPU
    keep 1 (rolled loop, smallest program). The multichip dryrun passes
    scan_unroll=microbatches: XLA:CPU compiles a while-loop whose body
    carries the full gradient pytree pathologically slowly (measured
    >450 s for a body that compiles in 64 s fully unrolled).
    """
    if mesh is None:
        mesh = make_mesh()

    def forward_loss(params, batch_stats, images, targets, dropout_rng):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng})
        loss = loss_fn(outs, targets)
        return loss, mutated.get("batch_stats", batch_stats)

    def step_fn(state: TrainState, images, targets, rng):
        def micro_grads(carry, mb):
            g_acc, bs = carry
            mb_images, mb_targets, mb_rng = mb
            (loss, new_bs), grads = jax.value_and_grad(
                forward_loss, has_aux=True)(
                    state.params, bs, mb_images, mb_targets, mb_rng)
            g_acc = jax.tree.map(jnp.add, g_acc, grads)
            return (g_acc, new_bs), loss

        B = images.shape[0]
        mb = microbatches
        if mb == 1:
            # No accumulation: skip the scan entirely. A length-1 scan is
            # not free — XLA:CPU compiles a while-loop whose body carries
            # the whole gradient pytree pathologically slowly (see
            # scan_unroll note above), and on TPU it adds loop overhead.
            (loss, new_bs), grads = jax.value_and_grad(
                forward_loss, has_aux=True)(
                    state.params, state.batch_stats, images, targets, rng)
            losses = loss[None]
        else:
            mb_images = images.reshape(mb, B // mb, *images.shape[1:])
            mb_targets = targets.reshape(mb, B // mb, *targets.shape[1:])
            rngs = jax.random.split(rng, mb)

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_bs), losses = jax.lax.scan(
                micro_grads, (zero_grads, state.batch_stats),
                (mb_images, mb_targets, rngs), unroll=scan_unroll)
            grads = jax.tree.map(lambda g: g / mb, grads)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1 - ema_decay),
                state.ema_params, new_params)
        new_state = TrainState(new_params, new_bs, new_opt,
                               state.step + 1, new_ema)
        return new_state, jnp.mean(losses)

    rep = replicated(mesh)
    dat = data_sharding(mesh, 1)  # leading dim of any-rank arrays

    def shard_batch_spec(x):
        return data_sharding(mesh, x.ndim)

    jit_step = jax.jit(
        step_fn,
        donate_argnums=(0,) if donate else (),
    )

    def run(state, images, targets, rng):
        # shard the batch only when it divides the mesh (small debug
        # batches replicate instead of erroring)
        if images.shape[0] % mesh.devices.size == 0:
            images = jax.device_put(images,
                                    data_sharding(mesh, images.ndim))
            targets = jax.device_put(targets,
                                     data_sharding(mesh, targets.ndim))
            state = jax.device_put(state, rep)
        return jit_step(state, images, targets, rng)

    return run, jit_step
