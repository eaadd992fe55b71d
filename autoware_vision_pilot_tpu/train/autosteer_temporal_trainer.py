"""Trainer for the runtime AutoSteerTemporalNet (61-way steering
classifier on stacked EgoLanes masks).

The reference ships only the ONNX for this model; its training recipe is
implied by the runtime contract (autosteer_engine.cpp: classes 0..60 ->
angles -30..+30 deg; two outputs supervised on consecutive frames). This
trainer supervises both heads with label-smoothed cross-entropy on
(prev_angle, curr_angle) class targets.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.auto_steer_temporal import AutoSteerTemporalNet, NUM_CLASSES
from ..export.checkpoints import save_msgpack


def angle_to_class(angle_deg):
    """degrees [-30, 30] -> class id [0, 60]."""
    return jnp.clip(jnp.round(angle_deg) + 30, 0, NUM_CLASSES - 1).astype(
        jnp.int32)


def smoothed_ce(logits, target_ids, smoothing: float = 0.05):
    onehot = jax.nn.one_hot(target_ids, NUM_CLASSES)
    soft = onehot * (1 - smoothing) + smoothing / NUM_CLASSES
    return -jnp.mean(jnp.sum(soft * jax.nn.log_softmax(logits, -1), -1))


@dataclasses.dataclass
class AutoSteerTemporalTrainerConfig:
    lr: float = 1e-3
    max_steps: int = 5000
    weight_decay: float = 1e-4
    smoothing: float = 0.05
    ckpt_dir: str = "runs/autosteer_temporal"


class AutoSteerTemporalTrainer:
    def __init__(self, cfg: AutoSteerTemporalTrainerConfig, seed: int = 0):
        self.cfg = cfg
        self.model = AutoSteerTemporalNet()
        self.tx = optax.adamw(
            optax.cosine_decay_schedule(cfg.lr, cfg.max_steps),
            weight_decay=cfg.weight_decay)
        vars_ = self.model.init(jax.random.key(seed),
                                jnp.zeros((1, 80, 160, 6)))
        self.params = vars_["params"]
        self.opt_state = self.tx.init(self.params)
        smoothing = cfg.smoothing

        def train_step(params, opt_state, stacked, prev_ids, curr_ids):
            def loss_fn(p):
                prev_l, curr_l = self.model.apply({"params": p}, stacked)
                return (smoothed_ce(prev_l, prev_ids, smoothing) +
                        smoothed_ce(curr_l, curr_ids, smoothing))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

    def fit_step(self, stacked_masks, prev_angle_deg, curr_angle_deg):
        """stacked_masks: (B, 80, 160, 6) float; angles in degrees."""
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, jnp.asarray(stacked_masks),
            angle_to_class(jnp.asarray(prev_angle_deg)),
            angle_to_class(jnp.asarray(curr_angle_deg)))
        return float(loss)

    def save(self, name: str = "last"):
        import pathlib
        p = pathlib.Path(self.cfg.ckpt_dir)
        p.mkdir(parents=True, exist_ok=True)
        save_msgpack(p / f"{name}.msgpack", {"params": self.params})
