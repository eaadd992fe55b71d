"""AutoSteer 2.0 + temporal AutoSteer trainers: loss math + tiny runs."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.train.autosteer_trainer import autosteer_loss
from autoware_vision_pilot_tpu.train.autosteer_temporal_trainer import (
    AutoSteerTemporalTrainer, AutoSteerTemporalTrainerConfig,
    angle_to_class, smoothed_ce)


def test_autosteer_loss_masked_l1():
    lane = jnp.full((1, 4, 1, 1), 0.6)
    h_logits = jnp.zeros((1, 4, 1, 1))
    # only 2 of 4 rows valid: masked L1 counts invalid rows as 0 error
    t_h = jnp.asarray([1.0, 1.0, 0.0, 0.0]).reshape(1, 4, 1, 1)
    t_xp = jnp.asarray([0.5, 0.7, 0.0, 0.0]).reshape(1, 4, 1, 1)
    total, parts = autosteer_loss(lane, h_logits, t_xp, t_h, xp_weight=1.0)
    assert abs(float(parts["xp"]) - (0.1 + 0.1) / 4) < 1e-6
    assert abs(float(parts["h_vector"]) - float(np.log(2))) < 1e-6


def test_angle_class_mapping():
    assert int(angle_to_class(jnp.float32(-30))) == 0
    assert int(angle_to_class(jnp.float32(0))) == 30
    assert int(angle_to_class(jnp.float32(30))) == 60
    assert int(angle_to_class(jnp.float32(99))) == 60  # clipped


def test_temporal_trainer_learns():
    tr = AutoSteerTemporalTrainer(
        AutoSteerTemporalTrainerConfig(lr=3e-3, max_steps=100))
    rng = np.random.default_rng(0)
    # synthetic: a lane mask pattern whose x-offset encodes the angle
    B = 8
    masks = np.zeros((B, 80, 160, 6), np.float32)
    angles = rng.integers(-20, 21, B).astype(np.float32)
    for i, a in enumerate(angles):
        col = int(80 + a * 2)
        masks[i, :, col - 2:col + 2, :] = 1.0
    losses = [tr.fit_step(masks, angles, angles) for _ in range(25)]
    assert losses[-1] < losses[0]
