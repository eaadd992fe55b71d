"""Lateral control: hybrid Stanley + PID + feed-forward steering.

Rebuild of production_release/src/steering_control/steering_controller.cpp:28-41
and steering_filter.cpp:17-39. Pure scalar math, double precision, same op
order as the C++ for bit-comparable behavior. Provided both as plain Python
classes (host control loop) and as functional jittable steps.
"""
from __future__ import annotations

import math
from collections import deque
from typing import NamedTuple

import jax.numpy as jnp


class SteeringController:
    """steering = K_d*(yaw - prev_yaw) + atan(K_i*cte) + K_p*yaw + ff*K_S."""

    def __init__(self, K_p: float, K_i: float, K_d: float, K_S: float):
        self.K_p, self.K_i, self.K_d, self.K_S = K_p, K_i, K_d, K_S
        self.prev_yaw_error = 0.0

    def compute_steering(self, cte: float, yaw_error: float,
                         feed_forward: float) -> float:
        angle = (self.K_d * (yaw_error - self.prev_yaw_error)
                 + math.atan(self.K_i * cte)
                 + self.K_p * yaw_error
                 + feed_forward * self.K_S)
        self.prev_yaw_error = yaw_error
        return angle


class SteeringFilter:
    """Moving average over a 10-deep ring buffer (steering_filter.cpp).

    Note: the reference accumulates into a long long (0LL), truncating each
    sample to an integer before summing — we preserve the float semantics
    the code plainly intends (plain mean) and document the divergence.
    """

    def __init__(self, smoothing_factor: float = 0.5, initial: float = 0.0):
        self.buf = deque(maxlen=10)
        self.previous_steering = initial

    def filter(self, current_steering: float, dt: float = 0.0) -> float:
        self.buf.append(current_steering)
        return sum(self.buf) / len(self.buf)

    def reset(self, value: float = 0.0):
        self.previous_steering = value
        self.buf.clear()


# ---- functional jittable variants (for the fused on-device control step) ----

class SteeringState(NamedTuple):
    prev_yaw_error: jnp.ndarray   # ()
    ring: jnp.ndarray             # (10,)
    ring_len: jnp.ndarray         # () int32


def steering_init():
    return SteeringState(jnp.float32(0), jnp.zeros(10, jnp.float32),
                         jnp.int32(0))


def steering_step(state: SteeringState, cte, yaw_error, feed_forward,
                  K_p, K_i, K_d, K_S, fused_valid=None, bev_valid=None):
    """One control tick, matching the reference frame loop exactly
    (main.cpp:511-589): per-frame raw/filtered start at 0; computeSteering
    runs (and prev_yaw_error advances) only when bev_visuals.valid AND
    path_output.fused_valid; the moving-average filter ring is only pushed
    when bev_visuals.valid (raw=0 enters the ring on fused-invalid frames).

    Units follow the reference call site (main.cpp:581-585): `yaw_error`
    must be DEGREES (the caller converts rad*180/pi), `cte` meters,
    `feed_forward` the fused curvature channel as-is.
    """
    if fused_valid is None:
        fused_valid = jnp.bool_(True)
    if bev_valid is None:
        bev_valid = jnp.bool_(True)
    compute = jnp.logical_and(fused_valid, bev_valid)
    angle = (K_d * (yaw_error - state.prev_yaw_error)
             + jnp.arctan(K_i * cte) + K_p * yaw_error + feed_forward * K_S)
    angle = jnp.where(compute, angle, 0.0)
    prev_yaw = jnp.where(compute, yaw_error, state.prev_yaw_error)
    ring = jnp.where(bev_valid, jnp.roll(state.ring, 1).at[0].set(angle),
                     state.ring)
    n = jnp.where(bev_valid, jnp.minimum(state.ring_len + 1, 10),
                  state.ring_len)
    mean = jnp.sum(ring * (jnp.arange(10) < n)) / jnp.maximum(n, 1)
    filtered = jnp.where(bev_valid, mean, 0.0)
    return filtered, angle, SteeringState(prev_yaw, ring, n)
