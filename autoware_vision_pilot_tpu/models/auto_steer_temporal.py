"""AutoSteerTemporalNet — the runtime steering classifier.

The C++ runtime's AutoSteer engine (production_release/src/inference/
autosteer_engine.cpp:104-221) consumes two stacked EgoLanes mask tensors
[1, 6, 80, 160] (frames t-1 and t) and produces TWO 61-way logit vectors
(prev, current); steering = argmax(current) - 30 degrees. The reference
ships only the ONNX for this legacy model (no Python source in Models/),
so this module defines the network with the exact I/O contract.

Architecture (TPU-friendly, small): strided ConvBN stack over the 6-channel
mask pair -> global pooled features -> two 61-way heads. ~1.5 MFLOP; its
latency is dominated by dispatch, so in the fused pipeline it rides in the
same XLA program as EgoLanes.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as fnn

from ..nn.layers import Conv2d, Linear, silu

NUM_CLASSES = 61  # steering -30..+30 degrees


class AutoSteerTemporalNet(fnn.Module):
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, 80, 160, 6) stacked [t-1, t] EgoLanes masks (NHWC).
        Returns (prev_logits, curr_logits), each (B, 61)."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        h = silu(Conv2d(32, 3, 2, 1, name="c1", **kw)(x))      # 40x80
        h = silu(Conv2d(64, 3, 2, 1, name="c2", **kw)(h))      # 20x40
        h = silu(Conv2d(128, 3, 2, 1, name="c3", **kw)(h))     # 10x20
        h = silu(Conv2d(128, 3, 2, 1, name="c4", **kw)(h))     # 5x10
        # steering is a lateral-localization task: keep the spatial map
        # (a global pool would erase the lane offset/curvature position
        # signal — measured: mean-pool head plateaus at chance on the
        # synthetic curved-lane task, tools/e2e_autosteer_demo.py)
        h = silu(Conv2d(32, 1, 1, 0, name="c5", **kw)(h))      # 5x10x32
        feat = h.reshape((h.shape[0], -1))                     # (B, 1600)
        feat = silu(Linear(256, name="fc", **kw)(feat))
        prev = Linear(NUM_CLASSES, name="head_prev", **kw)(feat)
        curr = Linear(NUM_CLASSES, name="head_curr", **kw)(feat)
        return prev, curr


def steering_from_logits(curr_logits):
    """argmax - 30 -> degrees (autosteer_engine.cpp:193-204)."""
    return jnp.argmax(curr_logits, axis=-1).astype(jnp.float32) - 30.0
