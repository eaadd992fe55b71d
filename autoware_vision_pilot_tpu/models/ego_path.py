"""EgoPath / AutoSteer 1.0 legacy modules.

Rebuilds of the reference's first-generation path/steering heads that the
EgoLanes-era stack used (Models/model_components/bev_path_context.py and
auto_steer_head.py): a 1456-channel context block with a built-in 2x
ConvTranspose upsample, and the temporal steering head that fuses the
current reduced neck features with the previous frame's features and
regresses a scalar steering angle from an 800-dim flattened vector.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ..nn.layers import Conv2d, Linear, gelu, max_pool2d


class BEVPathContext(fnn.Module):
    """1456-channel context block (bev_path_context.py). The reference
    declares a trailing 2x ConvTranspose `upsample_layer` but never calls
    it in forward (dead parameter) — we match the executed graph, so
    checkpoints import with strict=False (the unused upsample weights are
    skipped)."""
    in_ch: int = 1456
    ctx_h: int = 10
    ctx_w: int = 20
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        drop = fnn.Dropout(0.25, deterministic=not train)
        v = jnp.mean(x, axis=(1, 2))
        c = Linear(800, name="context_layer_0", **kw)(v)
        c = gelu(drop(c))
        c = Linear(800, name="context_layer_1", **kw)(c)
        c = gelu(drop(c))
        c = Linear(self.ctx_h * self.ctx_w, name="context_layer_2", **kw)(c)
        c = jax.nn.sigmoid(drop(c))
        c = c.reshape(-1, self.ctx_h, self.ctx_w, 1)
        c = gelu(Conv2d(128, 3, 1, 1, name="context_layer_3", **kw)(c))
        c = gelu(Conv2d(256, 3, 1, 1, name="context_layer_4", **kw)(c))
        c = gelu(Conv2d(512, 3, 1, 1, name="context_layer_5", **kw)(c))
        c = gelu(Conv2d(self.in_ch, 3, 1, 1, name="context_layer_6", **kw)(c))
        return c * x + x


class AutoSteerHead(fnn.Module):
    """Temporal steering head (auto_steer_head.py): pool neck to context
    size, pseudo-attention, 3-conv reduction, spatio-temporal concat with
    the previous frame's features, and a Linear(800)->Linear(1) steering
    regression from the flattened reduced features.

    Note the reference flattens with torch.flatten(p3) (all dims incl.
    batch, auto_steer_head.py:62) — faithful for B=1; we flatten per-sample.
    """
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, context, neck, feature_prev, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        p0 = max_pool2d(neck, 2, 2)
        p0 = max_pool2d(p0, 2, 2)
        p0 = p0 * context + context

        p1 = gelu(Conv2d(128, 3, 1, 1, name="neck_reduce_layer_1", **kw)(p0))
        p2 = gelu(Conv2d(64, 3, 1, 1, name="neck_reduce_layer_2", **kw)(p1))
        p3 = Conv2d(64, 3, 1, 1, name="neck_reduce_layer_3", **kw)(p2)
        feature = gelu(p3)

        st = jnp.concatenate([feature, feature_prev], axis=2)  # W concat
        st = gelu(Conv2d(64, 3, 1, 1, name="decode_layer_1", **kw)(st))
        st = gelu(Conv2d(64, 3, 1, 1, name="decode_layer_2", **kw)(st))
        st = gelu(Conv2d(1, 3, 1, 1, name="decode_layer_3", **kw)(st))

        # feature vector from the *pre-activation* p3 (reference :62)
        B = p3.shape[0]
        # torch flatten of NCHW p3 -> channel-major order
        fv = p3.transpose(0, 3, 1, 2).reshape(B, -1)
        angle = gelu(Linear(800, name="steering_decode_layer", **kw)(fv))
        angle = Linear(1, name="steering_output", **kw)(angle)
        return angle, feature
