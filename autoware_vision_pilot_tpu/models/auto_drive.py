"""AutoDrive — temporal two-frame regression of (normalized CIPO distance,
path curvature, cut-in flag logit).

Rebuild of Models/model_components/autodrive/*: the AutoSpeed 'n' backbone
(P5 only) shared across (t-1, t) frames; head concatenates P5 maps ->
conv stack -> MLP -> three task branches (autodrive_head.py).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ..nn.layers import Conv2d, Linear, silu
from .yolo_layers import YoloConv, SPPF, C2PSA, CTX
from .auto_speed import VARIANTS, DEFAULT_H, DEFAULT_W


class AutoDriveBackbone(fnn.Module):
    width: Sequence[int]
    depth: Sequence[int]
    csp: Sequence[bool]
    img_h: int = DEFAULT_H
    img_w: int = DEFAULT_W
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        W = self.width
        h, w = self.img_h, self.img_w
        p1 = YoloConv(W[1], k=3, s=2, p=1, name="p1", **kw)(x, train)
        p2 = YoloConv(W[2], k=3, s=2, p=1, name="p2_0", **kw)(p1, train)
        p2 = CTX(W[2], W[3], r=2, h=h // 4, w=w // 4, name="p2_1", **kw)(p2, train)
        p3 = YoloConv(W[3], k=3, s=2, p=1, name="p3_0", **kw)(p2, train)
        p3 = CTX(W[3], W[4], r=2, h=h // 8, w=w // 8, name="p3_1", **kw)(p3, train)
        p4 = YoloConv(W[4], k=3, s=2, p=1, name="p4_0", **kw)(p3, train)
        p4 = CTX(W[4], W[4], r=2, h=h // 16, w=w // 16, name="p4_1", **kw)(p4, train)
        p5 = YoloConv(W[5], k=3, s=2, p=1, name="p5_0", **kw)(p4, train)
        p5 = CTX(W[5], W[5], r=2, h=h // 32, w=w // 32, name="p5_1", **kw)(p5, train)
        p5 = SPPF(W[5], name="p5_2", **kw)(p5, train)
        p5 = C2PSA(W[5], name="p5_3", **kw)(p5, train)
        return p5


class AutoDriveHead(fnn.Module):
    in_channels: int = 256
    p5_h: int = DEFAULT_H // 32
    p5_w: int = DEFAULT_W // 32
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, feat_prev, feat_curr, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        x = jnp.concatenate([feat_prev, feat_curr], axis=-1)
        x = silu(Conv2d(256, 3, 1, 1, name="conv_1", **kw)(x))
        x = silu(Conv2d(64, 3, 1, 1, name="conv_2", **kw)(x))
        x = silu(Conv2d(2, 3, 1, 1, name="conv_3", **kw)(x))
        # torch flattens channel-major: (B,C,H,W) -> (B, C*H*W)
        B = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(B, -1)

        drop = fnn.Dropout(0.1, deterministic=not train)
        x = drop(silu(Linear(768, name="fc1_0", **kw)(x)))
        x = drop(silu(Linear(512, name="fc2_0", **kw)(x)))

        d_norm = jax.nn.relu(Linear(1, name="distance_head_0", **kw)(x))
        curvature = jnp.tanh(Linear(1, name="curvature_head_0", **kw)(x))
        flag_logit = Linear(1, name="flag_head", **kw)(x)
        return d_norm, curvature, flag_logit

    @staticmethod
    def to_distance_meters(d_norm):
        return 150.0 * (1.0 - d_norm)


class AutoDriveNetwork(fnn.Module):
    """torch attr names backbone/head (autodrive_network.py). Runs the shared
    backbone on both frames as one batched forward (2B) — on TPU this is one
    compiled program with double the batch instead of two kernel launches."""
    img_h: int = DEFAULT_H
    img_w: int = DEFAULT_W
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, image_prev, image_curr, train: bool = False):
        cfg = VARIANTS["n"]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        bb = AutoDriveBackbone(cfg["width"], cfg["depth"], cfg["csp"],
                               self.img_h, self.img_w, name="backbone", **kw)
        B = image_prev.shape[0]
        both = jnp.concatenate([image_prev, image_curr], axis=0)
        p5 = bb(both, train)
        return AutoDriveHead(cfg["width"][5], self.img_h // 32,
                             self.img_w // 32, name="head", **kw)(
            p5[:B], p5[B:], train)
