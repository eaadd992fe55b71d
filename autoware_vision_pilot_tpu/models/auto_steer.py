"""AutoSteer 2.0 — lane/path vector regression on 512x1024 frames.

Rebuild of Models/model_components/auto_steer/*: the AutoSpeed-style CTX
backbone (returning p2..p5), a 2-stage top-down neck, and the percept head
(auto_steer_percept_head.py) that regresses a normalized lane-position
vector via a column-softmax soft-argmax plus a lane-height map.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ..nn.layers import Conv2d, upsample2x_nearest, silu
from .yolo_layers import YoloConv, C3K2, SPPF, C2PSA, CTX
from .auto_speed import VARIANTS, DEFAULT_H, DEFAULT_W


class AutoSteerBackbone(fnn.Module):
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
        return p2, p3, p4, p5


class AutoSteerNeck(fnn.Module):
    width: Sequence[int]
    depth: Sequence[int]
    csp: Sequence[bool]
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, feats, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        W, D, C = self.width, self.depth, self.csp
        p2, p3, p4, p5 = feats
        p4 = C3K2(W[4], D[5], C[0], r=2, name="h1", **kw)(
            jnp.concatenate([upsample2x_nearest(p5), p4], axis=-1), train)
        p3 = C3K2(W[3], D[5], C[0], r=2, name="h2", **kw)(
            jnp.concatenate([upsample2x_nearest(p4), p3], axis=-1), train)
        return p2, p3


class AutoSteerPerceptHead(fnn.Module):
    """auto_steer_percept_head.py: vertical 2x1 compression convs, feature
    concat, then (a) column soft-argmax lane position in [0,1] and (b) a
    16x-compressed lane-height map."""
    in_ch: int
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, feats, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        c4 = self.in_ch // 4
        p2, p3 = feats
        p2 = silu(Conv2d(c4, (2, 1), (2, 1), 0, name="v1", **kw)(p2))
        p3 = silu(Conv2d(c4, (2, 1), (2, 1), 0, name="v2", **kw)(p3))

        features = jnp.concatenate([upsample2x_nearest(p3), p2], axis=-1)

        lanes = YoloConv(1, k=3, s=1, p=1, name="c1", **kw)(features, train)
        lanes = silu(lanes)
        lanes = jax.nn.softmax(lanes, axis=2)  # over W (NHWC)
        Wd = lanes.shape[2]
        cols = jnp.arange(Wd, dtype=lanes.dtype)
        lane_value = jnp.sum(lanes * cols[None, None, :, None],
                             axis=2, keepdims=True) / Wd  # (B, H, 1, 1)

        height = YoloConv(1, k=3, s=1, p=1, name="c2", **kw)(features, train)
        height = silu(height)
        height = silu(Conv2d(1, (1, 16), (1, 16), 0, name="h1", **kw)(height))
        height = silu(Conv2d(1, (1, 16), (1, 16), 0, name="h2", **kw)(height))
        return lane_value, height


class AutoSteerNetwork(fnn.Module):
    """torch attr names net/fpn/head (auto_steer_network.py)."""
    variant: str = "n"
    img_h: int = DEFAULT_H
    img_w: int = DEFAULT_W
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        cfg = VARIANTS[self.variant]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        feats = AutoSteerBackbone(cfg["width"], cfg["depth"], cfg["csp"],
                                  self.img_h, self.img_w, name="net", **kw)(x, train)
        feats = AutoSteerNeck(cfg["width"], cfg["depth"], cfg["csp"],
                              name="fpn", **kw)(feats, train)
        return AutoSteerPerceptHead(cfg["width"][4], name="head", **kw)(feats, train)
