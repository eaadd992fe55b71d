"""AutoSpeed — YOLOv11-style object detector (vehicles/pedestrians CIPO).

Rebuild of Models/model_components/auto_speed/*: CTX-based backbone
(auto_speed_backbone.py), PAN-FPN neck (auto_speed_neck.py), decoupled
DFL box + depthwise cls head with anchor decode (auto_speed_head.py).

Inference decode runs fully on device with static shapes: output is
(B, A, 4+nc) with xywh in input pixels and sigmoid class scores; NMS lives
in ops.postprocess (masked, fixed-size — TPU-jittable).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ..nn.layers import Conv2d, upsample2x_nearest
from .yolo_layers import YoloConv, C3K2, SPPF, C2PSA, CTX, dfl_decode

# variant name -> (csp pair, depth, width) — auto_speed_network.py:60-66
VARIANTS = {
    "n": {"csp": (False, True), "depth": (1,) * 6, "width": (3, 16, 32, 64, 128, 256)},
    "s": {"csp": (False, True), "depth": (1,) * 6, "width": (3, 32, 64, 128, 256, 512)},
    "m": {"csp": (True, True), "depth": (1,) * 6, "width": (3, 64, 128, 256, 512, 512)},
    "l": {"csp": (True, True), "depth": (2,) * 6, "width": (3, 64, 128, 256, 512, 512)},
    "x": {"csp": (True, True), "depth": (2,) * 6, "width": (3, 96, 192, 384, 768, 768)},
}

# the reference builds CTX spatial maps for a 512x1024 input
DEFAULT_H, DEFAULT_W = 512, 1024


class AutoSpeedBackbone(fnn.Module):
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
        W, D = self.width, self.depth
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
        return p3, p4, p5


class AutoSpeedNeck(fnn.Module):
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
        p3, p4, p5 = feats
        p4 = C3K2(W[4], D[5], C[0], r=2, name="h1", **kw)(
            jnp.concatenate([upsample2x_nearest(p5), p4], axis=-1), train)
        p3 = C3K2(W[3], D[5], C[0], r=2, name="h2", **kw)(
            jnp.concatenate([upsample2x_nearest(p4), p3], axis=-1), train)
        d3 = YoloConv(W[3], k=3, s=2, p=1, name="h3", **kw)(p3, train)
        p4 = C3K2(W[4], D[5], C[0], r=2, name="h4", **kw)(
            jnp.concatenate([d3, p4], axis=-1), train)
        d4 = YoloConv(W[4], k=3, s=2, p=1, name="h5", **kw)(p4, train)
        p5 = C3K2(W[5], D[5], C[1], r=2, name="h6", **kw)(
            jnp.concatenate([d4, p5], axis=-1), train)
        return p3, p4, p5


def make_anchors(shapes, strides, dtype=jnp.float32, offset: float = 0.5):
    """Anchor centers (A, 2) + per-anchor stride (A, 1), concatenated over
    levels — same layout as auto_speed_head.py make_anchors."""
    anchors, strs = [], []
    for (h, w), s in zip(shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + offset
        sy = jnp.arange(h, dtype=dtype) + offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        anchors.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        strs.append(jnp.full((h * w, 1), s, dtype=dtype))
    return jnp.concatenate(anchors), jnp.concatenate(strs)


class AutoSpeedHead(fnn.Module):
    nc: int = 4
    filters: Sequence[int] = (64, 128, 256)
    strides: Sequence[int] = (8, 16, 32)
    ch: int = 16  # DFL bins
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, feats, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        box_ch = max(64, self.filters[0] // 4)
        cls_ch = max(80, self.filters[0], self.nc)

        outs = []
        for i, (x, f) in enumerate(zip(feats, self.filters)):
            b = YoloConv(box_ch, k=3, p=1, name=f"box_{i}_0", **kw)(x, train)
            b = YoloConv(box_ch, k=3, p=1, name=f"box_{i}_1", **kw)(b, train)
            b = Conv2d(4 * self.ch, 1, 1, 0, name=f"box_{i}_2", **kw)(b)
            c = YoloConv(f, k=3, p=1, g=f, name=f"cls_{i}_0", **kw)(x, train)
            c = YoloConv(cls_ch, name=f"cls_{i}_1", **kw)(c, train)
            c = YoloConv(cls_ch, k=3, p=1, g=cls_ch, name=f"cls_{i}_2", **kw)(c, train)
            c = YoloConv(cls_ch, name=f"cls_{i}_3", **kw)(c, train)
            c = Conv2d(self.nc, 1, 1, 0, name=f"cls_{i}_4", **kw)(c)
            outs.append(jnp.concatenate([b, c], axis=-1))

        if train:
            return outs  # per-level (B, H, W, 4*ch + nc) raw maps

        # static-shape decode: (B, A, 4+nc)
        B = outs[0].shape[0]
        flat = jnp.concatenate(
            [o.reshape(B, -1, o.shape[-1]) for o in outs], axis=1)
        box_logits, cls_logits = flat[..., :4 * self.ch], flat[..., 4 * self.ch:]
        shapes = [(o.shape[1], o.shape[2]) for o in outs]
        anchors, strides = make_anchors(shapes, self.strides, flat.dtype)
        d = dfl_decode(box_logits, self.ch, self.precision)  # (B, A, 4) ltrb
        lt, rb = d[..., :2], d[..., 2:]
        x1y1 = anchors[None] - lt
        x2y2 = anchors[None] + rb
        xywh = jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)
        return jnp.concatenate(
            [xywh * strides[None], jax.nn.sigmoid(cls_logits)], axis=-1)


class AutoSpeedNetwork(fnn.Module):
    """Full detector; torch attr names net/fpn/head (auto_speed_network.py)."""
    variant: str = "n"
    num_classes: int = 4
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
        feats = AutoSpeedBackbone(cfg["width"], cfg["depth"], cfg["csp"],
                                  self.img_h, self.img_w, name="net", **kw)(x, train)
        feats = AutoSpeedNeck(cfg["width"], cfg["depth"], cfg["csp"],
                              name="fpn", **kw)(feats, train)
        W = cfg["width"]
        return AutoSpeedHead(self.num_classes, (W[3], W[4], W[5]),
                             name="head", **kw)(feats, train)
