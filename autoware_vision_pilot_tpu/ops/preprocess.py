"""On-device image preprocessing, replacing the reference's OpenCV CPU chain.

The reference preprocesses on the host per frame (resize -> BGR2RGB -> /255
-> ImageNet mean-std -> HWC->CHW; production_release/src/inference/
onnxruntime_engine.cpp:72-102, and letterbox with gray-114 padding for
AutoSpeed; autospeed/onnxruntime_engine.cpp:71-113). Here the raw uint8
frame is shipped to HBM once and everything else runs inside the jitted
step, fused by XLA with the first conv.

All functions take/return NHWC. Resize matches cv2.INTER_LINEAR exactly
(half-pixel sampling, no antialiasing).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], dtype=jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], dtype=jnp.float32)


def resize_bilinear(img, out_hw: Tuple[int, int], dtype=jnp.float32):
    """cv2.resize(..., INTER_LINEAR)-compatible bilinear resize (no AA).

    img: (..., H, W, C) any numeric dtype; returns float.
    """
    h, w = out_hw
    shape = img.shape[:-3] + (h, w, img.shape[-1])
    return jax.image.resize(img.astype(dtype), shape, method="linear",
                            antialias=False)


def preprocess_imagenet(frame_bgr_u8, out_hw: Tuple[int, int],
                        dtype=jnp.float32):
    """BGR uint8 frame(s) -> resized, RGB, [0,1], ImageNet-normalized NHWC.

    Matches EgoLanesOnnxEngine::preprocessEgoLanes (resize THEN color/scale
    conversions — order matters for exact parity since resize interpolates
    in uint8-derived float space either way).
    """
    x = resize_bilinear(frame_bgr_u8, out_hw)
    x = x[..., ::-1]  # BGR -> RGB
    x = x * (1.0 / 255.0)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)


def letterbox(frame_bgr_u8, out_hw: Tuple[int, int],
              orig_hw: Tuple[int, int], pad_value: int = 114,
              dtype=jnp.float32):
    """AutoSpeed letterbox: scale to fit, center-pad gray-114, RGB, [0,1].

    Static-shape version: `orig_hw` are Python ints (the capture size is
    fixed per pipeline config), so scale/pad are compile-time constants and
    the whole op lowers to one resize + one pad.

    Returns (tensor NHWC, scale, (pad_x, pad_y)) — the transform needed to
    map detections back to original coordinates
    (autospeed/onnxruntime_engine.cpp:209-217).
    """
    th, tw = out_hw
    oh, ow = orig_hw
    scale = min(tw / ow, th / oh)
    nw, nh = int(ow * scale), int(oh * scale)
    pad_x, pad_y = (tw - nw) // 2, (th - nh) // 2

    x = resize_bilinear(frame_bgr_u8, (nh, nw))
    pad_cfg = [(0, 0)] * (x.ndim - 3) + [
        (pad_y, th - nh - pad_y), (pad_x, tw - nw - pad_x), (0, 0)]
    x = jnp.pad(x, pad_cfg, constant_values=float(pad_value))
    x = x[..., ::-1] * (1.0 / 255.0)
    return x.astype(dtype), scale, (pad_x, pad_y)
