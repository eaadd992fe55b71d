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


def _bilinear_matrix(n_in: int, n_out: int, dtype=jnp.float32):
    """(n_out, n_in) interpolation matrix with half-pixel sampling (each row
    has <=2 nonzeros). Built at trace time from static shapes."""
    import numpy as np
    scale = n_in / n_out
    src = (np.arange(n_out) + 0.5) * scale - 0.5
    i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    frac = np.clip(src - np.floor(src), 0.0, 1.0)
    frac = np.where(src < 0, 0.0, frac)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), i0] += 1.0 - frac
    m[np.arange(n_out), i1] += frac
    return jnp.asarray(m, dtype)


def resize_bilinear_mm(img, out_hw: Tuple[int, int], dtype=jnp.float32,
                       precision=None):
    """Bilinear resize expressed as two dense matmuls (rows then cols) —
    guaranteed MXU work on TPU instead of gather lowering. Numerically
    equal to resize_bilinear / cv2 INTER_LINEAR.

    img: (..., H, W, C) -> (..., h, w, C) float.
    """
    h_in, w_in = img.shape[-3], img.shape[-2]
    h, w = out_hw
    Wr = _bilinear_matrix(h_in, h, dtype)   # (h, H)
    Wc = _bilinear_matrix(w_in, w, dtype)   # (w, W)
    x = img.astype(dtype)
    # rows: (..., H, W, C) -> (..., h, W, C)
    x = jnp.einsum("oh,...hwc->...owc", Wr, x, precision=precision)
    # cols: (..., h, W, C) -> (..., h, w, C)
    x = jnp.einsum("pw,...hwc->...hpc", Wc, x, precision=precision)
    return x


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
