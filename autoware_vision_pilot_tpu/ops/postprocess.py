"""On-device post-processing: argmax/colormap masks, channel thresholds,
depth scaling, and a fixed-size masked NMS that stays jittable.

Replaces the reference's CPU loops (EgoLanes threshold loops
onnxruntime_engine.cpp:151-192), the HIP/CUDA argmax kernel
(middleware_recipes/common/visualizers/masks_viz.hip.cpp:11-40), and the
host-side YOLO decode + greedy class-aware NMS
(autospeed/onnxruntime_engine.cpp:170-286).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def argmax_mask(logits_nhwc):
    """(B,H,W,C) logits -> (B,H,W) int32 class ids."""
    return jnp.argmax(logits_nhwc, axis=-1).astype(jnp.int32)


def colorize_mask(mask, palette):
    """(B,H,W) ids + (C,3) uint8 palette -> (B,H,W,3) uint8 color image."""
    palette = jnp.asarray(palette, dtype=jnp.uint8)
    return palette[mask]


def blend_overlay(image_u8, color_u8, alpha: float = 0.5):
    """50/50 overlay like masks_visualization_engine.cpp:28-30."""
    out = image_u8.astype(jnp.float32) * (1 - alpha) + \
        color_u8.astype(jnp.float32) * alpha
    return out.astype(jnp.uint8)


def threshold_channels(logits_nhwc, threshold: float = 0.0):
    """EgoLanes per-channel binary masks (value > thr -> 1.0)."""
    return (logits_nhwc > threshold).astype(jnp.float32)


def depth_minmax_scale(depth_nhw1):
    """Scale relative depth to [0,1] per frame (visualization contract)."""
    lo = jnp.min(depth_nhw1, axis=(-3, -2, -1), keepdims=True)
    hi = jnp.max(depth_nhw1, axis=(-3, -2, -1), keepdims=True)
    return (depth_nhw1 - lo) / jnp.maximum(hi - lo, 1e-9)


@partial(jax.jit, static_argnames=("max_det", "iou_thresh", "conf_thresh",
                                   "class_aware"))
def nms_fixed(boxes_xyxy, scores, class_ids, *, max_det: int = 64,
              iou_thresh: float = 0.45, conf_thresh: float = 0.25,
              class_aware: bool = True):
    """Greedy NMS with static shapes (TPU-jittable).

    Semantically equivalent to the reference's applyNMS
    (autospeed/onnxruntime_engine.cpp:258-286): sort by confidence, greedily
    keep, suppress same-class boxes with IoU > thresh. Data-dependent output
    length becomes a fixed (max_det,) result with a validity mask.

    boxes_xyxy: (A, 4); scores: (A,); class_ids: (A,) int32.
    Returns (boxes (max_det,4), scores (max_det,), classes (max_det,),
    valid (max_det,) bool).
    """
    A = scores.shape[0]
    neg = jnp.asarray(-1.0, scores.dtype)
    scores = jnp.where(scores >= conf_thresh, scores, neg)

    # Select the top max_det candidates by score — NMS never keeps more.
    k = min(max_det * 4, A)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes_xyxy[top_idx]
    top_cls = class_ids[top_idx]

    x1, y1, x2, y2 = (top_boxes[:, i] for i in range(4))
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)

    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    same_cls = (top_cls[:, None] == top_cls[None, :]) if class_aware else True
    suppress_mat = (iou > iou_thresh) & same_cls  # row suppresses col

    def body(i, alive):
        # candidates are score-sorted, so row i is the current best if alive
        row_alive = alive[i]
        kill = suppress_mat[i] & row_alive
        kill = kill.at[i].set(False)
        return alive & ~kill

    alive = jnp.full((k,), True)
    alive &= top_scores >= conf_thresh
    alive = jax.lax.fori_loop(0, k, body, alive)

    # compact kept detections to the front (stable by score order)
    keep_rank = jnp.cumsum(alive) - 1
    out_boxes = jnp.zeros((max_det, 4), top_boxes.dtype)
    out_scores = jnp.zeros((max_det,), top_scores.dtype)
    out_cls = jnp.zeros((max_det,), top_cls.dtype)
    valid = jnp.zeros((max_det,), bool)

    dst = jnp.where(alive & (keep_rank < max_det), keep_rank, max_det)
    out_boxes = out_boxes.at[dst].set(top_boxes, mode="drop")
    out_scores = out_scores.at[dst].set(top_scores, mode="drop")
    out_cls = out_cls.at[dst].set(top_cls, mode="drop")
    valid = valid.at[dst].set(alive, mode="drop")
    return out_boxes, out_scores, out_cls, valid


def decode_yolo_to_original(pred_a4nc, scale: float,
                            pad_xy: Tuple[int, int],
                            orig_hw: Tuple[int, int]):
    """(A, 4+nc) decoded head output (xywh letterbox px + class scores) ->
    (boxes_xyxy in original-image px clamped, best score, best class).

    Mirrors autospeed/onnxruntime_engine.cpp:183-232.
    """
    xywh, cls = pred_a4nc[:, :4], pred_a4nc[:, 4:]
    cx, cy, w, h = xywh[:, 0], xywh[:, 1], xywh[:, 2], xywh[:, 3]
    x1 = (cx - w / 2 - pad_xy[0]) / scale
    y1 = (cy - h / 2 - pad_xy[1]) / scale
    x2 = (cx + w / 2 - pad_xy[0]) / scale
    y2 = (cy + h / 2 - pad_xy[1]) / scale
    oh, ow = orig_hw
    boxes = jnp.stack([x1.clip(0, ow), y1.clip(0, oh),
                       x2.clip(0, ow), y2.clip(0, oh)], axis=-1)
    best = jnp.argmax(cls, axis=-1).astype(jnp.int32)
    score = jnp.max(cls, axis=-1)
    return boxes, score, best
