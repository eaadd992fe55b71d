"""Detection training loss: task-aligned assignment + CIoU + DFL + BCE.

Rebuild of Models/training/auto_speed_util.py (Assigner :482, ComputeLoss
:670, BoxLoss+DFL :637, compute_iou CIoU :303) with static shapes
throughout — ground-truth boxes arrive padded to MAX_BOXES with a validity
mask, every data-dependent select becomes a masked reduction, so the whole
loss jits and shards (the torch original is full of boolean indexing that
would break tracing).

Loss gains follow the reference's params: box/cls/dfl weights.
"""
from __future__ import annotations

import math
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..models.auto_speed import make_anchors
from ..models.yolo_layers import dfl_decode


def ciou(box1, box2, eps: float = 1e-7):
    """Complete IoU of aligned box pairs (..., 4) xyxy (compute_iou :303)."""
    b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, -1)
    b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, -1)
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    inter = (jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1)).clip(0) * \
            (jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1)).clip(0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 +
            (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    return iou - (rho2 / c2 + v * alpha)


def plain_iou_pairs(gt, pd, eps=1e-7):
    """Plain IoU used by the assigner's overlap metric."""
    x1 = jnp.maximum(gt[..., 0], pd[..., 0])
    y1 = jnp.maximum(gt[..., 1], pd[..., 1])
    x2 = jnp.minimum(gt[..., 2], pd[..., 2])
    y2 = jnp.minimum(gt[..., 3], pd[..., 3])
    inter = (x2 - x1).clip(0) * (y2 - y1).clip(0)
    a1 = (gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1] + eps)
    a2 = (pd[..., 2] - pd[..., 0]) * (pd[..., 3] - pd[..., 1] + eps)
    return inter / (a1 + a2 - inter + eps)


def task_aligned_assign(pd_scores, pd_bboxes, anc_points, gt_labels,
                        gt_bboxes, mask_gt, *, nc: int, top_k: int = 10,
                        alpha: float = 0.5, beta: float = 6.0,
                        eps: float = 1e-9):
    """Static-shape task-aligned assigner (Assigner :482-575).

    pd_scores (B,A,nc) sigmoid; pd_bboxes (B,A,4) xyxy (stride-scaled);
    anc_points (A,2); gt_labels (B,M) int; gt_bboxes (B,M,4) xyxy;
    mask_gt (B,M) bool.
    Returns target_bboxes (B,A,4), target_scores (B,A,nc), fg_mask (B,A).
    """
    B, A, _ = pd_scores.shape
    M = gt_bboxes.shape[1]

    # anchor inside gt: (B, M, A)
    lt = gt_bboxes[:, :, None, :2]
    rb = gt_bboxes[:, :, None, 2:]
    deltas = jnp.concatenate([anc_points[None, None] - lt,
                              rb - anc_points[None, None]], -1)
    mask_in_gts = jnp.min(deltas, -1) > eps
    gt_mask = mask_in_gts & mask_gt[..., None]

    # alignment metric
    cls_scores = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1),                 # (B, nc, A)
        gt_labels.clip(0)[:, :, None], axis=1)        # (B, M, A)
    bbox_scores = jnp.where(gt_mask, cls_scores, 0.0)
    overlaps = jnp.where(
        gt_mask,
        plain_iou_pairs(gt_bboxes[:, :, None, :], pd_bboxes[:, None]),
        0.0).clip(0)
    align = bbox_scores ** alpha * overlaps ** beta

    # top-k anchors per gt
    k = min(top_k, A)
    topv, topi = jax.lax.top_k(align, k)              # (B, M, k)
    valid_k = mask_gt[..., None] & (topv > eps)
    onehot = jax.nn.one_hot(topi, A, dtype=jnp.int32) * \
        valid_k.astype(jnp.int32)[..., None]
    mask_top_k = onehot.sum(2)                         # (B, M, A) counts
    mask_top_k = jnp.where(mask_top_k > 1, 0, mask_top_k)
    mask_pos = mask_top_k.astype(align.dtype) * mask_in_gts * \
        mask_gt[..., None]

    # resolve anchors claimed by multiple gts: keep max-overlap gt
    fg_counts = mask_pos.sum(1)                        # (B, A)
    multi = fg_counts > 1
    max_idx = jnp.argmax(overlaps, axis=1)             # (B, A)
    is_max = jax.nn.one_hot(max_idx, M, axis=1, dtype=align.dtype)
    mask_pos = jnp.where(multi[:, None, :], is_max, mask_pos)
    fg_mask = mask_pos.sum(1) > 0                      # (B, A)

    target_gt_idx = jnp.argmax(mask_pos, axis=1)       # (B, A)
    tb = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], 1)
    tl = jnp.take_along_axis(gt_labels.clip(0), target_gt_idx, 1)
    target_scores = jax.nn.one_hot(tl, nc, dtype=align.dtype)
    target_scores = jnp.where(fg_mask[..., None], target_scores, 0.0)

    # normalize by per-gt best alignment (soft targets)
    align_pos = align * mask_pos
    pos_align = jnp.max(align_pos, -1, keepdims=True)
    pos_overlap = jnp.max(overlaps * mask_pos, -1, keepdims=True)
    norm = jnp.max(align_pos * pos_overlap / (pos_align + eps), axis=1)
    target_scores = target_scores * norm[..., None]

    return tb, target_scores, fg_mask


def df_loss(pred_dist, target, reg_max: int):
    """Distribution focal loss: CE between the two integer bins bracketing
    the continuous target (BoxLoss.df_loss :637)."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, -1)  # (..., 4, reg_max+1)
    left = -jnp.take_along_axis(logp, tl[..., None], -1)[..., 0]
    right = -jnp.take_along_axis(logp, tr.clip(0, reg_max)[..., None],
                                 -1)[..., 0]
    return (left * wl + right * wr).mean(-1)


def detection_loss(outputs: Sequence[jax.Array], gt_boxes_xywh, gt_labels,
                   gt_mask, *, nc: int = 4, reg_max: int = 16,
                   strides: Sequence[int] = (8, 16, 32),
                   gains: Dict[str, float] = None):
    """ComputeLoss (:670-768), static shapes.

    outputs: per-level NHWC raw head maps (B, H, W, 4*reg_max + nc)
             (the train-mode output of AutoSpeedHead).
    gt_boxes_xywh: (B, M, 4) normalized cx,cy,w,h in [0,1]; gt_labels
    (B, M) int; gt_mask (B, M) bool.
    Returns (total, dict of box/cls/dfl).
    """
    gains = gains or {"box": 7.5, "cls": 0.5, "dfl": 1.5}
    B = outputs[0].shape[0]
    no = 4 * reg_max + nc
    flat = jnp.concatenate(
        [o.reshape(B, -1, no) for o in outputs], 1)     # (B, A, no)
    pred_distri = flat[..., :4 * reg_max]
    pred_scores = flat[..., 4 * reg_max:]

    shapes = [(o.shape[1], o.shape[2]) for o in outputs]
    anc, strd = make_anchors(shapes, strides, flat.dtype)
    input_h = outputs[0].shape[1] * strides[0]
    input_w = outputs[0].shape[2] * strides[0]

    # gt xywh (normalized) -> xyxy pixels
    scale = jnp.array([input_w, input_h, input_w, input_h], flat.dtype)
    g = gt_boxes_xywh * scale
    gt_xyxy = jnp.stack([g[..., 0] - g[..., 2] / 2, g[..., 1] - g[..., 3] / 2,
                         g[..., 0] + g[..., 2] / 2, g[..., 1] + g[..., 3] / 2],
                        -1)
    gt_xyxy = jnp.where(gt_mask[..., None], gt_xyxy, 0.0)

    # decoded boxes in anchor units
    d = dfl_decode(pred_distri, reg_max)
    pd_xyxy = jnp.concatenate([anc[None] - d[..., :2],
                               anc[None] + d[..., 2:]], -1)

    tb, ts, fg = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pd_xyxy * strd[None]),
        anc * strd, gt_labels, gt_xyxy, gt_mask, nc=nc)

    ts_sum = jnp.maximum(ts.sum(), 1.0)

    # cls BCE
    bce = (jnp.maximum(pred_scores, 0) - pred_scores * ts +
           jnp.log1p(jnp.exp(-jnp.abs(pred_scores))))
    loss_cls = bce.sum() / ts_sum

    # box CIoU + DFL on foreground anchors (masked)
    tb_anchor = tb / strd[None]
    weight = ts.sum(-1) * fg                             # (B, A)
    iou = ciou(pd_xyxy, tb_anchor)[..., 0]
    loss_box = ((1.0 - iou) * weight).sum() / ts_sum

    lt_t = jnp.concatenate([anc[None] - tb_anchor[..., :2],
                            tb_anchor[..., 2:] - anc[None]], -1)
    lt_t = lt_t.clip(0, reg_max - 1 - 0.01)
    dist = pred_distri.reshape(B, -1, 4, reg_max)
    dfl = df_loss(dist, lt_t, reg_max - 1)               # (B, A)
    loss_dfl = (dfl * weight).sum() / ts_sum

    total = (gains["box"] * loss_box + gains["cls"] * loss_cls +
             gains["dfl"] * loss_dfl)
    return total, {"box": loss_box, "cls": loss_cls, "dfl": loss_dfl}
