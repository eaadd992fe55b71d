"""Training losses for the model zoo, matching the reference semantics.

- segmentation_ce_loss: class-weighted cross-entropy
  (Models/training/scene_seg_trainer.py:128-131).
- ssi_mae_depth_loss: scale-shift-invariant normalization + 90th-quantile
  robust mAE + multi-scale Sobel edge loss
  (scene_3d_trainer.py:151-196; the quantile-masked mean becomes a masked
  mean — identical value, static shape).
- lanes_bce_edge_loss: per-channel BCE + multi-scale edge consistency
  (ego_lanes_trainer.py:268-542 / data_utils/lite_models/helpers/loss.py).
- binary_seg_loss: BCE-with-logits for DomainSeg.

All take NHWC logits/targets and reduce to scalars; everything is jittable
and grad-able.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

SOBEL_GX = jnp.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]])
SOBEL_GY = jnp.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]])


def segmentation_ce_loss(logits, target_onehot_or_ids, class_weights=None):
    """Cross-entropy over class channel. logits (B,H,W,C); target either
    (B,H,W) int ids or (B,H,W,C) one-hot/soft (torch CrossEntropyLoss
    supports both; the reference feeds soft one-hot GT)."""
    C = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    if target_onehot_or_ids.ndim == logits.ndim - 1:
        tgt = jax.nn.one_hot(target_onehot_or_ids, C, dtype=logits.dtype)
    else:
        tgt = target_onehot_or_ids
    if class_weights is None:
        class_weights = jnp.ones((C,), logits.dtype)
    w = jnp.asarray(class_weights, logits.dtype)
    # torch weighted CE: sum(w_y * nll) / sum(w_y)
    nll = -(tgt * logp)
    wsum = jnp.sum(tgt * w, axis=-1)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(wsum), 1e-12)


def binary_seg_loss(logits, target):
    """BCE with logits (DomainSeg binary roadwork head)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target +
        jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _ssi_norm(x):
    """(x - min) / (max - mean) — reference get_ssi_nom_tensor."""
    return (x - jnp.min(x)) / (jnp.max(x) - jnp.mean(x))


def _sobel(x_nhwc):
    k = jnp.stack([SOBEL_GX, SOBEL_GY], -1)[:, :, None, :]  # (3,3,1,2)
    return lax.conv_general_dilated(
        x_nhwc, k.astype(x_nhwc.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def edge_loss(pred_nhw1, gt_nhw1):
    gp = _sobel(pred_nhw1)
    gg = _sobel(gt_nhw1)
    return jnp.mean(jnp.abs(gp[..., 0] - gg[..., 0]) +
                    jnp.abs(gp[..., 1] - gg[..., 1]))


def _avgpool2(x):
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                             "VALID") / 4.0


def multi_scale_edge_loss(pred, gt, scales: int = 4):
    total = 0.0
    p, g = pred, gt
    for i in range(scales):
        total = total + edge_loss(p, g)
        if i < scales - 1:
            p, g = _avgpool2(p), _avgpool2(g)
    return total / scales


def robust_mae(pred, gt, quantile: float = 0.9):
    """Mean of |err| below its q-th quantile (static-shape masked mean)."""
    err = jnp.abs(pred - gt)
    q = jnp.quantile(err, quantile)
    mask = err < q
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1)


def ssi_mae_depth_loss(pred_nhw1, gt_nhw1, edge_scale: float = 1.0):
    """Scene3D total loss: robust SSI-mAE + edge_scale * multi-scale edges.
    Returns (total, mae, edge)."""
    p = _ssi_norm(pred_nhw1)
    g = _ssi_norm(gt_nhw1)
    mae = robust_mae(p, g)
    e = multi_scale_edge_loss(p, g)
    return mae + edge_scale * e, mae, e


def lanes_bce_edge_loss(logits_nhwc, target_nhwc, bce_weight: float = 1.0,
                        edge_weight: float = 1.0):
    """EgoLanes: per-channel BCE + multi-scale edge consistency on the
    sigmoid probabilities. Returns (total, bce, edge)."""
    bce = jnp.mean(
        jnp.maximum(logits_nhwc, 0) - logits_nhwc * target_nhwc +
        jnp.log1p(jnp.exp(-jnp.abs(logits_nhwc))))
    prob = jax.nn.sigmoid(logits_nhwc)
    e = 0.0
    for c in range(logits_nhwc.shape[-1]):
        e = e + multi_scale_edge_loss(prob[..., c:c + 1],
                                      target_nhwc[..., c:c + 1])
    e = e / logits_nhwc.shape[-1]
    return bce_weight * bce + edge_weight * e, bce, e
