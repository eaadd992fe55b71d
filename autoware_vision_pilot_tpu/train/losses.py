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


# ---- EgoLanes BEV / reprojected loss family --------------------------------
# Vectorized rebuilds of the reference's per-point loops
# (Models/training/ego_lanes_trainer.py:268-578). BEV lane/path elements
# are (2, N) tensors [x_vals; y_vals] in normalized BEV coordinates; the
# homography maps BEV pixels -> perspective image pixels.

def weighted_egolanes_loss(logits_nhwc, target_nhwc):
    """Per-channel BCE + multi-scale edge with the reference's channel
    weighting: 2*ego-left + 2*ego-right + 1*other
    (ego_lanes_trainer.py:280-304). Returns (total, per_channel)."""
    weights = (2.0, 2.0, 1.0)
    prob = jax.nn.sigmoid(logits_nhwc)
    per_channel = []
    total = 0.0
    for c, w in enumerate(weights):
        lg = logits_nhwc[..., c]
        tg = target_nhwc[..., c]
        bce = jnp.mean(jnp.maximum(lg, 0) - lg * tg +
                       jnp.log1p(jnp.exp(-jnp.abs(lg))))
        e = multi_scale_edge_loss(prob[..., c:c + 1],
                                  target_nhwc[..., c:c + 1])
        ch_loss = bce + e
        per_channel.append(ch_loss)
        total = total + w * ch_loss
    return total, per_channel


def bev_data_loss(gt_x, pred_x):
    """Mean absolute error over BEV x-values
    (calc_BEV_data_loss, ego_lanes_trainer.py:446-459)."""
    return jnp.mean(jnp.abs(gt_x - pred_x))


def bev_gradient_loss(gt_x, pred_x):
    """Finite-difference gradient MAE; the reference divides the (N-1)-term
    sum by N (calc_BEV_graient_loss, :463-481)."""
    d = jnp.abs(jnp.diff(gt_x) - jnp.diff(pred_x))
    return jnp.sum(d) / gt_x.shape[-1]


def project_bev_to_image(bev_x, bev_y, homography, bev_wh, perspective_wh):
    """Normalized BEV points -> normalized perspective-image points through
    the 3x3 BEV->image homography (projectBEVtoImage, :554-578):
    pixel coords are recovered by scaling with the BEV grid size before the
    homogeneous transform, then normalized by the perspective size."""
    bw, bh = bev_wh
    pw, ph = perspective_wh
    H = homography
    px = bw * bev_x
    py = bh * bev_y
    hx = px * H[0, 0] + py * H[0, 1] + H[0, 2]
    hy = px * H[1, 0] + py * H[1, 1] + H[1, 2]
    hs = px * H[2, 0] + py * H[2, 1] + H[2, 2]
    return jnp.stack([hx / hs / pw, hy / hs / ph], axis=0)   # (2, N)


def reprojected_data_loss(gt_reproj_xy, gt_y, pred_x, homography,
                          bev_wh, perspective_wh):
    """L1 between GT reprojected points and the prediction's BEV x-values
    (at the GT y-samples) pushed through the same homography
    (calc_reprojected_data_loss, :485-512)."""
    pred_xy = project_bev_to_image(pred_x, gt_y, homography, bev_wh,
                                   perspective_wh)
    err = jnp.abs(gt_reproj_xy[0] - pred_xy[0]) + \
        jnp.abs(gt_reproj_xy[1] - pred_xy[1])
    return jnp.mean(err)


def reprojected_gradient_loss(gt_reproj_xy, gt_y, pred_x, homography,
                              bev_wh, perspective_wh):
    """Finite-difference gradient error on the reprojected x-coordinates
    (calc_reprojected_gradient_loss, :516-541); (N-1)-sum / N."""
    pred_xy = project_bev_to_image(pred_x, gt_y, homography, bev_wh,
                                   perspective_wh)
    d = jnp.abs(jnp.diff(gt_reproj_xy[0]) - jnp.diff(pred_xy[0]))
    return jnp.sum(d) / gt_y.shape[-1]


def corridor_bev_losses(gt_elems, pred_elems, gt_reproj=None,
                        homography=None, bev_wh=(640, 640),
                        perspective_wh=(640, 320)):
    """Driving-corridor aggregate over (path, ego-left, ego-right):
    averaged BEV data + gradient losses, plus reprojected data/gradient
    when the homography and GT reprojections are given
    (calc_*_driving_corridor, :362-441). gt_elems/pred_elems:
    dicts name -> (2, N) gt / (N,) pred-x. Returns dict of scalars."""
    names = tuple(gt_elems.keys())
    out = {}
    data = grad = 0.0
    for n in names:
        data = data + bev_data_loss(gt_elems[n][0], pred_elems[n])
        grad = grad + bev_gradient_loss(gt_elems[n][0], pred_elems[n])
    out["bev_data"] = data / len(names)
    out["bev_gradient"] = grad / len(names)
    if gt_reproj is not None and homography is not None:
        rd = rg = 0.0
        for n in names:
            rd = rd + reprojected_data_loss(
                gt_reproj[n], gt_elems[n][1], pred_elems[n], homography,
                bev_wh, perspective_wh)
            rg = rg + reprojected_gradient_loss(
                gt_reproj[n], gt_elems[n][1], pred_elems[n], homography,
                bev_wh, perspective_wh)
        out["reproj_data"] = rd / len(names)
        out["reproj_gradient"] = rg / len(names)
    return out


def data_and_denoising_loss(pred_data, gt_data, pred_noisy_data=None):
    """L1 data loss + optional denoising consistency L1 between clean and
    noisy-input predictions (calc_data_loss/calc_denoising_loss,
    :268-277). Returns (data, denoising)."""
    data = jnp.mean(jnp.abs(pred_data - gt_data))
    den = jnp.mean(jnp.abs(pred_data - pred_noisy_data)) \
        if pred_noisy_data is not None else jnp.float32(0.0)
    return data, den
