"""Detection loss: CIoU vs torch reference formula, assigner sanity,
loss finiteness and trainability."""
import math
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.train.detection_loss import (
    ciou, task_aligned_assign, detection_loss, df_loss,
)


def torch_ciou(box1, box2, eps=1e-7):
    b1_x1, b1_y1, b1_x2, b1_y2 = box1.chunk(4, -1)
    b2_x1, b2_y1, b2_x2, b2_y2 = box2.chunk(4, -1)
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    inter = (b1_x2.minimum(b2_x2) - b1_x1.maximum(b2_x1)).clamp(0) * \
            (b1_y2.minimum(b2_y2) - b1_y1.maximum(b2_y1)).clamp(0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = b1_x2.maximum(b2_x2) - b1_x1.minimum(b2_x1)
    ch = b1_y2.maximum(b2_y2) - b1_y1.minimum(b2_y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 +
            (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
    v = (4 / math.pi ** 2) * \
        (torch.atan(w2 / h2) - torch.atan(w1 / h1)).pow(2)
    alpha = v / (v - iou + (1 + eps))
    return iou - (rho2 / c2 + v * alpha)


def test_ciou_matches_reference():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 100, (32, 4)).astype(np.float32)
    b = rng.uniform(0, 100, (32, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:] - a[:, :2])
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:] - b[:, :2])
    ours = np.asarray(ciou(jnp.asarray(a), jnp.asarray(b)))[:, 0]
    ref = torch_ciou(torch.tensor(a), torch.tensor(b)).numpy()[:, 0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_assigner_assigns_inside_anchors():
    B, A, M, nc = 1, 64, 4, 4
    # anchors on an 8x8 grid (stride 1)
    gy, gx = jnp.meshgrid(jnp.arange(8) + 0.5, jnp.arange(8) + 0.5,
                          indexing="ij")
    anc = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)
    # one gt box covering the top-left quadrant
    gt_boxes = jnp.zeros((B, M, 4)).at[0, 0].set(jnp.array([0., 0., 4., 4.]))
    gt_labels = jnp.zeros((B, M), jnp.int32)
    gt_mask = jnp.zeros((B, M), bool).at[0, 0].set(True)
    # predictions: uniform scores, boxes = anchor-centered unit boxes
    scores = jnp.full((B, A, nc), 0.5)
    pd = jnp.concatenate([anc - 0.5, anc + 0.5], -1)[None]

    tb, ts, fg = task_aligned_assign(scores, pd, anc, gt_labels, gt_boxes,
                                     gt_mask, nc=nc)
    fg = np.asarray(fg)[0]
    # all assigned anchors lie inside the gt box
    anc_np = np.asarray(anc)
    assert fg.sum() > 0
    assert all(anc_np[i, 0] < 4 and anc_np[i, 1] < 4
               for i in np.where(fg)[0])
    # assigned target box is the gt
    np.testing.assert_allclose(np.asarray(tb)[0][fg][0], [0, 0, 4, 4])


@pytest.mark.heavy
def test_detection_loss_finite_and_trains():
    rng = jax.random.key(0)
    B, nc, reg_max = 2, 4, 16
    shapes = [(8, 16), (4, 8), (2, 4)]
    no = 4 * reg_max + nc
    k1, k2 = jax.random.split(rng)
    outputs = [jax.random.normal(k1, (B, h, w, no)) * 0.1
               for (h, w) in shapes]
    gt_boxes = jnp.asarray([[[0.5, 0.5, 0.25, 0.25], [0, 0, 0, 0]],
                            [[0.3, 0.6, 0.2, 0.3], [0.7, 0.2, 0.1, 0.1]]])
    gt_labels = jnp.asarray([[1, 0], [2, 3]], jnp.int32)
    gt_mask = jnp.asarray([[True, False], [True, True]])

    total, parts = detection_loss(outputs, gt_boxes, gt_labels, gt_mask,
                                  nc=nc, reg_max=reg_max)
    assert np.isfinite(float(total))
    assert all(np.isfinite(float(v)) for v in parts.values())

    # gradient descent on the raw maps reduces the loss
    def loss_of(outs):
        t, _ = detection_loss(outs, gt_boxes, gt_labels, gt_mask,
                              nc=nc, reg_max=reg_max)
        return t

    g = jax.grad(lambda o: loss_of(o))(outputs)
    outs2 = [o - 0.5 * gi for o, gi in zip(outputs, g)]
    assert float(loss_of(outs2)) < float(total)


@pytest.mark.heavy
def test_detection_loss_no_gt():
    B, nc, reg_max = 1, 4, 16
    shapes = [(4, 8)]
    outputs = [jnp.zeros((B, h, w, 4 * reg_max + nc)) for (h, w) in shapes]
    gt_boxes = jnp.zeros((B, 2, 4))
    gt_labels = jnp.zeros((B, 2), jnp.int32)
    gt_mask = jnp.zeros((B, 2), bool)
    total, parts = detection_loss(outputs, gt_boxes, gt_labels, gt_mask,
                                  nc=nc, reg_max=reg_max,
                                  strides=(8,))
    assert np.isfinite(float(total))
    assert float(parts["box"]) == 0.0  # no foreground


def test_df_loss_zero_at_exact_bin():
    # prediction perfectly concentrated at the target bin -> near-zero loss
    reg_max = 16
    target = jnp.full((1, 1, 4), 5.0)
    logits = jnp.full((1, 1, 4, reg_max), -20.0).at[..., 5].set(20.0)
    l = df_loss(logits, target, reg_max - 1)
    assert float(jnp.squeeze(l)) < 1e-3
