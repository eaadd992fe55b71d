"""Preprocess parity vs OpenCV; NMS parity vs a straight-line numpy port of
the reference's greedy class-aware NMS semantics."""
import numpy as np
import cv2
import jax.numpy as jnp

from autoware_vision_pilot_tpu.ops.preprocess import (
    preprocess_imagenet, letterbox, resize_bilinear, IMAGENET_MEAN,
    IMAGENET_STD,
)
from autoware_vision_pilot_tpu.ops.postprocess import (
    nms_fixed, threshold_channels, argmax_mask, depth_minmax_scale,
)


def test_resize_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (320, 640)))
    ref = cv2.resize(img.astype(np.float32), (640, 320),
                     interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_preprocess_imagenet_matches_reference_chain():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (480, 800, 3), dtype=np.uint8)
    ours = np.asarray(preprocess_imagenet(jnp.asarray(img), (320, 640)))

    resized = cv2.resize(img, (640, 320), interpolation=cv2.INTER_LINEAR)
    rgb = cv2.cvtColor(resized, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    ref = (rgb - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    # uint8 vs float interpolation rounding differs by <1/255 per pixel
    np.testing.assert_allclose(ours, ref, atol=2e-2)


def test_letterbox_geometry():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8)
    out, scale, (px, py) = letterbox(jnp.asarray(img), (640, 640), (720, 1280))
    assert out.shape == (640, 640, 3)
    assert abs(scale - 0.5) < 1e-9 and px == 0 and py == 140
    pad = np.asarray(out[:140])
    np.testing.assert_allclose(pad, 114 / 255.0, atol=1e-6)


def _numpy_nms(boxes, scores, cls, iou_t, conf_t):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i] or scores[i] < conf_t:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j] or cls[j] != cls[i]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            u = a + b - inter
            if u > 0 and inter / u > iou_t:
                suppressed[j] = True
    return keep


def test_nms_matches_greedy_reference():
    rng = np.random.default_rng(3)
    A = 200
    cx, cy = rng.uniform(50, 590, A), rng.uniform(50, 590, A)
    w, h = rng.uniform(10, 120, A), rng.uniform(10, 120, A)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    scores = rng.uniform(0, 1, A).astype(np.float32)
    cls = rng.integers(0, 4, A).astype(np.int32)

    ob, os_, oc, valid = nms_fixed(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores),
        jnp.asarray(cls), max_det=64, iou_thresh=0.45, conf_thresh=0.25)
    got = [(tuple(round(float(x), 2) for x in b), round(float(s), 5), int(c))
           for b, s, c, v in zip(np.asarray(ob), np.asarray(os_),
                                 np.asarray(oc), np.asarray(valid)) if v]

    keep = _numpy_nms(boxes, scores, cls, 0.45, 0.25)
    want = [(tuple(round(float(x), 2) for x in boxes[i]),
             round(float(np.float32(scores[i])), 5), int(cls[i]))
            for i in keep][:64]
    assert got == want


def test_threshold_argmax_depth():
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 8, 8, 3)),
                    jnp.float32)
    t = threshold_channels(x, 0.0)
    assert set(np.unique(np.asarray(t))) <= {0.0, 1.0}
    m = argmax_mask(x)
    assert m.shape == (1, 8, 8)
    d = depth_minmax_scale(x[..., :1])
    assert float(jnp.min(d)) == 0.0 and abs(float(jnp.max(d)) - 1.0) < 1e-6


def test_solve3x3_matches_linalg():
    """Cramer-rule 3x3 solve (exported-program portable: no LAPACK
    custom call) must match jnp.linalg.solve on well-conditioned
    normal-equation systems."""
    import numpy as np
    import jax.numpy as jnp
    from autoware_vision_pilot_tpu.ops.smallsolve import solve3x3
    rng = np.random.default_rng(0)
    for _ in range(50):
        A = rng.normal(size=(3, 3)).astype(np.float32)
        A = A @ A.T + 0.1 * np.eye(3, dtype=np.float32)  # SPD + ridge
        b = rng.normal(size=(3,)).astype(np.float32)
        got = np.asarray(solve3x3(jnp.asarray(A), jnp.asarray(b)))
        want = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
