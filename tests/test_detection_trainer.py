"""Detection trainer + YOLO data pipeline: batching, augmentation
geometry, and a tiny train run (loss decreases)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.train.yolo_data import (
    DetSample, mosaic4, mixup, random_perspective, pad_targets, YoloBatcher,
)


def make_ds(n=8, hw=(128, 256), seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        k = rng.integers(1, 4)
        x1 = rng.uniform(0, hw[1] - 40, k)
        y1 = rng.uniform(0, hw[0] - 40, k)
        boxes = np.stack([x1, y1, x1 + rng.uniform(10, 40, k),
                          y1 + rng.uniform(10, 40, k)], -1)
        out.append(DetSample(img, boxes, rng.integers(0, 4, k)))
    return out


def test_pad_targets_normalized():
    boxes = np.array([[10.0, 20.0, 50.0, 60.0]])
    b, l, m = pad_targets(boxes, np.array([2]), (100, 200), 8)
    assert m.sum() == 1 and l[0] == 2
    np.testing.assert_allclose(b[0], [30 / 200, 40 / 100, 40 / 200, 40 / 100])
    assert (b[1:] == 0).all()


def test_mosaic_boxes_in_bounds():
    ds = make_ds()
    rng = np.random.default_rng(1)
    s = mosaic4(ds[:4], (128, 256), rng)
    assert s.image.shape == (128, 256, 3)
    if len(s.boxes_xyxy):
        assert (s.boxes_xyxy[:, [0, 2]] <= 256 + 1e-6).all()
        assert (s.boxes_xyxy[:, [1, 3]] <= 128 + 1e-6).all()


def test_batcher_shapes():
    ds = make_ds()
    it = iter(YoloBatcher(ds, input_hw=(128, 256), batch_size=2,
                          max_boxes=16))
    imgs, boxes, labels, mask = next(it)
    assert imgs.shape == (2, 128, 256, 3) and imgs.dtype == np.uint8
    assert boxes.shape == (2, 16, 4) and labels.shape == (2, 16)
    assert mask.dtype == bool
    # normalized coords
    assert (boxes >= 0).all() and (boxes <= 1 + 1e-6).all()


@pytest.mark.slow
def test_detection_trainer_loss_decreases():
    from autoware_vision_pilot_tpu.train.detection_trainer import (
        DetectionTrainer, DetectionTrainerConfig)
    from autoware_vision_pilot_tpu.models.auto_speed import AutoSpeedNetwork

    hw = (128, 256)
    cfg = DetectionTrainerConfig(input_hw=hw, max_boxes=8,
                                 warmup_steps=2, max_steps=30, lr=2e-3)
    model = AutoSpeedNetwork(variant="n", num_classes=4,
                             img_h=hw[0], img_w=hw[1])
    trainer = DetectionTrainer(model, cfg)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, *hw, 3), dtype=np.uint8)
    boxes = np.array([[[0.5, 0.5, 0.3, 0.3]] + [[0, 0, 0, 0]] * 7,
                      [[0.3, 0.4, 0.2, 0.2]] + [[0, 0, 0, 0]] * 7],
                     np.float32)
    labels = np.zeros((2, 8), np.int32)
    mask = np.zeros((2, 8), bool)
    mask[:, 0] = True

    losses = [trainer.fit_step(imgs, boxes, labels, mask)
              for _ in range(12)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_detection_chain_overfits_to_perfect_map():
    """End-to-end proof the detection chain closes: overfitting 4 synthetic
    boxed scenes must reach mAP@50 = 1.0 through the DEPLOYMENT decode +
    fixed-NMS path (batch-statistics forward — BN running averages need
    ~200 extra steps to settle and are certified by the on-chip demo,
    tools/e2e_autospeed_demo.py). Regression for the r5 bug where the
    unramped EMA validated a half-random model and scored ~0 while
    training converged (reference ModelEMA ramp:
    auto_speed_util.py:438-460)."""
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                           / "tools"))
    from e2e_autospeed_demo import make_boxed_scene
    from autoware_vision_pilot_tpu.train.detection_trainer import (
        DetectionTrainer, DetectionTrainerConfig)
    from autoware_vision_pilot_tpu.models.auto_speed import AutoSpeedNetwork
    from autoware_vision_pilot_tpu.train.yolo_data import pad_targets

    hw = (128, 256)
    model = AutoSpeedNetwork(variant="n", num_classes=4,
                             img_h=hw[0], img_w=hw[1])
    cfg = DetectionTrainerConfig(num_classes=4, input_hw=hw, max_boxes=8,
                                 lr=2e-3, warmup_steps=10, max_steps=120,
                                 ema_decay=0.999)
    trainer = DetectionTrainer(model, cfg, seed=0)
    rng = np.random.default_rng(0)
    scenes = [make_boxed_scene(rng, hw) for _ in range(4)]
    imgs = np.stack([s[0] for s in scenes])
    bs, ls, ms = zip(*[pad_targets(s[1], s[2], hw, 8) for s in scenes])
    bs, ls, ms = np.stack(bs), np.stack(ls), np.stack(ms)
    for _ in range(120):
        trainer.fit_step(imgs, bs, ls, ms)

    # deployment decode on the live params with batch statistics: the
    # same 4 training scenes must be recovered perfectly
    import jax
    import jax.numpy as jnp
    from autoware_vision_pilot_tpu.models.auto_speed import make_anchors
    from autoware_vision_pilot_tpu.models.yolo_layers import dfl_decode
    from autoware_vision_pilot_tpu.ops.postprocess import nms_fixed
    from autoware_vision_pilot_tpu.train.metrics import detection_map

    outs, _ = model.apply(
        {"params": trainer.params, "batch_stats": trainer.batch_stats},
        jnp.asarray(imgs, jnp.float32) / 255.0, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(0)})
    B, ch = outs[0].shape[0], 16
    flat = jnp.concatenate([o.reshape(B, -1, o.shape[-1]) for o in outs], 1)
    shapes = [(o.shape[1], o.shape[2]) for o in outs]
    anchors, strides = make_anchors(shapes, (8, 16, 32), flat.dtype)
    d = dfl_decode(flat[..., :4 * ch], ch)
    x1y1 = anchors[None] - d[..., :2]
    x2y2 = anchors[None] + d[..., 2:]
    xywh = jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], -1)
    out = jnp.concatenate(
        [xywh * strides[None], jax.nn.sigmoid(flat[..., 4 * ch:])], -1)

    preds, gts = [], []
    for b in range(out.shape[0]):
        p = out[b]
        boxes = jnp.stack([p[:, 0] - p[:, 2] / 2, p[:, 1] - p[:, 3] / 2,
                           p[:, 0] + p[:, 2] / 2, p[:, 1] + p[:, 3] / 2], -1)
        cls = jnp.argmax(p[:, 4:], -1).astype(jnp.int32)
        sc = jnp.max(p[:, 4:], -1)
        bb, ss, cc, vv = nms_fixed(boxes, sc, cls, max_det=50,
                                   iou_thresh=0.65, conf_thresh=0.1)
        v = np.asarray(vv)
        preds.append((np.asarray(bb)[v], np.asarray(ss)[v],
                      np.asarray(cc)[v]))
        gts.append((scenes[b][1], scenes[b][2]))
    m50, _ = detection_map(preds, gts, 4)
    assert m50 == 1.0, m50
