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
