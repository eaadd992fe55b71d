"""AutoSteer 2.0 + temporal AutoSteer trainers: loss math + tiny runs."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.train.autosteer_trainer import autosteer_loss
from autoware_vision_pilot_tpu.train.autosteer_temporal_trainer import (
    AutoSteerTemporalTrainer, AutoSteerTemporalTrainerConfig,
    angle_to_class, smoothed_ce)


def test_autosteer_loss_masked_l1():
    lane = jnp.full((1, 4, 1, 1), 0.6)
    h_logits = jnp.zeros((1, 4, 1, 1))
    # only 2 of 4 rows valid: masked L1 counts invalid rows as 0 error
    t_h = jnp.asarray([1.0, 1.0, 0.0, 0.0]).reshape(1, 4, 1, 1)
    t_xp = jnp.asarray([0.5, 0.7, 0.0, 0.0]).reshape(1, 4, 1, 1)
    total, parts = autosteer_loss(lane, h_logits, t_xp, t_h, xp_weight=1.0)
    assert abs(float(parts["xp"]) - (0.1 + 0.1) / 4) < 1e-6
    assert abs(float(parts["h_vector"]) - float(np.log(2))) < 1e-6


def test_angle_class_mapping():
    assert int(angle_to_class(jnp.float32(-30))) == 0
    assert int(angle_to_class(jnp.float32(0))) == 30
    assert int(angle_to_class(jnp.float32(30))) == 60
    assert int(angle_to_class(jnp.float32(99))) == 60  # clipped


def test_temporal_trainer_learns():
    tr = AutoSteerTemporalTrainer(
        AutoSteerTemporalTrainerConfig(lr=3e-3, max_steps=100))
    rng = np.random.default_rng(0)
    # synthetic: a lane mask pattern whose x-offset encodes the angle
    B = 8
    masks = np.zeros((B, 80, 160, 6), np.float32)
    angles = rng.integers(-20, 21, B).astype(np.float32)
    for i, a in enumerate(angles):
        col = int(80 + a * 2)
        masks[i, :, col - 2:col + 2, :] = 1.0
    losses = [tr.fit_step(masks, angles, angles) for _ in range(25)]
    assert losses[-1] < losses[0]


def test_vector_ap_formula():
    """Hand-checked against the reference compute_vector_ap
    (auto_steer_util.py:352-399): perfect ranked decisions give AP 1,
    mAP@50 is the t=0.05 entry."""
    from autoware_vision_pilot_tpu.train.metrics import vector_ap
    # 4 lines; at t=0.02 only 2 hit, at 0.05 and 0.10 all hit
    tp = {0.02: [1, 1, 0, 0], 0.05: [1, 1, 1, 1], 0.10: [1, 1, 1, 1]}
    fp = {t: [1 - v for v in tp[t]] for t in tp}
    conf = [0.9, 0.8, 0.7, 0.6]  # hits ranked first at every threshold
    m_pre, m_rec, mean_ap, map50 = vector_ap(tp, fp, conf, 4)

    def hand_ap(rec, pre):
        # the reference formula verbatim (auto_steer_util.py:375-385)
        rec = np.concatenate(([0.0], rec, [1.0]))
        pre = np.concatenate(([0.0], pre, [0.0]))
        pre = np.flip(np.maximum.accumulate(np.flip(pre)))
        grid = np.linspace(0, 1, 101)
        return np.trapz(np.interp(grid, rec, pre), grid)

    # all-hit thresholds: the trailing (r=1, p=0) sentinel costs the last
    # half-trapezoid, so "perfect" is 0.995 — in the reference formula too
    expected_perfect = hand_ap(np.array([0.25, 0.5, 0.75, 1.0]),
                               np.ones(4))
    assert map50 == pytest.approx(expected_perfect, abs=1e-9)
    assert map50 > 0.99
    expected_ap002 = hand_ap(np.array([0.25, 0.5, 0.5, 0.5]),
                             np.array([1.0, 1.0, 2 / 3, 0.5]))
    assert mean_ap == pytest.approx(
        (expected_ap002 + 2 * expected_perfect) / 3, abs=1e-9)
    assert 0 < m_pre <= 1 and 0 < m_rec <= 1


@pytest.mark.slow
def test_autosteer_validate_map_runs():
    """validate_map emits the reference-comparable mAP/mAP@50 metrics
    (AutoSteer/README.md:12-14) on a tiny model + synthetic val set."""
    from autoware_vision_pilot_tpu.train.autosteer_trainer import (
        AutoSteerTrainer, AutoSteerTrainerConfig)
    # W must be >=1024: the height branch compresses W/4 by 16x twice
    # (auto_steer_percept_head.py h1/h2), so smaller widths collapse to 0
    tr = AutoSteerTrainer(AutoSteerTrainerConfig(input_hw=(64, 1024)))
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 64, 1024, 3), np.uint8)
    lane, height = jax.jit(lambda x: tr.model.apply(
        {"params": tr.ema_params, "batch_stats": tr.batch_stats}, x))(
            jnp.asarray(imgs, jnp.float32) / 255.0)
    rows = lane.shape[1]
    # targets == model output -> every line hits at every threshold
    t_h = (1.0 / (1.0 + np.exp(-np.asarray(height))) > 0.5).astype(
        np.float32)
    out = tr.validate_map([(imgs, np.asarray(lane), t_h)])
    # 0.995 is "perfect" under the reference formula (trailing sentinel)
    assert out["map50"] == pytest.approx(0.995, abs=1e-6)
    assert out["map"] == pytest.approx(0.995, abs=1e-6)
    # validate() emits the same mAP alongside MAE/precision/recall
    # (single forward pass; VERDICT r2 #8 done-criterion)
    full = tr.validate([(imgs, np.asarray(lane), t_h)])
    assert full["map50"] == pytest.approx(out["map50"], abs=1e-9)
    assert full["map"] == pytest.approx(out["map"], abs=1e-9)
    assert full["xp_mae"] < 1e-6 and full["h_precision"] == 1.0
    # corrupted targets -> mAP drops
    bad = tr.validate_map(
        [(imgs, np.asarray(lane) + 0.5, 1.0 - t_h)])
    assert bad["map"] < 0.5
