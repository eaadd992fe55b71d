"""Behavioral tests: LaneTracker, PathFinder Bayes filter, tracking
(Kalman + association + CIPO), and the control stack."""
import math
import numpy as np
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.perception.lane_tracker import (
    LaneTrackerState, lane_tracker_update, warp_points, H_ORIG_TO_BEV,
    H_BEV_TO_ORIG, bev_pixels_to_meters, upscale_coeffs,
)
from autoware_vision_pilot_tpu.perception.path_finder import (
    BayesState, path_finder_update, bayes_update, bayes_predict,
    fit_quad_poly, STATE_DIM,
)
from autoware_vision_pilot_tpu.perception.tracking import (
    ObjectFinder, KalmanFilter1D, matching_score, iou,
)
from autoware_vision_pilot_tpu.control import (
    SteeringController, SteeringFilter, SpeedPlanner, PIController,
)


# ---------- LaneTracker ----------

def quad6(a, b, c, ymin, ymax):
    return jnp.asarray([0.0, a, b, c, ymin, ymax], jnp.float32)


def test_homography_roundtrip():
    pts = jnp.asarray([[320.0, 500.0], [100.0, 620.0], [550.0, 400.0]])
    bev = warp_points(pts, H_ORIG_TO_BEV)
    back = warp_points(bev, H_BEV_TO_ORIG)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                               atol=1e-2, rtol=1e-4)


def test_lane_tracker_both_lanes():
    st = LaneTrackerState.init()
    left = quad6(0.0, -0.1, 50.0, 40.0, 79.0)
    right = quad6(0.0, 0.15, 100.0, 40.0, 79.0)
    out, st = lane_tracker_update(left, jnp.asarray(True), right,
                                  jnp.asarray(True), st)
    assert bool(out.path_valid)
    assert bool(st.has_width_history)
    assert float(st.bev_width) > 0
    # center coeffs are the mean of left/right (lane_tracking.cpp:256-262)
    np.testing.assert_allclose(
        np.asarray(out.center_coeffs)[:4],
        (np.asarray(out.left_coeffs)[:4] + np.asarray(out.right_coeffs)[:4]) / 2,
        atol=1e-5)


def test_lane_tracker_recovery():
    st = LaneTrackerState.init()
    left = quad6(0.0, -0.1, 50.0, 40.0, 79.0)
    right = quad6(0.0, 0.15, 100.0, 40.0, 79.0)
    out, st = lane_tracker_update(left, jnp.asarray(True), right,
                                  jnp.asarray(True), st)
    width1 = float(st.bev_width)
    # drop the left lane: recovered from right + cached width
    out2, st2 = lane_tracker_update(left, jnp.asarray(False), right,
                                    jnp.asarray(True), st)
    assert bool(out2.path_valid)
    # recovered left BEV points sit ~width to the left of right points
    lp = np.asarray(out2.bev_left_pts)[np.asarray(out2.bev_left_mask)]
    rp = np.asarray(out2.bev_right_pts)[np.asarray(out2.bev_right_mask)]
    n = min(len(lp), len(rp))
    np.testing.assert_allclose(rp[:n, 0] - lp[:n, 0], width1, atol=1.0)


def test_bev_pixels_to_meters():
    pts = jnp.asarray([[320.0, 640.0], [320.0, 0.0], [0.0, 640.0]])
    m = np.asarray(bev_pixels_to_meters(pts))
    np.testing.assert_allclose(m[0], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(m[1], [0.0, 40.0], atol=1e-6)
    np.testing.assert_allclose(m[2], [-20.0, 0.0], atol=1e-6)


# ---------- PathFinder / Bayes ----------

def test_bayes_product_of_gaussians():
    s = BayesState(jnp.zeros(STATE_DIM), jnp.full(STATE_DIM, 4.0))
    meas = jnp.full(STATE_DIM, 2.0)
    var = jnp.full(STATE_DIM, 4.0)
    s2 = bayes_update(s, meas, var)
    # product of equal-variance Gaussians: mean average, half variance
    assert abs(float(s2.mean[0]) - 1.0) < 1e-6
    assert abs(float(s2.var[0]) - 2.0) < 1e-6


def test_bayes_nan_inflates_variance():
    s = BayesState(jnp.ones(STATE_DIM), jnp.full(STATE_DIM, 4.0))
    meas = jnp.full(STATE_DIM, jnp.nan)
    s2 = bayes_update(s, meas, jnp.full(STATE_DIM, 1.0))
    assert abs(float(s2.var[0]) - 5.0) < 1e-6  # 4 * 1.25
    assert abs(float(s2.mean[0]) - 1.0) < 1e-6


def test_path_finder_converges_to_lane_center():
    st = BayesState.init(default_lane_width=4.0)
    y = jnp.linspace(2.0, 30.0, 64)
    left = jnp.stack([jnp.full_like(y, -2.0), y], -1)   # x=-2 line
    right = jnp.stack([jnp.full_like(y, 2.0), y], -1)   # x=+2 line
    mask = jnp.ones(64, bool)
    out = None
    key = jax.random.key(0)
    for i in range(20):
        key, k = jax.random.split(key)
        out, st = path_finder_update(st, left, mask, right, mask,
                                     jnp.float32(0.0), k)
    # centered in lane: fused CTE ~ 0. Note the reference's width state is
    # signed: width = r_cte - l_cte = (-x_r) - (-x_l) = -4 for lanes at
    # x = +/-2 (path_finder.cpp:160); the cte offsets use the same sign so
    # the fusion stays consistent. We preserve that behavior exactly.
    assert abs(float(out.cte)) < 0.1
    assert abs(abs(float(out.lane_width)) - 4.0) < 0.2
    assert bool(out.fused_valid)


def test_fit_quad_poly_nan_when_insufficient():
    pts = jnp.zeros((8, 2))
    c = fit_quad_poly(pts, jnp.zeros(8, bool))
    assert np.all(np.isnan(np.asarray(c)))


# ---------- Tracking ----------

def test_kalman_constant_velocity():
    kf = KalmanFilter1D()
    kf.initialize(10.0)
    for i in range(1, 50):
        kf.predict(0.1)
        kf.update(10.0 + 2.0 * i * 0.1)  # 2 m/s away
    assert abs(kf.position - (10.0 + 2.0 * 49 * 0.1)) < 0.3
    assert abs(kf.velocity - 2.0) < 0.3


def test_association_and_cipo():
    t = [0.0]
    H = np.eye(3)  # identity homography: world == pixels
    of = ObjectFinder(H, 640, 640, clock=lambda: t[0])
    # two cars (class 1), one pedestrian-class ignored (class 0)
    dets = [
        (100, 100, 150, 150, 0.9, 1),
        (300, 200, 380, 260, 0.8, 1),
        (50, 50, 60, 60, 0.9, 0),
    ]
    r = of.update_and_get_cipo(dets)
    assert len(r.tracked_objects) == 2
    assert r.cipo.exists
    first_ids = sorted(tr.track_id for tr in r.tracked_objects)

    # move both slightly: same tracks must persist
    t[0] += 0.1
    dets2 = [
        (104, 102, 154, 152, 0.9, 1),
        (305, 203, 385, 263, 0.8, 1),
    ]
    r2 = of.update_and_get_cipo(dets2)
    assert sorted(tr.track_id for tr in r2.tracked_objects) == first_ids

    # drop one: survives 3 frames, dies on the 4th
    for k in range(4):
        t[0] += 0.1
        r3 = of.update_and_get_cipo([dets2[0]])
    assert len(r3.tracked_objects) == 1


def test_matching_score_bounds():
    a = (10, 10, 50, 50)
    assert matching_score(a, a, 640, 640) > 0.99
    b = (500, 500, 50, 50)
    assert matching_score(a, b, 640, 640) < 0.55
    assert iou(a, a) == 1.0


# ---------- Control ----------

def test_steering_controller_formula():
    c = SteeringController(K_p=0.5, K_i=0.1, K_d=0.2, K_S=1.0)
    s1 = c.compute_steering(cte=1.0, yaw_error=0.1, feed_forward=0.05)
    expected = 0.2 * 0.1 + math.atan(0.1 * 1.0) + 0.5 * 0.1 + 0.05
    assert abs(s1 - expected) < 1e-12
    s2 = c.compute_steering(cte=1.0, yaw_error=0.3, feed_forward=0.05)
    expected2 = 0.2 * (0.3 - 0.1) + math.atan(0.1) + 0.5 * 0.3 + 0.05
    assert abs(s2 - expected2) < 1e-12


def test_steering_filter_moving_average():
    f = SteeringFilter()
    vals = [f.filter(v) for v in [1.0, 2.0, 3.0]]
    assert vals == [1.0, 1.5, 2.0]
    for v in range(20):
        out = f.filter(5.0)
    assert out == 5.0  # ring saturated


def test_rss_speed_planner_bands():
    p = SpeedPlanner(ego_speed=20.0, is_cipo_present=True)
    d_safe = p.calc_safe_rss_distance()
    assert d_safe > 5.0
    p.set_cipo_state(0.0, d_safe * 2.0)
    assert p.calc_ideal_driving_speed() == 20.5  # accelerate
    p.set_cipo_state(0.0, d_safe * 0.7)
    assert p.calc_ideal_driving_speed() == 19.5  # soft brake
    p.set_cipo_state(0.0, d_safe * 0.3)
    v = p.calc_ideal_driving_speed()
    assert v == 20.0 - 2.5 * 0.5 and p.get_fcw_state()
    p.set_cipo_state(0.0, d_safe * 0.1)
    v = p.calc_ideal_driving_speed()
    assert v == 20.0 - 5.0 * 0.5 and p.get_aeb_state()
    # RSS floor
    p2 = SpeedPlanner(ego_speed=0.0, is_cipo_present=True)
    assert p2.calc_safe_rss_distance() == 5.0


def test_pi_controller():
    c = PIController(K_p=1.0, K_i=0.1, K_d=0.0)
    e1 = c.compute_effort(current_speed=10.0, target_speed=12.0)
    assert abs(e1 - (1.0 * 2.0 + 0.1 * 2.0)) < 1e-12
    c.reset()
    assert c.integral_error == 0.0


def test_steering_step_reference_call_site_parity():
    """Pin the jittable steering_step to the reference frame loop at the
    example conf gains (VisionPilot.conf.example:55-58, main.cpp:511-589):
    yaw_error arrives in DEGREES (main.cpp:583 converts rad*180/pi),
    computeSteering runs + prev_yaw advances only on fused_valid frames,
    the 10-deep moving-average ring is pushed only on bev-valid frames
    (raw=0 enters it when fused is invalid), and on bev-invalid frames
    both raw and filtered stay at their per-frame 0 initialization."""
    import math
    from collections import deque
    import jax.numpy as jnp
    from autoware_vision_pilot_tpu.control.steering import (
        steering_init, steering_step)

    Kp, Ki, Kd, Ks = 0.33, 0.01, -0.40, -0.3

    # host-side oracle of main.cpp:511-589 + steering_controller.cpp:28-41
    def oracle(frames):
        prev_yaw = 0.0
        ring = deque(maxlen=10)
        out = []
        for cte, yaw_rad, curv, fused_valid, bev_valid in frames:
            raw = 0.0
            filt = 0.0
            if bev_valid:
                if fused_valid:
                    yaw_deg = yaw_rad * 180.0 / math.pi
                    raw = (Kd * (yaw_deg - prev_yaw)
                           + math.atan(Ki * cte)
                           + Kp * yaw_deg + curv * Ks)
                    prev_yaw = yaw_deg
                ring.append(raw)
                filt = sum(ring) / len(ring)
            out.append((raw, filt))
        return out

    rng = np.random.default_rng(11)
    frames = []
    for i in range(40):
        frames.append((float(rng.normal() * 0.8),
                       float(rng.normal() * 0.08),
                       float(rng.normal() * 0.05),
                       bool(rng.random() > 0.25),
                       bool(rng.random() > 0.15)))

    expected = oracle(frames)
    state = steering_init()
    for (cte, yaw_rad, curv, fv, bv), (exp_raw, exp_filt) in zip(
            frames, expected):
        filt, raw, state = steering_step(
            state, jnp.float32(cte),
            jnp.float32(yaw_rad) * (180.0 / jnp.pi),
            jnp.float32(curv), Kp, Ki, Kd, Ks,
            fused_valid=jnp.bool_(fv), bev_valid=jnp.bool_(bv))
        np.testing.assert_allclose(float(raw), exp_raw, atol=1e-5)
        np.testing.assert_allclose(float(filt), exp_filt, atol=1e-5)
