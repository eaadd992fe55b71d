"""LaneFilter behavioral tests on synthetic lane masks."""
import numpy as np
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.perception.lane_filter import (
    LaneFilterState, lane_filter_update, eval_poly,
)

H, W = 80, 160


def make_lane_masks(left_fn, right_fn, noise=0):
    """Rasterize x = f(y) lane curves into binary masks."""
    rng = np.random.default_rng(0)
    ego_l = np.zeros((H, W), np.float32)
    ego_r = np.zeros((H, W), np.float32)
    other = np.zeros((H, W), np.float32)
    for y in range(10, H):
        xl = int(round(left_fn(y)))
        xr = int(round(right_fn(y)))
        if 0 <= xl < W:
            ego_l[y, max(0, xl - 1):xl + 2] = 1.0
        if 0 <= xr < W:
            ego_r[y, max(0, xr - 1):xr + 2] = 1.0
    for _ in range(noise):
        other[rng.integers(45, H), rng.integers(0, W)] = 1.0
    return ego_l, ego_r, other


def test_straight_lanes_recovered():
    left = lambda y: 50 - 0.1 * y
    right = lambda y: 100 + 0.15 * y
    el, er, ot = make_lane_masks(left, right)
    st = LaneFilterState.init()
    lc, lv, rc, rv, st, lw, rw = lane_filter_update(
        jnp.asarray(el), jnp.asarray(er), jnp.asarray(ot), st,
        jax.random.key(0))
    assert bool(lv) and bool(rv)
    for y in (50.0, 70.0):
        assert abs(float(eval_poly(np.asarray(lc), y)) - left(y)) < 3.0
        assert abs(float(eval_poly(np.asarray(rc), y)) - right(y)) < 3.0


def test_curved_lane_quadratic_fit():
    left = lambda y: 30 + 0.002 * (y - 40) ** 2
    right = lambda y: 120 - 0.003 * (y - 40) ** 2
    el, er, ot = make_lane_masks(left, right, noise=10)
    st = LaneFilterState.init()
    lc, lv, rc, rv, st, _, _ = lane_filter_update(
        jnp.asarray(el), jnp.asarray(er), jnp.asarray(ot), st,
        jax.random.key(1))
    assert bool(lv) and bool(rv)
    for y in (45.0, 60.0, 75.0):
        assert abs(float(eval_poly(np.asarray(lc), y)) - left(y)) < 4.0


def test_temporal_smoothing_and_state():
    left = lambda y: 50 - 0.1 * y
    right = lambda y: 100 + 0.15 * y
    el, er, ot = make_lane_masks(left, right)
    st = LaneFilterState.init()
    lc1, lv1, *_ , st, _w1, _w2 = lane_filter_update(
        jnp.asarray(el), jnp.asarray(er), jnp.asarray(ot), st,
        jax.random.key(0))
    assert bool(st.prev_left_valid)
    # second frame with shifted lane: smoothed result lies between
    left2 = lambda y: 58 - 0.1 * y
    el2, er2, ot2 = make_lane_masks(left2, right)
    lc2, lv2, *_, st2, _a, _b = lane_filter_update(
        jnp.asarray(el2), jnp.asarray(er2), jnp.asarray(ot2), st,
        jax.random.key(2))
    x1 = float(eval_poly(np.asarray(lc1), 60.0))
    x2 = float(eval_poly(np.asarray(lc2), 60.0))
    target = left2(60.0)
    assert min(x1, target) - 1.5 < x2 < max(x1, target) + 1.5
    assert abs(x2 - (0.5 * target + 0.5 * x1)) < 2.5


def test_missing_lane_invalidates():
    el = np.zeros((H, W), np.float32)
    er = np.zeros((H, W), np.float32)
    ot = np.zeros((H, W), np.float32)
    st = LaneFilterState.init()
    lc, lv, rc, rv, st, _, _ = lane_filter_update(
        jnp.asarray(el), jnp.asarray(er), jnp.asarray(ot), st,
        jax.random.key(0))
    assert not bool(lv) and not bool(rv)
    assert not bool(st.prev_left_valid)
