"""Device LaneFilter vs a faithful Python oracle of the C++ algorithm
(point-collection multiset + deterministic no-RANSAC fit). On clean masks
the device RANSAC gate never fires (a hypothesis's inlier weight cannot
strictly exceed the all-points baseline), so the whole path is
deterministic and directly comparable."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.perception.lane_filter import (
    _find_start, _sliding_search, _weighted_fit)
from support.lane_filter_oracle import (
    find_starting_point, sliding_window_points, fit_poly_no_ransac)

H, W = 80, 160


def rasterize(fn, thick=1, y0=10, y1=H):
    m = np.zeros((H, W), np.float32)
    for y in range(y0, y1):
        x = int(round(fn(y)))
        if 0 <= x < W:
            m[y, max(0, x - thick):x + thick + 1] = 1.0
    return m


def weights_from_points(points):
    w = np.zeros((H, W), np.int32)
    for x, y in points:
        w[y, x] += 1
    return w


def run_device(ego, other, is_left):
    sx, sy, found = _find_start(jnp.asarray(ego), is_left, W)
    weights = _sliding_search(jnp.asarray(ego), jnp.asarray(other),
                              (sx, sy), found)
    return (int(sx), int(sy), bool(found)), np.asarray(weights)


CASES = {
    "straight": lambda y: 50 - 0.1 * y,
    "curved": lambda y: 40 + 0.004 * (y - 20) ** 2,
    "steep": lambda y: 70 - 0.45 * y,
}


def test_start_points_match_oracle():
    for name, fn in CASES.items():
        ego = rasterize(fn)
        start_o = find_starting_point(ego, is_left=True)
        (sx, sy, found), _ = run_device(ego, np.zeros_like(ego), True)
        assert found and start_o is not None, name
        assert (sx, sy) == start_o, (name, (sx, sy), start_o)


def test_point_multisets_match_oracle():
    other = np.zeros((H, W), np.float32)
    for name, fn in CASES.items():
        ego = rasterize(fn)
        start = find_starting_point(ego, True)
        pts = sliding_window_points(ego, other, start)
        w_oracle = weights_from_points(pts)
        _, w_dev = run_device(ego, other, True)
        if not np.array_equal(w_dev, w_oracle):
            diff = np.abs(w_dev - w_oracle).sum()
            total = max(w_oracle.sum(), 1)
            # require exact or near-exact agreement (tiny divergence at
            # the walk's termination edge is tolerable)
            assert diff / total < 0.02, (name, diff, total)


def test_gap_blind_advance_matches():
    """A lane with a vertical gap exercises the blind-advance momentum
    branch (consecutive_empty + dir stepping)."""
    fn = lambda y: 50 - 0.1 * y
    ego = rasterize(fn)
    ego[35:50] = 0.0  # gap
    other = np.zeros_like(ego)
    start = find_starting_point(ego, True)
    pts = sliding_window_points(ego, other, start)
    w_oracle = weights_from_points(pts)
    _, w_dev = run_device(ego, other, True)
    diff = np.abs(w_dev - w_oracle).sum()
    assert diff / max(w_oracle.sum(), 1) < 0.05, diff


def test_other_lane_fallback_branch():
    """Below the priority threshold, windows with <3 ego pixels but >=3
    'other' pixels take the other-lane fallback."""
    fn = lambda y: 50 - 0.1 * y
    ego = rasterize(fn, y0=10, y1=60)          # ego stops at y=60
    other = rasterize(fn, y0=55, y1=H)         # other continues below
    start = find_starting_point(ego, True)
    pts = sliding_window_points(ego, other, start)
    w_oracle = weights_from_points(pts)
    _, w_dev = run_device(ego, other, True)
    # the fallback region (y >= 60) must be populated in both
    assert w_oracle[62:].sum() > 0
    assert w_dev[62:].sum() > 0
    diff = np.abs(w_dev - w_oracle).sum()
    assert diff / max(w_oracle.sum(), 1) < 0.05, diff


@pytest.mark.heavy
def test_final_fit_matches_oracle_fit():
    other = np.zeros((H, W), np.float32)
    for name, fn in CASES.items():
        ego = rasterize(fn)
        start = find_starting_point(ego, True)
        pts = sliding_window_points(ego, other, start)
        c_oracle = fit_poly_no_ransac(pts)
        _, w_dev = run_device(ego, other, True)
        c_dev, ok = _weighted_fit(jnp.asarray(w_dev), jax.random.key(0))
        assert bool(ok)
        c_dev = np.asarray(c_dev)
        # same evaluated lane positions across the fitted span
        for y in (45.0, 60.0, 75.0):
            xo = c_oracle[1] * y * y + c_oracle[2] * y + c_oracle[3]
            xd = c_dev[1] * y * y + c_dev[2] * y + c_dev[3]
            assert abs(xo - xd) < 1.0, (name, y, xo, xd)
