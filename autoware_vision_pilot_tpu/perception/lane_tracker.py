"""Lane tracking: perspective lane fits -> BEV corridor + dual-view metrics.

TPU-native rebuild of production_release/src/lane_tracking/lane_tracking.cpp:
- coefficient upscaling 160x80 model space -> image space (:55-75)
- sample the quadratic every 5 rows, warp through the hard-coded calibration
  homography (lane_tracking.hpp:73-77) into a 640x640 BEV grid
- missing-lane recovery: shift the surviving lane by the cached BEV lane
  width (EMA 0.9/0.1, default 180 px) and refit (:136-202)
- quadratic refit + lane offset / yaw / curvature in both views (:300-452)

Jittable formulation: point lists become fixed-size arrays (one sample per
5-pixel y step across the full image height) with validity masks; the
homography warp is a batched matmul; refits are small masked least squares.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.smallsolve import solve3x3

# calibration homography (lane_tracking.hpp:73-77)
H_ORIG_TO_BEV = jnp.array([
    [-1.79887412e-01, -6.05811422e-01, 6.02998251e+02],
    [1.85824549e-14, -1.28170839e+00, 8.63871455e+02],
    [2.95628463e-17, -1.76125061e-03, 1.00000000e+00],
], dtype=jnp.float32)
H_BEV_TO_ORIG = jnp.linalg.inv(H_ORIG_TO_BEV.astype(jnp.float64)).astype(
    jnp.float32)

BEV_SIZE = 640.0
BEV_CENTER_X = 320.0
DEFAULT_BEV_WIDTH = 180.0
WIDTH_EMA = 0.9
SAMPLE_STEP = 5
MAX_PTS = 256  # covers image heights up to 1280 at step 5

# BEV pixel -> meters (main.cpp:333-357)
BEV_RANGE_M = 40.0
BEV_SCALE = BEV_RANGE_M / BEV_SIZE


class LaneTrackerState(NamedTuple):
    bev_width: jnp.ndarray        # () float
    has_width_history: jnp.ndarray  # () bool

    @staticmethod
    def init():
        return LaneTrackerState(jnp.float32(DEFAULT_BEV_WIDTH),
                                jnp.asarray(False))


def upscale_coeffs(c6, model_hw, image_hw):
    """Model-space (80x160) quadratic -> image-space (lane_tracking.cpp:55-75)."""
    mh, mw = model_hw
    ih, iw = image_hw
    sx = iw / mw
    sy = ih / mh
    return jnp.stack([
        jnp.zeros_like(c6[0]),
        c6[1] * sx / (sy * sy),
        c6[2] * sx / sy,
        c6[3] * sx,
        c6[4] * sy,
        c6[5] * sy,
    ])


def _gen_points(c6, image_h):
    """Sample x = a*y^2 + b*y + c every SAMPLE_STEP rows inside [ymin, ymax].
    Fixed-size (MAX_PTS, 2) with a validity mask."""
    ys = c6[4] + SAMPLE_STEP * jnp.arange(MAX_PTS, dtype=jnp.float32)
    valid = ys <= c6[5]
    a = jnp.where(c6[1] != 0, c6[1], 0.0)
    xs = a * ys * ys + c6[2] * ys + c6[3]
    return jnp.stack([xs, ys], -1), valid


def warp_points(pts, H):
    """Perspective transform of (N, 2) points."""
    ones = jnp.ones_like(pts[:, :1])
    p = jnp.concatenate([pts, ones], -1) @ H.T
    return p[:, :2] / jnp.maximum(jnp.abs(p[:, 2:]), 1e-12) * jnp.sign(p[:, 2:])


def _masked_quadfit(pts, mask):
    """Least-squares x = a*y^2 + b*y + c on masked points; returns
    ([0,a,b,c,ymin,ymax], ok). y normalized internally for conditioning."""
    y = pts[:, 1]
    x = pts[:, 0]
    m = mask.astype(jnp.float32)
    n = jnp.sum(m)
    ysc = 1.0 / jnp.maximum(jnp.max(jnp.abs(y) * m), 1.0)
    yn = y * ysc
    A = jnp.stack([yn * yn, yn, jnp.ones_like(yn)], -1)
    AtA = (A * m[:, None]).T @ A + 1e-8 * jnp.eye(3)
    Atb = (A * m[:, None]).T @ x
    q = solve3x3(AtA, Atb)
    a = q[0] * ysc * ysc
    b = q[1] * ysc
    c = q[2]
    ymin = jnp.min(jnp.where(mask, y, jnp.inf))
    ymax = jnp.max(jnp.where(mask, y, -jnp.inf))
    ok = n >= 3
    return jnp.stack([jnp.float32(0), a, b, c, ymin, ymax]), ok


def _offset(c6, y):
    return c6[1] * y * y + c6[2] * y + c6[3]


def _yaw(c6, y):
    return jnp.arctan(2 * c6[1] * y + c6[2])


def _curvature(c6, y):
    dxdy = 2 * c6[1] * y + c6[2]
    d2 = 2 * c6[1]
    denom = (1 + dxdy * dxdy) ** 1.5
    return jnp.where(jnp.abs(denom) < 1e-6, 0.0, jnp.abs(d2) / denom)


class LaneTrackerOutput(NamedTuple):
    left_coeffs: jnp.ndarray      # (6,) model space
    right_coeffs: jnp.ndarray
    center_coeffs: jnp.ndarray
    path_valid: jnp.ndarray
    # dual-view metrics
    orig_lane_offset: jnp.ndarray
    orig_yaw_offset: jnp.ndarray
    orig_curvature: jnp.ndarray
    bev_lane_offset: jnp.ndarray
    bev_yaw_offset: jnp.ndarray
    bev_curvature: jnp.ndarray
    # BEV points for PathFinder (pixels) + masks
    bev_left_pts: jnp.ndarray     # (MAX_PTS, 2)
    bev_left_mask: jnp.ndarray
    bev_right_pts: jnp.ndarray
    bev_right_mask: jnp.ndarray
    bev_width: jnp.ndarray


def lane_tracker_update(left_c6, left_valid, right_c6, right_valid,
                        state: LaneTrackerState,
                        model_hw=(80, 160), image_hw=(640, 1280)):
    """One LaneTracker::update step (jit-friendly; static image size)."""
    ih, iw = image_hw

    def side_points(c6, valid):
        up = upscale_coeffs(c6, model_hw, image_hw)
        pts, mask = _gen_points(up, ih)
        bev = warp_points(pts, H_ORIG_TO_BEV)
        return bev, mask & valid

    left_bev, lmask = side_points(left_c6, left_valid)
    right_bev, rmask = side_points(right_c6, right_valid)

    both = left_valid & right_valid

    # width update at the bottom-most valid sample of each lane
    def last_valid_x(bev, mask):
        idx = jnp.max(jnp.where(mask, jnp.arange(MAX_PTS), -1))
        return bev[jnp.clip(idx, 0, MAX_PTS - 1), 0]

    w_now = jnp.abs(last_valid_x(right_bev, rmask) -
                    last_valid_x(left_bev, lmask))
    new_width = jnp.where(
        both,
        jnp.where(state.has_width_history,
                  state.bev_width * WIDTH_EMA + w_now * (1 - WIDTH_EMA),
                  w_now),
        state.bev_width)
    new_hist = state.has_width_history | both

    # missing-lane recovery via width shift in BEV
    can_recover = state.has_width_history
    recover_left = (~left_valid) & right_valid & can_recover
    recover_right = left_valid & (~right_valid) & can_recover

    left_bev = jnp.where(recover_left,
                         right_bev - jnp.array([new_width, 0.0]), left_bev)
    lmask = jnp.where(recover_left, rmask, lmask)
    right_bev = jnp.where(recover_right,
                          left_bev + jnp.array([new_width, 0.0]), right_bev)
    rmask = jnp.where(recover_right, lmask, rmask)

    # reproject recovered lanes to model space and refit for output coeffs
    mh, mw = model_hw
    sx, sy = iw / mw, ih / mh

    def refit_model(bev, mask):
        orig = warp_points(bev, H_BEV_TO_ORIG)
        model_pts = orig / jnp.array([sx, sy])
        c, ok = _masked_quadfit(model_pts, mask)
        return c, ok

    left_out = left_c6
    rec_l, _ = refit_model(left_bev, lmask)
    left_out = jnp.where(recover_left, rec_l, left_out)
    right_out = right_c6
    rec_r, _ = refit_model(right_bev, rmask)
    right_out = jnp.where(recover_right, rec_r, right_out)

    have_both_pts = jnp.any(lmask) & jnp.any(rmask)

    # BEV center fit + metrics at the vehicle row (y = 640)
    center_bev = (left_bev + right_bev) * 0.5
    cmask = lmask & rmask
    bev_center_c6, _ = _masked_quadfit(center_bev, cmask)
    bev_car_y = jnp.float32(BEV_SIZE)
    bev_off = _offset(bev_center_c6, bev_car_y) - BEV_CENTER_X
    bev_yaw = _yaw(bev_center_c6, bev_car_y)
    bev_curv = _curvature(bev_center_c6, bev_car_y)

    center_c6 = (left_out + right_out) / 2.0
    orig_car_y = jnp.float32(mh - 1)
    orig_off = _offset(center_c6, orig_car_y) - mw / 2.0
    orig_yaw = _yaw(center_c6, orig_car_y)
    orig_curv = _curvature(center_c6, orig_car_y)

    z = jnp.float32(0)
    return LaneTrackerOutput(
        left_coeffs=left_out,
        right_coeffs=right_out,
        center_coeffs=jnp.where(have_both_pts, center_c6, jnp.zeros(6)),
        path_valid=have_both_pts,
        orig_lane_offset=jnp.where(have_both_pts, orig_off, z),
        orig_yaw_offset=jnp.where(have_both_pts, orig_yaw, z),
        orig_curvature=jnp.where(have_both_pts, orig_curv, z),
        bev_lane_offset=jnp.where(have_both_pts, bev_off, z),
        bev_yaw_offset=jnp.where(have_both_pts, bev_yaw, z),
        bev_curvature=jnp.where(have_both_pts, bev_curv, z),
        bev_left_pts=left_bev,
        bev_left_mask=lmask,
        bev_right_pts=right_bev,
        bev_right_mask=rmask,
        bev_width=new_width,
    ), LaneTrackerState(new_width, new_hist)


def bev_pixels_to_meters(pts):
    """(N,2) BEV pixels -> meters, vehicle at bottom center
    (main.cpp transformPixelsToMeters)."""
    x = (pts[:, 0] - BEV_CENTER_X) * BEV_SCALE
    y = (BEV_SIZE - pts[:, 1]) * BEV_SCALE
    return jnp.stack([x, y], -1)
