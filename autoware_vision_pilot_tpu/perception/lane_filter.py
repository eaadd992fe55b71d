"""Lane filtering: raw EgoLanes masks -> clean polynomial lane fits.

TPU-native rebuild of production_release/src/lane_filtering/lane_filter.cpp
(595 LoC of pointer-chasing CPU search). Behavior preserved:

- ROI start-point scan over mask rows 40..79 outward from the mid column
  (lane_filter.cpp findStartingPoints).
- momentum-guided sliding-window search, bi-directional, with
  perspective-aware window width (1 px above y=40, 6 px below), strict-ego
  mode above y=40, >=3-pixel windows accepted, 12-empty-window cutoff,
  horizon cutoff at 25% height (slidingWindowSearch).
- polynomial fit: dynamic order (quad if >=30 points else linear),
  weighted least squares on all collected points; coeffs packed
  [a3,a2,a1,a0,y_min,y_max] (fitPoly). The reference's RANSAC loop is
  provably a no-op (see _weighted_fit) and is not computed.
- EMA temporal smoothing (factor 0.5) against the previous valid fit.

TPU-idiomatic formulation: the whole update is ONE jitted function. The
sequential window walk is a ``lax.scan`` over a fixed step budget; pixel
collection inside a window is a masked reduction over the full (80,160)
grid (12.8k lanes of VPU work — cheaper than gather); "point lists" become
integer weight images (windows may revisit pixels; weights preserve the
multiset semantics), compacted to their top-K cells before the fit.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.smallsolve import solve3x3
from jax import lax

# --- constants (lane_filter.hpp:30-63) ---
# The reference fixes the start-point ROI to rows 40..79 of the 80-row
# mask and switches window width / strictness at row 40 — i.e. the lower
# half. Derived from the mask height here so the identical program runs
# at the tiny test geometry; at the production 80x160 mask the values
# are exactly the reference's.


def _roi_y_min(h: int) -> int:
    return h // 2
WIN_H = 4
MIN_WIN_W = 1
MAX_WIN_W = 6
MIN_PIXELS_FOR_FIT = 4
EMPTY_THRESHOLD = 12

# The reference's RANSAC constants, kept for contract documentation:
# its acceptance condition can never fire (see _weighted_fit), so no
# hypothesis loop runs here.
RANSAC_ITERS = 50
RANSAC_THRESHOLD = 2.0
SMOOTHING = 0.5


class LaneFilterState(NamedTuple):
    prev_left: jnp.ndarray    # (6,) [a3,a2,a1,a0,ymin,ymax]
    prev_left_valid: jnp.ndarray   # () bool
    prev_right: jnp.ndarray
    prev_right_valid: jnp.ndarray

    @staticmethod
    def init():
        # independent buffers: states get donated under jit, and donating
        # one buffer referenced by two leaves is an error
        return LaneFilterState(
            jnp.zeros((6,), jnp.float32), jnp.asarray(False),
            jnp.zeros((6,), jnp.float32), jnp.asarray(False))


def eval_poly(coeffs, y):
    """x = a3*y^3 + a2*y^2 + a1*y + a0 (coeffs[:4])."""
    return ((coeffs[0] * y + coeffs[1]) * y + coeffs[2]) * y + coeffs[3]


def _find_start(ego, is_left, width):
    """Lowest ROI row with a mask pixel, nearest-to-mid column in that row.
    Returns (x, y, found)."""
    h, w = ego.shape
    mid = width // 2
    cols = jnp.arange(w)
    if is_left:
        valid_x = cols < mid
        # prefer larger x (closest to mid from the left)
        xkey = jnp.where(valid_x, cols, -1)
    else:
        valid_x = cols >= mid
        xkey = jnp.where(valid_x, w - cols, -1)  # prefer smaller x
    roi = ego[_roi_y_min(h):] > 0.5
    rowhit = jnp.any(roi & valid_x[None, :], axis=1)  # (roi_h,)
    # bottom-most hit row
    roi_h = roi.shape[0]
    rows = jnp.arange(roi_h)
    best_row = jnp.max(jnp.where(rowhit, rows, -1))
    found = best_row >= 0
    row = jnp.clip(best_row, 0, roi_h - 1)
    rowmask = roi[row]
    key = jnp.where(rowmask, xkey, -1)
    x = jnp.argmax(key)
    y = row + _roi_y_min(h)
    return x.astype(jnp.int32), y.astype(jnp.int32), found


def _round_away(v):
    """std::round semantics (half away from zero) for the centroid cast."""
    return jnp.where(v >= 0, jnp.floor(v + 0.5), jnp.ceil(v - 0.5))


def _sliding_search(ego, other, start_xy, found):
    """Bi-directional momentum window walk. Returns weight image (H, W)
    counting how many windows contributed each pixel."""
    h, w = ego.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    ego_b = ego > 0.5
    other_b = other > 0.5

    def direction_scan(step_y: int):
        start_y = start_xy[1] + (WIN_H if step_y > 0 else 0)

        def body(carry, _):
            px, py, dx, dy, empty, stopped, weights = carry
            oob = (px < 0) | (px >= w)
            oob |= (py < 0) if step_y < 0 else (py >= h)
            stopped = stopped | oob

            cur_w = jnp.where(py < h // 2, MIN_WIN_W, MAX_WIN_W)
            if step_y < 0:
                wy0 = jnp.maximum(0, py - WIN_H)
                wy1 = py
            else:
                wy0 = py
                wy1 = jnp.minimum(h, py + WIN_H)
            wx0 = jnp.maximum(0, px - cur_w)
            wx1 = jnp.minimum(w, px + cur_w)

            in_win = (ys >= wy0) & (ys < wy1) & (xs >= wx0) & (xs < wx1)
            strict = py < h // 2

            ego_win = in_win & ego_b
            oth_win = in_win & other_b & ~strict
            n_ego = jnp.sum(ego_win)
            n_oth = jnp.sum(oth_win)

            use_ego = n_ego >= 3
            use_oth = (~use_ego) & (n_oth >= 3)
            found_valid = use_ego | use_oth
            sel = jnp.where(use_ego, ego_win, jnp.where(use_oth, oth_win, False))

            cnt = jnp.maximum(jnp.sum(sel), 1)
            cx = jnp.sum(sel * xs) / cnt
            cy = jnp.sum(sel * ys) / cnt

            take = found_valid & ~stopped
            weights = weights + jnp.where(take, sel.astype(jnp.int32), 0)

            # momentum + position update
            ddx = cx - px
            ddy = cy - py
            ln = jnp.sqrt(ddx * ddx + ddy * ddy)
            upd_dir = take & (ln > 0.1)
            dx = jnp.where(upd_dir, ddx / ln, dx)
            dy = jnp.where(upd_dir, ddy / ln, dy)

            new_px = jnp.where(take, _round_away(cx).astype(jnp.int32), px)
            new_py = jnp.where(take, _round_away(cy).astype(jnp.int32), py)

            # miss branch
            horizon_cut = (step_y < 0) & (py < h // 4) & ~found_valid
            stopped = stopped | (horizon_cut & ~stopped)
            empty = jnp.where(take, 0, empty + 1)
            stopped = stopped | (empty >= EMPTY_THRESHOLD)
            blind_px = px + (dx * WIN_H).astype(jnp.int32)
            blind_py = py + (dy * WIN_H).astype(jnp.int32)
            new_px = jnp.where(take, new_px, blind_px)
            new_py = jnp.where(take, new_py, blind_py)

            # forced movement for termination
            if step_y < 0:
                new_py = jnp.where(new_py >= wy1 - 1, new_py - WIN_H, new_py)
            else:
                new_py = jnp.where(new_py <= wy0 + 1, new_py + WIN_H, new_py)

            px = jnp.where(stopped, px, new_px)
            py = jnp.where(stopped, py, new_py)
            return (px, py, dx, dy, empty, stopped, weights), None

        init = (start_xy[0], start_y, jnp.float32(0), jnp.float32(step_y),
                jnp.int32(0), ~found, jnp.zeros((h, w), jnp.int32))
        final, _ = lax.scan(body, init, None, length=h // WIN_H)
        return final[-1]

    up = direction_scan(-1)
    down = direction_scan(1)
    return up + down


def _weighted_fit(weights, key):
    """RANSAC + weighted LSQ refit on the weight image.

    weights: (H, W) int — point multiset. Returns (coeffs6, valid).
    y is normalized to [0,1] internally for f32 conditioning; coefficients
    are rescaled back to pixel space.
    """
    h, w = weights.shape
    ys = jnp.arange(h)[:, None] * jnp.ones((1, w))
    xs = jnp.ones((h, 1)) * jnp.arange(w)[None, :]
    wt_full = weights.reshape(-1).astype(jnp.float32)

    n = jnp.sum(wt_full)
    yf_full = ys.reshape(-1)
    y_min = jnp.min(jnp.where(wt_full > 0, yf_full, jnp.inf))
    y_max = jnp.max(jnp.where(wt_full > 0, yf_full, -jnp.inf))

    # Compact the point multiset to its top-K cells by weight ONCE, so
    # the 50-hypothesis RANSAC (gumbel draws, inlier scoring, refit)
    # runs K-wide instead of (H*W)-wide. Exact whenever <= K cells are
    # nonzero (the sliding-window search marks lane-shaped sets, far
    # below K at 80x160); beyond K the lightest points drop first —
    # the same points RANSAC would never sample. 6.25x less work per
    # hypothesis, and the vmapped fleet step's N=4 tiling cliff sat in
    # these ops (BENCH_NOTES r5 "fleet N=4").
    K = min(2048, wt_full.shape[0])  # tiny test masks fit whole
    wt, top_idx = lax.top_k(wt_full, K)
    yf = yf_full[top_idx]
    xf = xs.reshape(-1)[top_idx]

    order = jnp.where(n < 30, 1, 2)
    sc = 1.0 / (h - 1)

    def design(y, ordr):
        yn = y * sc
        # columns [y^2, y, 1] masked by order (linear zeroes the y^2 col)
        c2 = jnp.where(ordr == 2, yn * yn, 0.0)
        return jnp.stack([c2, yn, jnp.ones_like(yn)], -1)

    def wlsq(weights_vec):
        A = design(yf, order)
        Wv = weights_vec
        AtA = (A * Wv[:, None]).T @ A
        # degenerate guard for linear order: add tiny ridge on dead column
        AtA = AtA + jnp.diag(jnp.where(
            jnp.arange(3) == 0, jnp.where(order == 1, 1.0, 0.0), 0.0)) * 1e-6
        Atb = (A * Wv[:, None]).T @ xf
        coef = solve3x3(AtA, Atb)
        return coef  # in normalized-y space [q2, q1, q0]

    # --- RANSAC: provably a no-op in the reference, so not computed ---
    # The reference defaults best_inliers to ALL points and replaces it
    # only when a hypothesis has STRICTLY MORE inliers
    # (production_release/src/lane_filtering/lane_filter.cpp:140
    # "Default to all points if RANSAC finds nothing better" and :172
    # `current_inliers.size() > best_inliers.size()`). Inliers are a
    # subset of the points, so no hypothesis can ever exceed the
    # all-points default and the refit ALWAYS runs on every point —
    # the reference's ransac_iterations loop is dead weight. Earlier
    # rounds ported that loop faithfully (50 vmapped hypotheses; see
    # git history for the gumbel-top-k form); round-5 review proved the
    # acceptance condition unsatisfiable, so the hypotheses are skipped
    # outright: bit-identical outputs (oracle tests unchanged), and the
    # fleet lane_filter stage drops the 50x per-hypothesis work.
    # `key` stays in the signature: a live outlier-rejecting RANSAC
    # (a deliberate behavior CHANGE vs the reference) would reuse it.
    del key
    npts = order + 1
    inlier_w = wt

    coef = wlsq(inlier_w)
    # rescale normalized coeffs back to pixel y: x = q2*(y*sc)^2 + q1*(y*sc) + q0
    a2 = coef[0] * sc * sc
    a1 = coef[1] * sc
    a0 = coef[2]
    coeffs6 = jnp.stack([jnp.float32(0), a2, a1, a0,
                         y_min.astype(jnp.float32), y_max.astype(jnp.float32)])
    valid = (n >= MIN_PIXELS_FOR_FIT) & (jnp.sum(inlier_w) >= npts)
    return coeffs6, valid


@partial(jax.jit, static_argnames=())
def lane_filter_update(ego_left, ego_right, other, state: LaneFilterState,
                       key):
    """One LaneFilter::update step, fully on device.

    ego_left/ego_right/other: (H, W) float binary masks (H=80, W=160).
    Returns (left_coeffs6, left_valid, right_coeffs6, right_valid, new_state,
    left_weights, right_weights).
    """
    h, w = ego_left.shape
    kl, kr = jax.random.split(key)

    def one_side(ego, is_left, prev, prev_valid, k):
        sx, sy, found = _find_start(ego, is_left, w)
        weights = _sliding_search(ego, other, (sx, sy), found)
        coeffs, valid = _weighted_fit(weights, k)
        valid = valid & found
        smoothed = jnp.where(
            prev_valid, SMOOTHING * coeffs + (1 - SMOOTHING) * prev, coeffs)
        out = jnp.where(valid, smoothed, coeffs)
        # reference semantics: start not found -> invalidate history;
        # valid fit -> smoothed fit becomes history; invalid fit with start
        # found -> history untouched
        new_prev = jnp.where(valid, out, prev)
        new_valid = jnp.where(found, valid | prev_valid, False)
        return out, valid, new_prev, new_valid, weights

    lc, lv, pl, plv, lw = one_side(ego_left, True, state.prev_left,
                                   state.prev_left_valid, kl)
    rc, rv, pr, prv, rw = one_side(ego_right, False, state.prev_right,
                                   state.prev_right_valid, kr)
    new_state = LaneFilterState(pl, plv, pr, prv)
    return lc, lv, rc, rv, new_state, lw, rw
