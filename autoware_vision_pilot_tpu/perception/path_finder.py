"""PathFinder: BEV lane points (meters) -> fused CTE / yaw / curvature via a
14-state scalar-Gaussian Bayes filter.

Rebuild of production_release/src/path_planning/{path_finder,estimator,
poly_fit}.cpp: predict adds process noise (sd 0.5), update multiplies
Gaussians per state (NaN measurement -> variance x1.25 inflation,
estimator.cpp:33-37), then inverse-variance fusion of groups
CTE[0,3)->3, yaw[5,7)->7, curvature[9,11)->11 (path_finder.cpp:26-31).
The AutoSteer angle substitutes the curvature feed-forward
(path_finder.cpp:95-97, 180).

State layout (14): [cte_path, cte_left, cte_right, cte_fused,
yaw_path, yaw_left, yaw_right, yaw_fused, curv_path, curv_left,
curv_right, curv_fused, lane_width, width_aux].

Everything is a tiny fixed-size vector op — jittable, differentiable, and
batchable with vmap (the TPU-native win: N video streams track in one
program).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.smallsolve import solve3x3

STATE_DIM = 14
PROC_SD = 0.5
STD_M_CTE = 0.1
STD_M_YAW = 0.01
STD_M_CURV = 0.1
STD_M_WIDTH = 0.01
NAN = jnp.nan

# fusion groups: (start, end) -> fused written at index `end`
FUSION_RULES = ((0, 3), (5, 7), (9, 11))


class BayesState(NamedTuple):
    mean: jnp.ndarray      # (14,)
    var: jnp.ndarray       # (14,)

    @staticmethod
    def init(default_lane_width: float = 4.0):
        mean = jnp.zeros(STATE_DIM).at[12].set(default_lane_width)
        var = jnp.full(STATE_DIM, 1e3).at[12].set(0.25)
        return BayesState(mean, var)


def bayes_predict(s: BayesState, process_mean, process_var) -> BayesState:
    return BayesState(s.mean + process_mean, s.var + process_var)


def bayes_update(s: BayesState, meas_mean, meas_var) -> BayesState:
    isnan = jnp.isnan(meas_mean)
    v0, m0 = s.var, s.mean
    v1 = meas_var
    m1 = jnp.where(isnan, 0.0, meas_mean)
    v2 = (v0 * v1) / (v0 + v1)
    m2 = (m0 * v1 + m1 * v0) / (v0 + v1)
    var = jnp.where(isnan, v0 * 1.25, v2)
    mean = jnp.where(isnan, m0, m2)

    for start, end in FUSION_RULES:
        g_var = var[start:end]
        g_mean = mean[start:end]
        pos = g_var > 0.0
        inv = jnp.where(pos, 1.0 / g_var, 0.0)
        wsum = jnp.where(pos, g_mean / g_var, 0.0)
        inv_sum = jnp.sum(inv)
        fused_var = 1.0 / jnp.maximum(inv_sum, 1e-30)
        fused_mean = fused_var * jnp.sum(wsum)
        ok = inv_sum > 0.0
        var = var.at[end].set(jnp.where(ok, fused_var, var[end]))
        mean = mean.at[end].set(jnp.where(ok, fused_mean, mean[end]))
    return BayesState(mean, var)


def fit_quad_poly(pts, mask):
    """Masked least-squares x = c0*y^2 + c1*y + c2 (poly_fit.cpp fitQuadPoly).
    Returns (3,) coeffs, NaN-filled when fewer than 3 points."""
    m = mask.astype(jnp.float32)
    n = jnp.sum(m)
    y, x = pts[:, 1], pts[:, 0]
    A = jnp.stack([y * y, y, jnp.ones_like(y)], -1)
    AtA = (A * m[:, None]).T @ A + 1e-9 * jnp.eye(3)
    Atb = (A * m[:, None]).T @ x
    c = solve3x3(AtA, Atb)
    return jnp.where(n > 2, c, jnp.full(3, NAN))


class PathFinderOutput(NamedTuple):
    cte: jnp.ndarray
    yaw_error: jnp.ndarray
    curvature: jnp.ndarray
    lane_width: jnp.ndarray
    cte_variance: jnp.ndarray
    yaw_variance: jnp.ndarray
    curv_variance: jnp.ndarray
    lane_width_variance: jnp.ndarray
    left_coeff: jnp.ndarray
    right_coeff: jnp.ndarray
    left_valid: jnp.ndarray
    right_valid: jnp.ndarray
    fused_valid: jnp.ndarray


def path_finder_update(state: BayesState, left_pts_m, left_mask,
                       right_pts_m, right_mask, autosteer_rad,
                       key, default_lane_width: float = 4.0):
    """One PathFinder::update step (path_finder.cpp:47-194)."""
    eps = 1e-5
    noise = jax.random.uniform(key, (STATE_DIM,), minval=-eps, maxval=eps)
    state = bayes_predict(state, noise, jnp.full(STATE_DIM, PROC_SD ** 2))

    lc = fit_quad_poly(left_pts_m, left_mask)
    rc = fit_quad_poly(right_pts_m, right_mask)
    # derived metrics at y=0 (vehicle position), poly_fit.cpp FittedCurve
    l_cte = -lc[2]
    l_yaw = -jnp.arctan2(lc[1], 1.0)
    r_cte = -rc[2]
    r_yaw = -jnp.arctan2(rc[1], 1.0)

    width = state.mean[12]
    steering = autosteer_rad

    meas_var = jnp.array([STD_M_CTE**2] * 4 + [STD_M_YAW**2] * 4 +
                         [STD_M_CURV**2] * 4 + [STD_M_WIDTH**2] * 2)

    both_nan = jnp.isnan(l_cte) & jnp.isnan(r_cte)
    one_nan = jnp.isnan(l_cte) | jnp.isnan(r_cte)
    width_meas = jnp.where(
        both_nan, default_lane_width,
        jnp.where(one_nan, width, r_cte - l_cte))

    meas_mean = jnp.array([
        NAN, 0.0, 0.0, NAN,   # cte: [1],[2] filled below
        NAN, 0.0, 0.0, NAN,   # yaw
        NAN, 0.0, 0.0, NAN,   # curvature
        0.0, NAN,             # width
    ])
    meas_mean = meas_mean.at[1].set(l_cte + width / 2.0)
    meas_mean = meas_mean.at[2].set(r_cte - width / 2.0)
    meas_mean = meas_mean.at[5].set(l_yaw)
    meas_mean = meas_mean.at[6].set(r_yaw)
    meas_mean = meas_mean.at[9].set(steering)
    meas_mean = meas_mean.at[10].set(steering)
    meas_mean = meas_mean.at[12].set(width_meas)

    state = bayes_update(state, meas_mean, meas_var)

    cte = state.mean[3]
    yaw = state.mean[7]
    curv = steering  # AutoSteer feed-forward substitutes curvature
    out = PathFinderOutput(
        cte=cte, yaw_error=yaw, curvature=curv,
        lane_width=state.mean[12],
        cte_variance=state.var[3], yaw_variance=state.var[7],
        curv_variance=state.var[11], lane_width_variance=state.var[12],
        left_coeff=lc, right_coeff=rc,
        left_valid=~jnp.isnan(l_cte), right_valid=~jnp.isnan(r_cte),
        fused_valid=~(jnp.isnan(cte) | jnp.isnan(yaw) | jnp.isnan(curv)),
    )
    return out, state
