"""Reference-faithful Python oracle of the C++ LaneFilter (written from
the production_release/src/lane_filtering/lane_filter.cpp spec, RANSAC
disabled for determinism). Used to check the device implementation's
point-collection and fitting semantics against the reference algorithm.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

ROI_Y_MIN, ROI_Y_MAX = 40, 79
WIN_H = 4
MIN_WIN_W, MAX_WIN_W = 1, 6
EMPTY_THRESHOLD = 12
HEIGHT_THRESHOLD = 40
PRIORITY_Y_THRESHOLD = 40


def find_starting_point(ego: np.ndarray, is_left: bool
                        ) -> Optional[Tuple[int, int]]:
    h, w = ego.shape
    mid = w // 2
    for y in range(ROI_Y_MAX, ROI_Y_MIN - 1, -1):
        xs = range(mid - 1, -1, -1) if is_left else range(mid, w)
        for x in xs:
            if ego[y, x] > 0.5:
                return (x, y)
    return None


def sliding_window_points(ego: np.ndarray, other: np.ndarray,
                          start: Tuple[int, int]) -> List[Tuple[int, int]]:
    """Faithful port of slidingWindowSearch (lane_filter.cpp:370-595)."""
    h, w = ego.shape
    points: List[Tuple[int, int]] = []

    def run(step_y: int):
        px, py = start
        if step_y > 0:
            py += WIN_H
        dir_x, dir_y = 0.0, float(step_y)
        empty = 0
        max_steps = h // WIN_H
        for _ in range(max_steps):
            if px < 0 or px >= w:
                break
            if step_y < 0 and py < 0:
                break
            if step_y > 0 and py >= h:
                break
            cur_w = MIN_WIN_W if py < HEIGHT_THRESHOLD else MAX_WIN_W
            if step_y < 0:
                wy0, wy1 = max(0, py - WIN_H), py
            else:
                wy0, wy1 = py, min(h, py + WIN_H)
            wx0, wx1 = max(0, px - cur_w), min(w, px + cur_w)

            strict = py < PRIORITY_Y_THRESHOLD
            ego_px, oth_px = [], []
            for y in range(wy0, wy1):
                for x in range(wx0, wx1):
                    if ego[y, x] > 0.5:
                        ego_px.append((x, y))
                    if not strict and other[y, x] > 0.5:
                        oth_px.append((x, y))

            found = False
            if len(ego_px) >= 3:
                points.extend(ego_px)
                cx = sum(p[0] for p in ego_px) / len(ego_px)
                cy = sum(p[1] for p in ego_px) / len(ego_px)
                found = True
            elif len(oth_px) >= 3:
                points.extend(oth_px)
                cx = sum(p[0] for p in oth_px) / len(oth_px)
                cy = sum(p[1] for p in oth_px) / len(oth_px)
                found = True

            if found:
                empty = 0
                dx, dy = cx - px, cy - py
                ln = math.sqrt(dx * dx + dy * dy)
                if ln > 0.1:
                    dir_x, dir_y = dx / ln, dy / ln
                # std::round — half away from zero
                px = int(math.floor(cx + 0.5)) if cx >= 0 else \
                    int(math.ceil(cx - 0.5))
                py = int(math.floor(cy + 0.5)) if cy >= 0 else \
                    int(math.ceil(cy - 0.5))
            else:
                if step_y < 0 and py < h * 0.25:
                    break
                empty += 1
                if empty >= EMPTY_THRESHOLD:
                    break
                px += int(dir_x * WIN_H)
                py += int(dir_y * WIN_H)

            if step_y < 0 and py >= wy1 - 1:
                py -= WIN_H
            if step_y > 0 and py <= wy0 + 1:
                py += WIN_H

    run(-1)
    run(1)
    return points


def fit_poly_no_ransac(points: List[Tuple[int, int]]
                       ) -> Optional[np.ndarray]:
    """fitPoly with the RANSAC loop disabled (best_inliers = all points):
    order 2 if n >= 30 else 1; least-squares refit; packed
    [0, a, b, c, y_min, y_max]."""
    n = len(points)
    if n < 4:
        return None
    ys = np.array([p[1] for p in points], np.float64)
    xs = np.array([p[0] for p in points], np.float64)
    order = 2 if n >= 30 else 1
    cols = [ys ** 2, ys, np.ones_like(ys)] if order == 2 else \
        [ys, np.ones_like(ys)]
    A = np.stack(cols, -1)
    coef, *_ = np.linalg.lstsq(A, xs, rcond=None)
    out = np.zeros(6)
    if order == 2:
        out[1:4] = coef
    else:
        out[2:4] = coef
    out[4] = ys.min()
    out[5] = ys.max()
    return out
