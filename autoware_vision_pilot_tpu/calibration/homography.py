"""Ground-plane homography estimation (image px -> world meters).

Rebuild of middleware_recipes/Calibration/compute_homography.py: DLT
least-squares homography from >=4 image/world correspondences (e.g.
LiDAR-projected ground points), consistency check against ground truth,
YAML save/load in the format ObjectFinder consumes
(object_finder.cpp:27-52: flat list or {rows, cols, data}).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import yaml


def compute_homography(image_pts: np.ndarray,
                       world_pts: np.ndarray) -> np.ndarray:
    """DLT: image (N,2) px -> world (N,2) m, N >= 4. Normalized for
    conditioning; H scaled so H[2,2] = 1."""
    src = np.asarray(image_pts, np.float64)
    dst = np.asarray(world_pts, np.float64)
    n = len(src)
    if n < 4:
        raise ValueError("need at least 4 correspondences")

    def norm_T(p):
        c = p.mean(0)
        s = np.sqrt(2) / max(np.mean(np.linalg.norm(p - c, axis=1)), 1e-12)
        return np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1]])

    Ts, Td = norm_T(src), norm_T(dst)
    sh = (Ts @ np.c_[src, np.ones(n)].T).T
    dh = (Td @ np.c_[dst, np.ones(n)].T).T

    A = []
    for (x, y, _), (u, v, _) in zip(sh, dh):
        A.append([-x, -y, -1, 0, 0, 0, u * x, u * y, u])
        A.append([0, 0, 0, -x, -y, -1, v * x, v * y, v])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    Hn = Vt[-1].reshape(3, 3)
    H = np.linalg.inv(Td) @ Hn @ Ts
    return H / H[2, 2]


def apply_homography(H: np.ndarray, pts: np.ndarray) -> np.ndarray:
    p = np.c_[np.asarray(pts, np.float64), np.ones(len(pts))] @ H.T
    return p[:, :2] / p[:, 2:]


def homography_reprojection_error(H: np.ndarray, image_pts: np.ndarray,
                                  world_pts: np.ndarray) -> float:
    """Mean Euclidean error in world units (the test_with_gt.py check)."""
    proj = apply_homography(H, image_pts)
    return float(np.mean(np.linalg.norm(proj - np.asarray(world_pts),
                                        axis=1)))


def save_homography_yaml(H: np.ndarray, path: str | Path):
    data = {"H": {"rows": 3, "cols": 3,
                  "data": [float(v) for v in np.asarray(H).reshape(-1)]}}
    Path(path).write_text(yaml.safe_dump(data))


def load_homography_yaml(path: str | Path) -> np.ndarray:
    node = yaml.safe_load(Path(path).read_text())["H"]
    data = node if isinstance(node, list) else node["data"]
    return np.asarray(data, np.float64).reshape(3, 3)
