"""Calibration: homography DLT estimation, reprojection error, YAML
round-trip, rotation-homography identity."""
import numpy as np

from autoware_vision_pilot_tpu.calibration import (
    compute_homography, homography_reprojection_error,
    save_homography_yaml, load_homography_yaml,
    get_rotation_matrix, rotation_homography,
)
from autoware_vision_pilot_tpu.calibration.homography import apply_homography


def test_homography_dlt_recovers_known_h():
    rng = np.random.default_rng(0)
    H_true = np.array([[0.02, -0.001, -10.0],
                       [0.0005, 0.05, -30.0],
                       [1e-5, 1e-3, 1.0]])
    img = rng.uniform(0, 1280, (20, 2))
    world = apply_homography(H_true, img)
    H = compute_homography(img, world)
    err = homography_reprojection_error(H, img, world)
    assert err < 1e-6


def test_homography_yaml_roundtrip(tmp_path):
    H = np.arange(9, dtype=np.float64).reshape(3, 3) + 1
    p = tmp_path / "h.yaml"
    save_homography_yaml(H, p)
    H2 = load_homography_yaml(p)
    np.testing.assert_allclose(H, H2)


def test_rotation_homography_identity():
    K = np.array([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]])
    R = get_rotation_matrix(0.0, 0.0, 0.0)
    H = rotation_homography(K, R)
    np.testing.assert_allclose(H, np.eye(3), atol=1e-12)
    # small pitch shifts points predominantly vertically
    Hp = rotation_homography(K, get_rotation_matrix(2.0, 0.0, 0.0))
    pt = apply_homography(Hp, np.array([[640.0, 360.0]]))[0]
    assert abs(pt[0] - 640) < 2 and abs(pt[1] - 360) > 10


def test_homography_ransac_rejects_outliers():
    """30% gross outliers: RANSAC recovers H to <=1e-3 and flags exactly
    the corrupted correspondences (VisionPilot's calibration uses
    cv2.findHomography(..., RANSAC, 5.0) — compute_homography.py:102)."""
    from autoware_vision_pilot_tpu.calibration import (
        compute_homography_ransac)

    rng = np.random.default_rng(1)
    H_true = np.array([[0.02, -0.001, -10.0],
                       [0.0005, 0.05, -30.0],
                       [1e-5, 1e-3, 1.0]])
    img = rng.uniform(0, 1280, (40, 2))
    world = apply_homography(H_true, img)
    bad = rng.choice(40, 12, replace=False)  # 30% outliers
    world_noisy = world.copy()
    world_noisy[bad] += rng.uniform(20.0, 80.0, (12, 2))

    # plain DLT is ruined by the outliers...
    H_dlt = compute_homography(img, world_noisy)
    assert homography_reprojection_error(H_dlt, img, world) > 1.0

    # ...RANSAC is not, and its inlier mask is exactly the clean set
    H, mask = compute_homography_ransac(img, world_noisy, threshold=5.0)
    assert homography_reprojection_error(H, img, world) < 1e-3
    assert np.abs(H - H_true).max() < 1e-3
    expected = np.ones(40, bool)
    expected[bad] = False
    assert (mask == expected).all()
