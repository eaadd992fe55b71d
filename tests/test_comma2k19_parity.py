"""Comma2k19 geometry vs the reference's vendored comma.ai utils
(Models/data_parsing/EgoLanes/Comma2k19/utils/{coordinates,orientation,
camera}.py) on random inputs: geodetic<->ECEF (Ferrari), NED local
frames, quaternion<->rotation/euler, and the device->image projection."""
from __future__ import annotations

import importlib.util
import pathlib

import numpy as np
import pytest

from autoware_vision_pilot_tpu.data_parsing.comma2k19 import (
    LocalCoord, ecef_to_geodetic, geodetic_to_ecef, ned_matrix,
    project_to_image, quat_to_euler, quat_to_rot, euler_to_quat)

REF_UTILS = pathlib.Path(
    "/root/reference/Models/data_parsing/EgoLanes/Comma2k19/utils")

pytestmark = pytest.mark.ref_parity


def _load(name):
    import sys
    parent = str(REF_UTILS.parent)  # so `from utils import ...` resolves
    if parent not in sys.path:
        sys.path.insert(0, parent)
    spec = importlib.util.spec_from_file_location(
        f"ref_c2k19_{name}", REF_UTILS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.xrange = range  # the vendored utils still carry python-2 loops
    return mod


@pytest.fixture(scope="module")
def ref_coords():
    if not REF_UTILS.exists():
        pytest.skip("/root/reference not mounted")
    return _load("coordinates")


@pytest.fixture(scope="module")
def ref_orient():
    if not REF_UTILS.exists():
        pytest.skip("/root/reference not mounted")
    return _load("orientation")


def _geodetics(n=32):
    rng = np.random.default_rng(0)
    lat = rng.uniform(-80, 80, n)
    lon = rng.uniform(-179, 179, n)
    alt = rng.uniform(-100, 4000, n)
    return np.stack([lat, lon, alt], -1)


def test_geodetic_ecef_roundtrip_matches_reference(ref_coords):
    g = _geodetics()
    ours = geodetic_to_ecef(g)
    theirs = ref_coords.geodetic2ecef(g)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-6)
    back = ecef_to_geodetic(ours)
    ref_back = ref_coords.ecef2geodetic(theirs)
    np.testing.assert_allclose(back, ref_back, rtol=0, atol=1e-9)
    np.testing.assert_allclose(back[:, :2], g[:, :2], atol=1e-9)
    # Ferrari's closed form self-roundtrips altitude to ~mm, not um
    np.testing.assert_allclose(back[:, 2], g[:, 2], atol=1e-3)


def test_local_ned_frame_matches_reference(ref_coords):
    g0 = np.array([37.7749, -122.4194, 10.0])
    ours = LocalCoord.from_geodetic(g0)
    theirs = ref_coords.LocalCoord.from_geodetic(g0)
    np.testing.assert_allclose(ours.ned2ecef_matrix,
                               theirs.ned2ecef_matrix, atol=1e-12)
    np.testing.assert_allclose(ours.ned2ecef_matrix,
                               ned_matrix(g0[0], g0[1]), atol=1e-12)
    pts = _geodetics(8) * 0.001 + g0  # nearby points
    np.testing.assert_allclose(ours.geodetic_to_ned(pts),
                               theirs.geodetic2ned(pts), atol=1e-6)
    ned = np.array([[100.0, -50.0, 2.0], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(ours.ned_to_geodetic(ned),
                               theirs.ned2geodetic(ned), atol=1e-9)


def test_quaternion_transforms_match_reference(ref_orient):
    rng = np.random.default_rng(1)
    e = rng.uniform(-1.2, 1.2, (16, 3))
    q_ref = ref_orient.euler2quat(e)
    q_ours = euler_to_quat(e)
    np.testing.assert_allclose(q_ours, q_ref, atol=1e-12)
    np.testing.assert_allclose(quat_to_rot(q_ours),
                               ref_orient.quat2rot(q_ref), atol=1e-12)
    np.testing.assert_allclose(quat_to_euler(q_ours),
                               ref_orient.quat2euler(q_ref), atol=1e-12)


def test_device_projection_matches_reference_camera():
    if not REF_UTILS.exists():
        pytest.skip("/root/reference not mounted")
    cam = _load("camera")
    rng = np.random.default_rng(2)
    # points in front of the device: x forward
    pts = np.stack([rng.uniform(3, 80, 64), rng.uniform(-10, 10, 64),
                    rng.uniform(-2, 3, 64)], -1)
    ours = project_to_image(pts)
    theirs = cam.img_from_device(pts)
    theirs = cam.denormalize(theirs)
    mask = np.isfinite(ours).all(axis=1)
    assert mask.any()
    np.testing.assert_allclose(ours[mask], theirs[mask], atol=1e-9)
    # both mark the same points invalid
    np.testing.assert_array_equal(mask, np.isfinite(theirs).all(axis=1))
