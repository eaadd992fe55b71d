"""EgoLanes per-dataset BEV GT parse paths (data_parsing/egolanes_bev.py)
vs the reference formulas (Models/data_parsing/EgoLanes/*/parse_*_bev.py).

Two tiers:
- pure fixture tests of the geometry (run everywhere);
- ref_parity: the reference parser module is imported from
  /root/reference (its helper functions, with the __main__ globals
  injected) and run on the SAME synthetic frames — source points,
  homography transforms, polyfit grids, ego sides, and the final
  master-JSON entry must agree.
"""
from __future__ import annotations

import importlib.util
import math
import pathlib
import sys

import numpy as np
import pytest

from autoware_vision_pilot_tpu.data_parsing.egolanes_bev import (
    CURVELANES, TUSIMPLE, CULANE, OPENLANE, DATASETS, BEVConfig,
    anchor_angle, bev_homography, ego_side, find_source_points,
    frame_bev_gt, interp_line, line_anchor, parse_dataset, transform_bev,
    transformed_distance)
from autoware_vision_pilot_tpu.calibration.homography import (
    apply_homography)

REF = pathlib.Path(
    "/root/reference/Models/data_parsing/EgoLanes/CurveLanes")


def _gentle_frame():
    """Normalized annotation of a gently right-curving road (bottom of
    image at y=1.0, lines listed bottom-up as the datasets do)."""
    egoleft = [(0.38, 1.0), (0.41, 0.8), (0.44, 0.62), (0.46, 0.5)]
    egoright = [(0.62, 1.0), (0.60, 0.8), (0.57, 0.62), (0.55, 0.5)]
    path = [(0.50, 1.0), (0.505, 0.8), (0.506, 0.62), (0.505, 0.5)]
    return {"egoleft_lane": egoleft, "egoright_lane": egoright,
            "drivable_path": path}


# ---------------------------- fixture tier -----------------------------


def test_line_anchor_extends_first_segment():
    # line from (100, 300) to (120, 200): slope a=(300-200)/(100-120)=-5
    ln = [(100.0, 300.0), (120.0, 200.0)]
    x0, a, b = line_anchor(ln, 400)
    assert a == pytest.approx(-5.0)
    assert b == pytest.approx(300 - (-5.0) * 100)
    assert x0 == pytest.approx((400 - b) / a)


def test_line_anchor_degenerate_vertical():
    x0, a, b = line_anchor([(50.0, 300.0), (50.0, 200.0)], 400)
    assert (x0, a, b) == (50.0, None, None)


def test_interp_line_quota_and_endpoints():
    ln = [(0.0, 0.0), (10.0, 0.0)]
    out = interp_line(ln, 5)
    assert len(out) == 5
    assert out[0] == (0.0, 0.0) and out[-1] == (10.0, 0.0)
    assert [p[0] for p in out] == pytest.approx([0, 2.5, 5, 7.5, 10])


def test_homography_maps_source_corners_to_bev_rect():
    cfg = CURVELANES
    f = _gentle_frame()
    sps = find_source_points(cfg, f["egoleft_lane"], f["egoright_lane"])
    H = bev_homography(cfg, sps)
    src = np.array([sps["LS"], sps["RS"], sps["LE"], sps["RE"]],
                   np.float64)
    got = apply_homography(H, src)
    np.testing.assert_allclose(got, np.array(cfg.bev_pts, np.float64),
                               atol=1e-6)


def test_frame_bev_gt_schema_and_grid():
    cfg = CURVELANES
    entry, reason = frame_bev_gt(cfg, _gentle_frame())
    assert reason is None, reason
    n_grid = cfg.bev_h // cfg.y_step + 1          # 11 points
    for k in ("bev_egopath", "reproj_egopath", "bev_egoleft",
              "reproj_egoleft", "bev_egoright", "reproj_egoright"):
        assert len(entry[k]) == n_grid
        assert all(len(p) == 4 for p in entry[k])
    # bev y grid: decreasing from 1.0 (bottom) to 0.0, step 0.1
    ys = [p[1] for p in entry["bev_egopath"]]
    assert ys == pytest.approx(list(np.linspace(1.0, 0.0, n_grid)))
    # validity is a prefix: once 0, stays 0; exactly one flag==1
    for k in ("bev_egopath", "bev_egoleft", "bev_egoright"):
        vals = [p[3] for p in entry[k]]
        assert vals == sorted(vals, reverse=True)
        assert sum(p[2] for p in entry[k]) == 1
    # left < path < right at the anchor row (normalized x)
    assert (entry["bev_egoleft"][0][0] < entry["bev_egopath"][0][0]
            < entry["bev_egoright"][0][0])
    H = np.asarray(entry["homomatrix"])
    assert H.shape == (3, 3) and H[2, 2] == pytest.approx(1.0)


def test_sanity_check_rejects_offcenter_anchor():
    f = _gentle_frame()
    # shift only the drivable path: the homography is built FROM the
    # egolines, so the BEV anchor centrality check is relative to them
    f["drivable_path"] = [(x + 0.2, y) for x, y in f["drivable_path"]]
    entry, reason = frame_bev_gt(CURVELANES, f)
    assert entry is None
    assert "too far left or right" in reason


def test_dataset_presets_match_reference_main_blocks():
    # parse_*_bev.py __main__ frame sizes
    assert (CURVELANES.frame_w, CURVELANES.frame_h) == (800, 400)
    assert (TUSIMPLE.frame_w, TUSIMPLE.frame_h) == (1280, 720)
    assert (CULANE.frame_w, CULANE.frame_h) == (1440, 430)
    assert (OPENLANE.frame_w, OPENLANE.frame_h) == (1920, 1280)
    for cfg in DATASETS.values():
        assert (cfg.bev_w, cfg.bev_h) == (640, 1280)
        assert cfg.bev_pts == ((240, 1280), (400, 1280), (240, 0),
                               (400, 0))
        assert (cfg.y_step, cfg.polyfit_order, cfg.min_points) == (
            128, 2, 30)


def test_parse_dataset_roundtrip(tmp_path):
    import json
    frames = {"000001": _gentle_frame(), "000002": _gentle_frame()}
    # one bad frame exercising the skip path
    bad = _gentle_frame()
    bad["egoleft_lane"] = [(0.5, 1.0)] * 2  # degenerate
    frames["000bad"] = bad
    src = tmp_path / "drivable_path.json"
    src.write_text(json.dumps(frames))
    out = tmp_path / "drivable_path_bev.json"
    skipped = tmp_path / "skipped.json"
    master = parse_dataset(src, "curvelanes", out, skipped)
    assert set(master) == {"000001", "000002"}
    assert set(json.loads(skipped.read_text())) == {"000bad"}
    assert json.loads(out.read_text()) != {}


# --------------------------- ref_parity tier ---------------------------


def _load_reference_parser():
    """Import parse_curvelanes_bev.py from /root/reference and inject
    the __main__-block globals its helper functions close over."""
    sys.path.insert(0, str(REF))
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_parse_curvelanes_bev", REF / "parse_curvelanes_bev.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(str(REF))
    mod.W, mod.H = 800, 400
    mod.BEV_W, mod.BEV_H = 640, 1280
    mod.BEV_PTS = {"LS": [240, 1280], "RS": [400, 1280],
                   "LE": [240, 0], "RE": [400, 0]}
    mod.MIN_POINTS = 30
    mod.BEV_Y_STEP = 128
    mod.POLYFIT_ORDER = 2
    return mod


@pytest.fixture(scope="module")
def ref():
    if not REF.exists():
        pytest.skip("/root/reference not mounted")
    cv2 = pytest.importorskip("cv2")
    del cv2
    return _load_reference_parser()


@pytest.mark.ref_parity
def test_source_points_match_reference(ref):
    f = _gentle_frame()
    ours = find_source_points(CURVELANES, f["egoleft_lane"],
                              f["egoright_lane"])
    theirs = ref.findSourcePointsBEV(h=400, w=800,
                                     egoleft=f["egoleft_lane"],
                                     egoright=f["egoright_lane"])
    for k in ("LS", "RS", "LE", "RE", "midanchor_start"):
        assert tuple(ours[k]) == tuple(theirs[k]), k
    assert ours["ego_h"] == pytest.approx(theirs["ego_h"])


@pytest.mark.ref_parity
def test_transform_and_sides_match_reference(ref):
    cfg = CURVELANES
    f = _gentle_frame()
    sps = find_source_points(cfg, f["egoleft_lane"], f["egoright_lane"])
    H = bev_homography(cfg, sps)

    img = np.zeros((400, 800, 3), np.uint8)
    (_, ref_bev, ref_reproj, ref_flags, ref_valid, ref_mat,
     ok) = ref.transformBEV(img=img, line=f["drivable_path"], sps=sps)
    assert ok

    # same homography up to the cv2/DLT numeric path
    np.testing.assert_allclose(H, ref_mat, rtol=1e-6, atol=1e-6)

    bev, reproj, flags, validity, ok2 = transform_bev(
        cfg, f["drivable_path"], sps, H)
    assert ok2
    assert flags == ref_flags and validity == ref_valid
    np.testing.assert_allclose(np.asarray(bev, np.float64),
                               np.asarray(ref_bev, np.float64), atol=1e-6)
    assert [tuple(p) for p in reproj] == [tuple(p) for p in ref_reproj]

    off = transformed_distance(sps["LS"], sps["midanchor_start"], H)
    ref_off = ref.calTransformedDistance(sps["LS"], sps["midanchor_start"],
                                         ref_mat)
    assert off == pytest.approx(ref_off, rel=1e-6)

    for sign in (-1.0, +1.0):
        bev_s, orig_s, flags_s, val_s = ego_side(cfg, bev, sign * off, H)
        rb, ro, rf, rv = ref.calEgoSide(ref_bev, sign * ref_off, ref_mat)
        assert [tuple(p) for p in bev_s] == [tuple(p) for p in rb]
        assert [tuple(p) for p in orig_s] == [tuple(p) for p in ro]
        assert flags_s == rf and val_s == rv


@pytest.mark.ref_parity
def test_anchor_angle_matches_reference(ref):
    line = [(320.0, 1280.0), (330.0, 1150.0), (345.0, 1020.0)]
    assert anchor_angle(line) == pytest.approx(ref.calAngle(line))
