"""Dataset parsers on synthetic fixtures of each annotation format."""
import json
import numpy as np

from autoware_vision_pilot_tpu.data_parsing import (
    rasterize_lanes, parse_tusimple_label, parse_culane_lines,
    bdd100k_drivable_to_sceneseg, lidar_depth_fill, write_unified_sample,
)
from autoware_vision_pilot_tpu.data_parsing.common import classify_ego_lanes
from autoware_vision_pilot_tpu.train.datasets import (
    decode_scene_seg_mask, SCENESEG_COLOURS)


def test_tusimple_parse():
    rec = {"lanes": [[-2, 100, 120, 140], [-2, 500, 520, 540]],
           "h_samples": [200, 240, 280, 320], "raw_file": "clips/a.jpg"}
    out = parse_tusimple_label(json.dumps(rec))
    assert len(out["lanes"]) == 2
    np.testing.assert_allclose(out["lanes"][0][0], [100, 240])
    assert out["raw_file"] == "clips/a.jpg"


def test_culane_parse():
    text = "10.0 590 50 400 90 200\n800 590 700 400\n"
    lanes = parse_culane_lines(text)
    assert len(lanes) == 2
    assert lanes[0].shape == (3, 2)


def test_classify_and_rasterize():
    # left lane near x=200, right near x=500, another far right
    left = np.array([[200, 300], [210, 100]], np.float32)
    right = np.array([[500, 300], [490, 100]], np.float32)
    other = np.array([[620, 300], [610, 100]], np.float32)
    li, ri = classify_ego_lanes([left, right, other], 640)
    assert (li, ri) == (0, 1)
    masks = rasterize_lanes([left, right, other], (320, 640))
    assert masks.shape == (320, 640, 3)
    assert masks[..., 0].sum() > 0 and masks[..., 1].sum() > 0
    assert masks[..., 2].sum() > 0
    # ego-left mask is on the left half
    ys, xs = np.where(masks[..., 0] > 0)
    assert xs.mean() < 320


def test_bdd100k_color_mapping_roundtrip():
    ids = np.zeros((8, 8), np.uint8)
    ids[0] = 0    # road
    ids[1] = 13   # car
    ids[2] = 10   # sky
    rgb = bdd100k_drivable_to_sceneseg(ids)
    assert tuple(rgb[0, 0]) == SCENESEG_COLOURS["road"]
    dec, w = decode_scene_seg_mask(rgb)
    assert (dec[0] == 2).all()   # road
    assert (dec[1] == 1).all()   # foreground
    assert (dec[2] == 0).all()   # sky -> background


def test_lidar_depth_fill():
    sparse = np.zeros((32, 32), np.float32)
    sparse[8, 8] = 5.0
    sparse[20, 25] = 12.0
    dense = lidar_depth_fill(sparse)
    assert (dense > 0).all()
    assert dense[8, 8] == 5.0 and dense[20, 25] == 12.0


def test_write_unified_sample(tmp_path):
    img = np.zeros((16, 16, 3), np.uint8)
    lab = np.zeros((16, 16, 3), np.uint8)
    lab[:] = SCENESEG_COLOURS["road"]
    write_unified_sample(tmp_path, "s0", img, lab)
    assert (tmp_path / "images" / "s0.png").exists()
    import cv2
    back = cv2.cvtColor(cv2.imread(str(tmp_path / "labels" / "s0.png")),
                        cv2.COLOR_BGR2RGB)
    assert tuple(back[0, 0]) == SCENESEG_COLOURS["road"]


def test_cityscapes_labelids_mapping():
    from autoware_vision_pilot_tpu.data_parsing.cityscapes_like import (
        cityscapes_labelids_to_sceneseg)
    ids = np.zeros((4, 4), np.uint8)
    ids[0] = 7    # road
    ids[1] = 26   # car
    ids[2] = 23   # sky
    rgb = cityscapes_labelids_to_sceneseg(ids)
    dec, _ = decode_scene_seg_mask(rgb)
    assert (dec[0] == 2).all() and (dec[1] == 1).all() and (dec[2] == 0).all()


def test_openlane_cipo_parse():
    from autoware_vision_pilot_tpu.data_parsing.openlane import (
        parse_openlane_cipo)
    rec = {"raw_file": "a.jpg", "results": [
        {"cipo_level": 1, "box2d": {"x1": 10, "y1": 20, "x2": 50, "y2": 60}},
        {"cipo_level": 5, "box2d": {"x1": 0, "y1": 0, "x2": 5, "y2": 5}},
        {"cipo_level": 2, "box2d": [100, 100, 150, 140]},
        {"cipo_level": 3, "box2d": [7, 7, 7, 7]},
    ]}
    import json
    out = parse_openlane_cipo(json.dumps(rec))
    assert out["boxes"].shape == (2, 4)
    assert list(out["labels"]) == [0, 1]


def test_kitti_depth_projection():
    from autoware_vision_pilot_tpu.data_parsing.kitti_depth import (
        velodyne_to_depth)
    # identity-ish calibration: camera at velodyne origin, x right, y down
    P2 = np.array([[100.0, 0, 32, 0], [0, 100.0, 24, 0], [0, 0, 1, 0]])
    R0 = np.eye(3)
    Tr = np.hstack([np.eye(3), np.zeros((3, 1))])
    pts = np.array([[0.0, 0.0, 10.0], [1.0, 0.5, 20.0]])
    d = velodyne_to_depth(pts, P2, R0, Tr, (48, 64), fill=False)
    assert abs(d[24, 32] - 10.0) < 1e-6
    # second point at u=100*1/20+32=37, v=100*0.5/20+24=26.5->26 (round)
    assert abs(d[26, 37] - 20.0) < 1e-6 or abs(d[27, 37] - 20.0) < 1e-6


def test_ground_reprojection_roundtrip():
    from autoware_vision_pilot_tpu.data_parsing.reprojection import (
        project_points, image_to_ground, ground_to_bev_pixels)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    # camera 1.5m above ground looking forward; ground point 10m ahead,
    # 2m right: camera frame (x=2, y=1.5 [down], z=10)
    pt_cam = np.array([[2.0, 1.5, 10.0]])
    px = project_points(pt_cam, K)
    back = image_to_ground(px, K, np.eye(3), cam_height=1.5)
    np.testing.assert_allclose(back[0], [2.0, 10.0], atol=1e-9)
    bev = ground_to_bev_pixels(back)
    np.testing.assert_allclose(bev[0], [320 + 2 * 16, 640 - 160], atol=1e-6)


def test_curvelanes_parse():
    from autoware_vision_pilot_tpu.data_parsing.curvelanes import (
        parse_curvelanes_label)
    rec = {"Lines": [
        [{"x": "100.0", "y": "500.0"}, {"x": "120.5", "y": "300.0"}],
        [{"x": "800", "y": "500"}],
    ]}
    import json
    lanes = parse_curvelanes_label(json.dumps(rec))
    assert len(lanes) == 1  # single-point line dropped
    # sorted by y
    assert lanes[0][0, 1] <= lanes[0][1, 1]


def test_roadwork_polygons():
    from autoware_vision_pilot_tpu.data_parsing.roadwork import (
        parse_roadwork_annotation, polygons_to_binary_mask)
    import json
    rec = {"annotations": [
        {"segmentation": [[10, 10, 50, 10, 50, 40, 10, 40]]},
    ]}
    polys = parse_roadwork_annotation(json.dumps(rec))
    assert len(polys) == 1
    m = polygons_to_binary_mask(polys, (64, 64))
    assert m[20, 30] == 1.0 and m[5, 5] == 0.0
