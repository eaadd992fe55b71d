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


# ---- Mapillary (SceneSeg / DomainSeg / Lite roles) -------------------------

def test_mapillary_sceneseg_lut_and_validity():
    from autoware_vision_pilot_tpu.data_parsing.mapillary import (
        mapillary_ids_to_sceneseg)
    from autoware_vision_pilot_tpu.train.datasets import SCENESEG_COLOURS

    ids = np.zeros((8, 8), np.uint8)
    ids[0] = 27          # sky
    ids[1] = 13          # road
    ids[2] = 55          # car
    ids[3] = 19          # person
    ids[4] = 2           # curb
    rgb, valid = mapillary_ids_to_sceneseg(ids)
    assert tuple(rgb[0, 0]) == SCENESEG_COLOURS["sky"]
    assert tuple(rgb[1, 0]) == SCENESEG_COLOURS["road"]
    assert tuple(rgb[2, 0]) == SCENESEG_COLOURS["large_mobile_vehicle"]
    assert tuple(rgb[3, 0]) == SCENESEG_COLOURS["vulnerable_living"]
    assert tuple(rgb[4, 0]) == SCENESEG_COLOURS["road_edge_delimiter"]
    assert valid  # road (8 px) > other-drivable (0 px), no snow

    ids_snow = ids.copy()
    ids_snow[5, 0] = 28  # one snow pixel invalidates
    _, valid = mapillary_ids_to_sceneseg(ids_snow)
    assert not valid

    ids_lot = np.full((8, 8), 10, np.uint8)  # all parking, no road
    _, valid = mapillary_ids_to_sceneseg(ids_lot)
    assert not valid


def test_mapillary_v2_roadwork_binary():
    from autoware_vision_pilot_tpu.data_parsing.mapillary import (
        mapillary_v2_to_roadwork)

    m = np.zeros((6, 6, 3), np.uint8)
    m[1, 1] = (210, 60, 60)     # traffic cone
    m[2, 2] = (250, 170, 35)    # temporary barrier
    mask, present = mapillary_v2_to_roadwork(m)
    assert present and mask[1, 1] == 255 and mask[2, 2] == 255
    assert mask.sum() == 2 * 255
    mask, present = mapillary_v2_to_roadwork(np.zeros((4, 4, 3), np.uint8))
    assert not present and mask.sum() == 0


def test_mapillary_to_cityscapes_trainids():
    from autoware_vision_pilot_tpu.data_parsing.mapillary import (
        mapillary_to_cityscapes_trainids)

    names = ["construction--flat--road", "nature--sky", "human--person",
             "void--unlabeled"]
    ids = np.array([[0, 1], [2, 3]], np.uint8)
    out = mapillary_to_cityscapes_trainids(ids, names)
    np.testing.assert_array_equal(out, [[0, 10], [11, 255]])


# ---- Depth family: DrivingStereo / Argoverse / DDAD ------------------------

def test_drivingstereo_sample():
    from autoware_vision_pilot_tpu.data_parsing.depth_datasets import (
        drivingstereo_sample)

    h, w = 20, 120
    depth = np.zeros((h, w), np.uint16)
    depth[10, 60] = 20 * 256     # 20 m at center
    img = np.zeros((h, w, 3), np.uint8)
    im, dense, valid = drivingstereo_sample(img, depth)
    assert im.shape == (h, w - 80, 3)        # 40 px side crops
    assert dense.shape == (h, w - 80)
    assert abs(dense[10, 20] - 20.0) < 1e-6  # u=60 -> cropped 20
    assert valid.max() == 1


def test_argoverse_disparity_to_depth():
    from autoware_vision_pilot_tpu.data_parsing.depth_datasets import (
        argoverse_depth_from_disparity, parse_argoverse_calib)

    disp = np.zeros((4, 4), np.uint16)
    disp[1, 1] = 2 * 256         # disparity 2 px
    disp[2, 2] = 60000           # huge disparity -> tiny depth, kept
    f = 1000.0
    d = argoverse_depth_from_disparity(disp, f)
    assert abs(d[1, 1] - f * 0.2986 / 2.0) < 1e-4
    assert d[0, 0] == 0.0        # invalid disparity stays empty
    calib = {"camera_data_": [
        {"key": "image_raw_stereo_front_left_rect",
         "value": {"focal_length_y_px_": 1685.0}}]}
    assert parse_argoverse_calib(calib) == 1685.0


def test_ddad_sample_crop():
    from autoware_vision_pilot_tpu.data_parsing.depth_datasets import (
        ddad_sample, DDAD_CROP)

    img = np.zeros((1216, 1936, 3), np.uint8)
    sparse = np.zeros((1216, 1936), np.float32)
    sparse[500, 900] = 35.0
    im, dense, valid = ddad_sample(img, sparse)
    l, t, r, b = DDAD_CROP
    assert im.shape == (b - t, r - l, 3)
    assert abs(dense[500 - t, 900 - l] - 35.0) < 1e-6


# ---- Jiqing / Once3DLane ----------------------------------------------------

def test_jiqing_parse_and_ego_classification():
    from autoware_vision_pilot_tpu.data_parsing.jiqing_once3d import (
        parse_jiqing_gt)

    # three near-vertical lanes: ego-left x~800, ego-right x~1100,
    # other x~300 (anchors in file order, first anchor >= 960 is #2's)
    gt = ("lane_1: (790.0, 500.0)(800.0, 900.0)\n"
          "lane_2: (1090.0, 500.0)(1100.0, 900.0)\n"
          "lane_3: (290.0, 500.0)(300.0, 900.0)\n")
    # reorder so anchors ascend in file order (reference assumption)
    gt = ("l: (290.0, 500.0)(300.0, 900.0)\n"
          "l: (790.0, 500.0)(800.0, 900.0)\n"
          "l: (1090.0, 500.0)(1100.0, 900.0)\n")
    rec = parse_jiqing_gt(gt)
    assert rec is not None
    assert rec["mask"].shape == (960, 1920, 3)     # 1080 - 120 crop
    # ego-left channel covers x~800, ego-right x~1100, other x~300
    assert rec["mask"][700, 795:805, 0].max() == 255
    assert rec["mask"][700, 1095:1105, 1].max() == 255
    assert rec["mask"][700, 295:305, 2].max() == 255
    assert rec["egoleft_lane"][0][0] > 700


def test_once3d_projection_and_filters():
    from autoware_vision_pilot_tpu.data_parsing.jiqing_once3d import (
        parse_once3d_entry)

    # simple pinhole: f=1000, cx=960, cy=510 — two straight 3D lanes
    K = [[1000.0, 0.0, 960.0], [0.0, 1000.0, 510.0], [0.0, 0.0, 1.0]]

    def lane3d(x_m):
        # points from 4 m to 40 m ahead at lateral x_m, 1.5 m below cam
        zs = np.linspace(4, 40, 12)
        return [[x_m, 1.5, z] for z in zs]

    entry = {"lane_num": 2, "calibration": K,
             "lanes": [lane3d(-1.8), lane3d(1.8)]}
    rec = parse_once3d_entry(entry)
    assert rec is not None
    # left lane projects left of center at bottom
    assert rec["egoleft_lane"][0][0] < 960 < rec["egoright_lane"][0][0]
    assert rec["mask"].shape == (1020, 1920, 3)

    # fewer than 2 lanes -> rejected
    assert parse_once3d_entry({"lane_num": 1, "calibration": K,
                               "lanes": [lane3d(0)]}) is None


# ---- Comma2k19 --------------------------------------------------------------

def test_comma2k19_straight_path_projection():
    from autoware_vision_pilot_tpu.data_parsing.comma2k19 import (
        drivable_path_points, quat_to_rot, euler_to_quat,
        geodetic_to_ecef, rasterize_drivable_path)

    # quaternion round trip sanity
    q = euler_to_quat(np.array([0.05, -0.02, 0.4]))
    R = quat_to_rot(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    assert abs(np.linalg.det(R) - 1) < 1e-10

    # WGS84: equator/prime-meridian -> (a, 0, 0)
    ecef = geodetic_to_ecef([0.0, 0.0, 0.0])
    np.testing.assert_allclose(ecef, [6378137.0, 0, 0], atol=1e-6)

    # synthetic drive: straight north at the equator, identity device
    # orientation (device x = ECEF x is forward... use local frame device:
    # x fwd, y right, z down, driving along ECEF +y)
    n = 300
    t = np.linspace(0, 120, n)  # 120 m
    pos = np.stack([np.full(n, 6378137.0), t, np.zeros(n)], -1)
    # device frame: x->+y(fwd), y->-z?? — orientation quaternion maps
    # device->ECEF: columns are device axes in ECEF. fwd=+y, right=-x? use
    # fwd=+y_ecef, down=-x_ecef (toward earth center), right = fwd x down
    fwd = np.array([0, 1, 0.0])
    down = np.array([-1, 0, 0.0])
    right = np.cross(down, fwd)   # = (0,0,-1)? check handedness below
    Rdev = np.stack([fwd, np.cross(down, fwd), down], -1)
    # orthonormal & right-handed?
    assert abs(np.linalg.det(Rdev) - 1) < 1e-9
    # rot -> quat via scipy-free path: build from matrix using trace
    w = np.sqrt(max(0, 1 + Rdev[0, 0] + Rdev[1, 1] + Rdev[2, 2])) / 2
    x = (Rdev[2, 1] - Rdev[1, 2]) / (4 * w)
    y = (Rdev[0, 2] - Rdev[2, 0]) / (4 * w)
    z = (Rdev[1, 0] - Rdev[0, 1]) / (4 * w)
    quat = np.array([w, x, y, z])
    quats = np.tile(quat, (n, 1))
    pts = drivable_path_points(0, pos, quats)
    assert pts is not None
    # straight-ahead path: centered horizontally, reaches image bottom
    assert pts[0][1] == 524                   # extrapolated to bottom
    assert 450 < pts[0][0] < 600              # near center (524 = w/2)
    mask = rasterize_drivable_path(pts)
    assert mask.shape == (524, 1048) and mask.max() == 255


# ---- ZOD --------------------------------------------------------------------

def test_zod_curvature_and_path_azimuth():
    from autoware_vision_pilot_tpu.data_parsing.zod import (
        curvature_from_steering, path_azimuth_at_range, WHEELBASE_M,
        STEERING_COLUMN_RATIO)

    # straight wheel -> zero curvature
    assert curvature_from_steering(0.0) == 0.0
    k = curvature_from_steering(0.168)  # 0.168 rad wheel = 0.01 rad tyre
    assert abs(k - np.tan(0.01) / WHEELBASE_M) < 1e-12
    # path azimuth: small-angle az ~ k*r/2 (NOT k*r)
    az = path_azimuth_at_range(0.01, 10.0)
    assert abs(az - 0.05) < 1e-3
    assert path_azimuth_at_range(0.0, 50.0) == 0.0


def test_zod_radar_clustering_and_cipo():
    from autoware_vision_pilot_tpu.data_parsing.zod import (
        cluster_radar_points, find_cipo_on_path, make_autodrive_label)

    rng = np.random.default_rng(4)
    # cluster A: on-path car at 30 m ahead; cluster B: off-path at y=8 m
    ax = 30 + rng.normal(0, 0.2, 6)
    ay = rng.normal(0, 0.1, 6)
    bx = 25 + rng.normal(0, 0.2, 6)
    by = 8 + rng.normal(0, 0.1, 6)
    x = np.concatenate([ax, bx])
    y = np.concatenate([ay, by])
    z = np.zeros(12)
    v = np.concatenate([np.full(6, -2.0), np.full(6, 0.0)])
    clusters = cluster_radar_points(x, y, z, v)
    assert len(clusters) == 2
    cipo = find_cipo_on_path(clusters, curvature_inv_m=0.0)
    assert cipo is not None and abs(cipo["range"] - 30) < 1.0
    lbl = make_autodrive_label(cipo, 0.0)
    assert lbl["flag"] == 1 and abs(lbl["d_norm"] - 30 / 200) < 0.01
    lbl0 = make_autodrive_label(None, 0.01)
    assert lbl0["flag"] == 0 and lbl0["d_norm"] == 0.0
