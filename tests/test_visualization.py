"""Visualization parity: steering-wheel composite, BEV debug view, lane
departure banner, AutoSteer graph viz, mass-video sweep. Image-diff smoke
tests (pixels actually change where the reference draws them)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from autoware_vision_pilot_tpu.utils.visualization import (
    make_steering_wheel_image, rotate_steering_wheel, overlay_alpha,
    visualize_steering, show_lane_departure_warning, gen_bev_points,
    draw_bev_vis,
)


def test_steering_wheel_sprite_and_rotation():
    wheel = make_steering_wheel_image(128)
    assert wheel.shape == (128, 128, 4)
    assert wheel[..., 3].max() == 255          # opaque rim
    assert wheel[0, 0, 3] == 0                 # transparent corner

    rot0 = rotate_steering_wheel(wheel, 0.0)
    rot90 = rotate_steering_wheel(wheel, 90.0)
    # half-res resize (visualize.cpp:866)
    assert rot0.shape == (64, 64, 4)
    # rotation actually changes the sprite (spokes are not 90-symmetric)
    assert np.abs(rot0.astype(int) - rot90.astype(int)).sum() > 0
    # empty input contract
    assert rotate_steering_wheel(np.zeros((0, 0, 4), np.uint8), 10.0).size \
        == 0


def test_overlay_alpha_blend_and_bounds():
    img = np.full((100, 100, 3), 200, np.uint8)
    spr = np.zeros((20, 20, 4), np.uint8)
    spr[..., 2] = 255     # red
    spr[..., 3] = 255     # opaque
    before = img.copy()
    overlay_alpha(img, spr, 5, 5)
    assert (img[5:25, 5:25, 2] == 255).all()
    assert (img[5:25, 5:25, 0] == 0).all()
    # out-of-bounds placement is a silent no-op (visualizeWheel contract)
    img2 = before.copy()
    overlay_alpha(img2, spr, 95, 95)
    np.testing.assert_array_equal(img2, before)
    # 50% alpha blends halfway
    spr[..., 3] = 128
    img3 = np.zeros((30, 30, 3), np.uint8)
    overlay_alpha(img3, spr, 0, 0)
    assert 120 <= img3[10, 10, 2] <= 136


def test_visualize_steering_composite():
    img = np.zeros((200, 400, 3), np.uint8)
    wheel = make_steering_wheel_image(96)
    rp = rotate_steering_wheel(wheel, -12.5)
    rg = rotate_steering_wheel(wheel, -10.0)
    out = visualize_steering(img, -12.5, rp, gt_steering_angle=-10.0,
                             rotated_gt_wheel=rg)
    # pred wheel at (10,10), GT wheel at (w-80,10), both texts drawn
    assert out[10:58, 10:58].sum() > 0
    assert out[10:58, 320:368].sum() > 0
    assert out[85:105, 10:250].sum() > 0       # "Predicted angle" text row


def test_lane_departure_banner():
    img = np.zeros((200, 640, 3), np.uint8)
    out = show_lane_departure_warning(img)
    # rectangle outline at the centered banner position
    assert out[20, 220:420].sum() > 0


def test_gen_bev_points_quadratic():
    # x = 0.001*y^2 + 0*y + 100, valid y in [100, 500]
    coeffs = [0.0, 0.001, 0.0, 100.0, 100.0, 500.0]
    pts = gen_bev_points(coeffs)
    assert pts[:, 1].min() == 100 and pts[:, 1].max() == 500
    y = 300
    x_expected = 0.001 * y * y + 100
    row = pts[pts[:, 1] == y]
    assert abs(row[0, 0] - int(x_expected)) <= 1
    # short coeffs -> empty
    assert gen_bev_points([1, 2]).shape == (0, 2)


def test_draw_bev_vis_smoke():
    frame = np.random.default_rng(0).integers(
        0, 255, (300, 640, 3), dtype=np.uint8)
    H = np.eye(3)
    out = draw_bev_vis(frame, H,
                       bev_left_coeffs=[0, 0, 0, 220.0, 0, 639],
                       bev_right_coeffs=[0, 0, 0, 420.0, 0, 639],
                       bev_center_coeffs=[0, 0, 0, 320.0, 0, 639],
                       valid=True, last_valid_width_pixels=200.0)
    assert out.shape == (640, 640, 3)
    # left lane drawn blue-ish at x=220
    assert out[100, 218:223, 0].max() > 200
    # width bar white at y=600
    assert out[600, 320, :].min() > 200
    # invalid path renders the waiting banner, no lanes
    out2 = draw_bev_vis(frame, H, valid=False)
    assert out2.shape == (640, 640, 3)


def test_steering_graph_viz(tmp_path):
    from autoware_vision_pilot_tpu.utils.video_viz import (
        visualize_steering_graph)
    gt = np.sin(np.linspace(0, 3, 50)) * 10
    pred = gt + np.random.default_rng(1).normal(0, 0.5, 50)
    out = tmp_path / "graph.png"
    visualize_steering_graph(gt, pred, str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_mass_visualize_videos(tmp_path, monkeypatch):
    """Directory sweep calls visualize_video per .mp4 and collects
    outputs (mass_test_vid_inference analog) — model inference stubbed."""
    import autoware_vision_pilot_tpu.utils.video_viz as vv

    (tmp_path / "vids").mkdir()
    for name in ("a.mp4", "b.mp4", "skip.txt"):
        (tmp_path / "vids" / name).write_bytes(b"x")
    calls = []

    def fake_visualize(model, path, out, checkpoint="", max_frames=None):
        calls.append((model, path, out))
        return 3

    monkeypatch.setattr(vv, "visualize_video", fake_visualize)
    done = vv.mass_visualize_videos("EgoLanes", str(tmp_path / "vids"),
                                    str(tmp_path / "out"))
    assert len(done) == 2 and len(calls) == 2
    assert done[0][0] == "a.mp4" and done[0][1].endswith("a.avi")


def test_compose_display_frame():
    """The app's unified display composite annotates the raw frame
    (lane overlay + HUD + steering wheel) without mutating the input."""
    import numpy as np
    from autoware_vision_pilot_tpu.app import compose_display_frame
    from autoware_vision_pilot_tpu.runtime.pipeline import FrameResult
    from autoware_vision_pilot_tpu.utils import visualization as viz

    frame = np.full((720, 1280, 3), 40, np.uint8)
    masks = np.zeros((80, 160, 3), np.float32)
    masks[40:, 30:40, 0] = 1.0
    res = FrameResult(frame_num=3, steering_deg=-12.5, set_speed=8.0,
                      fcw=True, lane_departure=True)
    wheel = viz.make_steering_wheel_image()
    out = compose_display_frame(
        res, {"lane_masks": masks}, None, frame, wheel, fps=42.0)
    assert out.shape == frame.shape and out.dtype == np.uint8
    assert (frame == 40).all()            # input untouched
    assert (out != frame).any()           # overlay drawn


def test_unified_display_frame_reference_order():
    """The unified composite (main.cpp:881-974 overlay order): display
    resize to 1280x720, CIPO HUD only when a CIPO exists, safety alerts,
    sync labels."""
    import numpy as np
    from autoware_vision_pilot_tpu.utils import visualization as viz

    frame = np.full((720, 1280, 3), 30, np.uint8)
    masks = np.zeros((80, 160, 3), np.float32)
    masks[40:, 60:70, 1] = 1.0
    wheel = viz.make_steering_wheel_image()

    base = viz.unified_display_frame(
        frame, masks, steering_deg=5.0, wheel_pred=wheel,
        frame_num=7, display_wh=(1280, 720))
    assert base.shape == (720, 1280, 3)
    assert (frame == 30).all()            # input untouched

    with_hud = viz.unified_display_frame(
        frame, masks, steering_deg=5.0, wheel_pred=wheel,
        cipo_exists=True, ideal_speed_ms=12.3, safe_distance_m=18.0,
        control_effort_ms2=-1.2, fcw=True, frame_num=7)
    # the CIPO HUD + FCW text lives in the top strip; it must differ
    # from the no-CIPO composite there
    assert (with_hud[:130, 900:] != base[:130, 900:]).any()
    assert (with_hud[:130, 300:800] != base[:130, 300:800]).any()  # FCW


def test_unified_display_gt_wheel():
    import numpy as np
    from autoware_vision_pilot_tpu.utils import visualization as viz
    frame = np.full((720, 1280, 3), 30, np.uint8)
    wheel = viz.make_steering_wheel_image()
    no_gt = viz.unified_display_frame(frame, None, wheel_pred=wheel,
                                      steering_deg=3.0)
    with_gt = viz.unified_display_frame(frame, None, wheel_pred=wheel,
                                        wheel_gt=wheel, steering_deg=3.0,
                                        gt_steering_deg=-20.0)
    # GT wheel renders top-right only when a GT angle is provided
    assert (no_gt[:120, -120:] != with_gt[:120, -120:]).any()


def test_frame_sync_buffer_matches_and_trims():
    """FrameSyncBuffer == the reference's lateral/long buffer maps with
    the >10-frame lag cleanup (main.cpp:868-888, 1112-1118)."""
    from autoware_vision_pilot_tpu.utils.visualization import (
        FrameSyncBuffer)

    b = FrameSyncBuffer(max_lag=3)
    b.push_lateral(1, "L1")
    b.push_lateral(2, "L2")
    assert b.pop_synced() == []
    b.push_longitudinal(2, "G2")
    assert b.pop_synced() == [(2, "L2", "G2")]
    # frame 1 lateral still waits; lag cleanup evicts the oldest when
    # one side runs ahead
    for n in range(3, 8):
        b.push_lateral(n, f"L{n}")
    assert 1 not in b._lat and len(b._lat) == 3
    b.push_longitudinal(7, "G7")
    assert b.pop_synced() == [(7, "L7", "G7")]
