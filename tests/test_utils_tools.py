"""Tests for the auxiliary host tools: RerunLogger contract, interactive
camera selection, manual GT-audit session (reference parity:
src/rerun/rerun_logger.cpp, src/camera/camera_utils.cpp:140-270,
Models/data_utils/manual_audit_app.py)."""
from __future__ import annotations

import pathlib
import sys
import types

import numpy as np
import pytest

from autoware_vision_pilot_tpu.utils import rerun_logger as rl_mod
from autoware_vision_pilot_tpu.utils.manual_audit import AuditSession
from autoware_vision_pilot_tpu.drivers.camera import (
    CameraInfo, select_camera, print_driver_instructions)


# ---------------------------------------------------------------- rerun

def test_rerun_logger_noop_without_sdk(capsys):
    """Without the SDK the logger must be a silent no-op (ENABLE_RERUN
    off contract): constructing and logging cannot raise."""
    logger = rl_mod.RerunLogger.__new__(rl_mod.RerunLogger)
    logger.enabled = False
    logger.log_data(0, frame_bgr=np.zeros((4, 4, 3), np.uint8),
                    autosteer_deg=1.0)


def _fake_sdk(calls):
    return types.SimpleNamespace(
        init=lambda app_id: calls.append(("init", app_id)),
        spawn=lambda: calls.append(("spawn",)),
        save=lambda p: calls.append(("save", p)),
        set_time_sequence=lambda n, v: calls.append(("seq", n, v)),
        log=lambda path, obj: calls.append(("log", path, obj)),
        Image=lambda a: ("img", a.shape),
        Scalar=lambda v: ("scalar", float(v)),
    )


def test_rerun_logger_full_signal_set(monkeypatch):
    """With a (fake) SDK present, the FULL reference logData channel list
    (rerun_logger.cpp:81-146) is logged under identical entity paths:
    per-lane masks, stacked view, CAN pair, raw/filtered PID + AutoSteer
    angles, PathFinder triple, inference ms."""
    calls = []
    monkeypatch.setattr(rl_mod, "rr", _fake_sdk(calls))
    monkeypatch.setattr(rl_mod, "_HAS_RERUN", True)

    logger = rl_mod.RerunLogger(save_path="/tmp/x.rrd")
    logger.log_data(
        7, frame_bgr=np.zeros((320, 640, 3), np.uint8),
        ego_left=np.zeros((80, 160), np.float32),
        ego_right=np.zeros((80, 160), np.float32),
        other_lanes=np.zeros((80, 160), np.float32),
        stacked_view_bgr=np.zeros((720, 1280, 3), np.uint8),
        can_steering_deg=4.5, can_speed_kmph=88.0, can_valid=True,
        pid_steering_raw_deg=3.5, pid_steering_filtered_deg=3.0,
        autosteer_deg=2.0, cte=0.1, yaw_error=0.05, curvature=0.01,
        fused_valid=True, inference_us=5000.0)

    assert ("init", "visionpilot_tpu") in calls
    assert ("save", "/tmp/x.rrd") in calls
    assert ("seq", "frame", 7) in calls
    logged = {c[1]: c[2] for c in calls if c[0] == "log"}
    assert set(logged) == {
        "camera/image", "lanes/ego_left", "lanes/ego_right", "lanes/other",
        "visualization/stacked_view", "can/steering_angle_deg",
        "can/speed_kmph", "control/pid_steering_raw_deg",
        "control/pid_steering_filtered_deg", "control/autosteer_angle_deg",
        "pathfinder/cte", "pathfinder/yaw_error", "pathfinder/curvature",
        "metrics/inference_time_ms"}
    assert logged["can/speed_kmph"] == ("scalar", 88.0)
    assert logged["metrics/inference_time_ms"] == ("scalar", 5.0)


def test_rerun_logger_gating(monkeypatch):
    """Invalid CAN logs 0.0 (rerun_logger.cpp:113-120); invalid PathFinder
    fuse drops the pathfinder channels (:131-139); no sink -> disabled
    (:22-25)."""
    calls = []
    monkeypatch.setattr(rl_mod, "rr", _fake_sdk(calls))
    monkeypatch.setattr(rl_mod, "_HAS_RERUN", True)

    assert not rl_mod.RerunLogger().enabled  # no viewer, no save path

    logger = rl_mod.RerunLogger(save_path="/tmp/y.rrd")
    logger.log_data(1, can_steering_deg=4.5, can_speed_kmph=88.0,
                    can_valid=False, cte=0.1, yaw_error=0.05,
                    curvature=0.01, fused_valid=False)
    logged = {c[1]: c[2] for c in calls if c[0] == "log"}
    assert logged["can/steering_angle_deg"] == ("scalar", 0.0)
    assert logged["can/speed_kmph"] == ("scalar", 0.0)
    assert not any(p.startswith("pathfinder/") for p in logged)


def test_make_stacked_view_layout():
    """Composite layout of main.cpp:1286-1328: left col = debug over
    final resized to window height; right col = BEV on black canvas."""
    from autoware_vision_pilot_tpu.utils.visualization import (
        make_stacked_view)
    debug = np.full((320, 640, 3), 10, np.uint8)
    final = np.full((320, 640, 3), 20, np.uint8)
    bev = np.full((640, 640, 3), 30, np.uint8)
    view = make_stacked_view(debug, final, bev, window_height=720)
    assert view.shape == (720, 720 + 640, 3)
    assert view[10, 10].tolist() == [10, 10, 10]      # debug top-left
    assert view[710, 10].tolist() == [20, 20, 20]     # final bottom-left
    assert view[10, 730].tolist() == [30, 30, 30]     # BEV top-right
    assert view[700, 730].tolist() == [0, 0, 0]       # black filler


# --------------------------------------------------------------- camera

def _devs():
    return [CameraInfo(0, "/dev/video0", "FakeCam A", 1280, 720, 30.0),
            CameraInfo(2, "/dev/video2", "FakeCam B", 640, 480, 0.0)]


def test_select_camera_by_index():
    out = []
    got = select_camera(input_fn=lambda prompt: "1",
                        print_fn=out.append, devices=_devs())
    assert got is not None and got.index == 2
    listing = "\n".join(out)
    assert "/dev/video0" in listing and "1280x720" in listing
    assert "@ 30 fps" in listing


def test_select_camera_quit_and_invalid():
    assert select_camera(input_fn=lambda p: "q", print_fn=lambda s: None,
                         devices=_devs()) is None
    assert select_camera(input_fn=lambda p: "zzz", print_fn=lambda s: None,
                         devices=_devs()) is None
    assert select_camera(input_fn=lambda p: "9", print_fn=lambda s: None,
                         devices=_devs()) is None


def test_select_camera_no_devices_prints_driver_help():
    out = []
    assert select_camera(input_fn=lambda p: "0", print_fn=out.append,
                         devices=[]) is None
    assert any("Driver" in line for line in out)


# --------------------------------------------------------- manual audit

def _image_folder(tmp_path, n=4):
    import cv2
    for i in range(n):
        cv2.imwrite(str(tmp_path / f"f{i:03d}.png"),
                    np.full((8, 8, 3), i * 10, np.uint8))
    return tmp_path


def test_audit_session_accept_reject_and_resume(tmp_path):
    folder = _image_folder(tmp_path)
    s = AuditSession(folder)
    assert s.current == "f000.png"
    s.accept()
    s.reject()
    s.save()
    assert s.summary() == {"accepted": 1, "rejected": 1,
                           "remaining": 2, "total": 4}

    # resume mid-session (reference select_folder_and_resume :105)
    s2 = AuditSession(folder)
    assert s2.current_index == 2
    assert s2.accepted == ["f000.png"] and s2.rejected == ["f001.png"]
    s2.accept()
    s2.accept()
    assert s2.done and s2.current is None
    s2.accept()  # past the end: no-op
    assert s2.summary()["accepted"] == 3


def test_audit_session_back_undoes_last_decision(tmp_path):
    folder = _image_folder(tmp_path)
    s = AuditSession(folder)
    s.accept()
    s.reject()
    s.back()
    assert s.current == "f001.png"
    assert s.rejected == [] and s.accepted == ["f000.png"]
    s.back()
    s.back()  # at index 0: no-op
    assert s.current_index == 0 and s.accepted == []


@pytest.mark.heavy
def test_debug_autosteer_harness(tmp_path, capsys):
    """N26 harness smoke: runs EgoLanes raw logits -> temporal AutoSteer
    over a tiny synthetic video, printing stats and frame diffs."""
    import sys
    import pathlib
    import cv2
    import numpy as np

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    import debug_autosteer

    vid = tmp_path / "clip.avi"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"),
                        10.0, (640, 320))
    rng = np.random.default_rng(0)
    for _ in range(3):
        w.write(rng.integers(0, 255, (320, 640, 3), dtype=np.uint8))
    w.release()

    assert debug_autosteer.main(["--video", str(vid), "--frames", "3"]) == 0
    out = capsys.readouterr().out
    assert "raw logits" in out and "steering" in out


# ---------------------------------------------------------- roofline tool

def test_roofline_tail_matches_xla_flop_count():
    """The analytic decode-path op walk (tools/roofline_tail.py) must
    account for ~98% of the FLOPs XLA's own cost analysis reports for
    the full SceneSeg forward (367.8 GFLOP, measured once on the CPU
    backend) — i.e. the decode path IS the model, the premise of the
    SCALING.md Section 1b attribution."""
    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from roofline_tail import decode_path_ops

    ops = decode_path_ops(320, 640)
    assert len(ops) == 20  # 5 CT + 4 skip 1x1 + 11 decode convs
    total_flops = sum(o["flops"] for o in ops)
    assert 0.95 * 367.8e9 < total_flops < 367.8e9  # decode < full net
    # the claimed wall split: MXU-dominated floor, HBM ops a minority
    floor = sum(o["roofline_us"] for o in ops)
    hbm = sum(o["roofline_us"] for o in ops if o["wall"] == "HBM")
    assert hbm / floor < 0.2
    # every op accounts positive traffic and intensity
    assert all(o["bytes"] > 0 and o["ai"] > 0 for o in ops)
