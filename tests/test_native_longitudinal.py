"""Native longitudinal stack parity: C++ ObjectFinder/Kalman/RSS/PID vs
the Python stack, step for step.

The C++ port (host/src/longitudinal.cpp) is the in-process longitudinal
path of the Python-free deployable binary (reference
VisionPilot/production_release/main.cpp:662-785). These tests drive both
implementations with identical synthetic detection-table sequences
(the (T, max_det, 7) layout the device NMS produces) and identical frame
timestamps, and require bit-level-tight agreement on every published
field: CIPO identity/distance/velocity, track lifecycle, RSS set-speed,
FCW/AEB bands and PI effort.
"""
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture(scope="session")
def harness(tmp_path_factory):
    if not (shutil.which("cmake") and shutil.which("ninja")):
        pytest.skip("cmake/ninja not available")
    build = tmp_path_factory.mktemp("lon_build")
    subprocess.run(["cmake", "-S", str(REPO / "host"), "-B", str(build),
                    "-G", "Ninja"], check=True, capture_output=True)
    subprocess.run(["ninja", "-C", str(build), "longitudinal_harness"],
                   check=True, capture_output=True)
    return build / "longitudinal_harness"


# Flat-ground homography mapping image pixels to world meters: x_world
# grows with image y toward the bottom (closer = larger y = smaller
# distance is wrong way round for real cameras, but any fixed projective
# map exercises the math identically on both sides).
HOM = np.array([[0.02, 0.0, -12.8],
                [0.0, -0.09, 72.0],
                [0.0, 0.001, 0.28]], np.float64)
IMG_W, IMG_H = 1280, 720
DT = 0.1
EGO = 10.0


def _box_row(cx, cy, w, h, conf, cls):
    return [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, conf, cls, 1.0]


def _scenario(kind, T=40, max_det=8):
    """Detection tables (T, max_det, 7) exercising tracker state paths."""
    rng = np.random.default_rng(3 if kind == "noisy" else 7)
    tables = np.zeros((T, max_det, 7), np.float32)
    for t in range(T):
        rows = []
        if kind == "single":
            # one lead car drifting away
            rows.append(_box_row(640 + 2 * t, 400 - t, 120 - t, 90 - t,
                                 0.9, 1))
        elif kind == "lifecycle":
            # car 1 present frames 0..14, gone 15..18 (within the
            # 3-unmatched grace), back 19..; car 2 appears at t=10
            if t < 15 or t >= 19:
                rows.append(_box_row(600 + t, 420, 110, 80, 0.85, 1))
            if t >= 10:
                rows.append(_box_row(300, 460 + t, 90, 70, 0.7, 2))
            # an untracked class-0 detection must be ignored
            rows.append(_box_row(1000, 300, 40, 40, 0.95, 0))
        elif kind == "switch":
            # CIPO switches identity at t=20 (closer class-1 appears) —
            # with no frame crops both sides must carry velocity, no
            # cut-in flag
            rows.append(_box_row(640, 400, 120, 90, 0.9, 1))
            if t >= 20:
                rows.append(_box_row(660, 520, 160, 120, 0.92, 1))
        elif kind == "noisy":
            n = rng.integers(0, 4)
            for _ in range(n):
                cls = int(rng.integers(0, 4))
                cx = float(rng.uniform(100, 1180))
                cy = float(rng.uniform(200, 700))
                w = float(rng.uniform(40, 200))
                h = float(rng.uniform(30, 150))
                rows.append(_box_row(cx, cy, w, h,
                                     float(rng.uniform(0.5, 1.0)), cls))
        for i, r in enumerate(rows[:max_det]):
            tables[t, i] = r
    return tables


def _python_rows(tables):
    from autoware_vision_pilot_tpu.perception.tracking import ObjectFinder
    from autoware_vision_pilot_tpu.control.speed_planner import SpeedPlanner
    from autoware_vision_pilot_tpu.control.pi_controller import PIController

    now = {"t": 0.0}
    # the native side reads the homography from an f32 npy: give the
    # Python side the identical rounded values
    hom32 = HOM.astype(np.float32).astype(np.float64)
    finder = ObjectFinder(hom32, IMG_W, IMG_H, clock=lambda: now["t"])
    planner = SpeedPlanner()
    pid = PIController(0.5, 0.1, 0.05)
    rows = []
    for t in range(len(tables)):
        now["t"] = t * DT
        dets = [tuple(r[:6]) for r in tables[t] if r[6] > 0.5]
        res = finder.update_and_get_cipo(dets, frame=None)
        planner.set_ego_speed(EGO)
        planner.set_is_cipo_present(res.cipo.exists)
        if res.cipo.exists:
            planner.set_cipo_state(res.cipo.velocity_ms,
                                   res.cipo.distance_m)
        set_speed = planner.calc_ideal_driving_speed()
        if res.cut_in_detected or res.kalman_reset:
            pid.reset()
        effort = pid.compute_effort(EGO, set_speed)
        rows.append(dict(
            exists=int(res.cipo.exists), track_id=res.cipo.track_id,
            class_id=res.cipo.class_id, distance=res.cipo.distance_m,
            velocity=res.cipo.velocity_ms,
            cutin=int(res.cut_in_detected), reset=int(res.kalman_reset),
            set_speed=set_speed, safe_d=planner.calc_safe_rss_distance(),
            fcw=int(planner.get_fcw_state()),
            aeb=int(planner.get_aeb_state()), effort=effort,
            n_tracks=len(res.tracked_objects)))
    return rows


def _native_rows(harness, tables, tmp_path):
    dets_npy = tmp_path / "dets.npy"
    hom_npy = tmp_path / "hom.npy"
    np.save(dets_npy, tables.astype(np.float32))
    np.save(hom_npy, HOM.reshape(-1).astype(np.float32))
    out = subprocess.run(
        [str(harness), "--dets", str(dets_npy), "--hom", str(hom_npy),
         "--img-w", str(IMG_W), "--img-h", str(IMG_H), "--dt", str(DT),
         "--ego", str(EGO)],
        check=True, capture_output=True, text=True).stdout.splitlines()
    header = out[0].split(",")
    rows = []
    for line in out[1:]:
        vals = line.split(",")
        rows.append({k: v for k, v in zip(header, vals)})
    return rows


@pytest.mark.parametrize("kind", ["single", "lifecycle", "switch", "noisy"])
def test_longitudinal_parity(harness, tmp_path, kind):
    # homography rounds through f32 in the npy — feed the Python side the
    # same f32 values so the projective division matches to ~1e-6
    tables = _scenario(kind)
    py = _python_rows(tables)
    nat = _native_rows(harness, tables, tmp_path)
    assert len(py) == len(nat)
    for t, (p, n) in enumerate(zip(py, nat)):
        ctx = f"{kind} frame {t}"
        for f in ("exists", "track_id", "class_id", "cutin", "reset",
                  "fcw", "aeb", "n_tracks"):
            assert int(n[f]) == int(p[f]), f"{ctx}: {f} {n[f]} != {p[f]}"
        for f in ("distance", "velocity", "set_speed", "safe_d", "effort"):
            assert abs(float(n[f]) - float(p[f])) <= 1e-5 * max(
                1.0, abs(float(p[f]))), \
                f"{ctx}: {f} {n[f]} != {p[f]}"


def test_rss_bands(harness, tmp_path):
    """Drive one object through every RSS band (cruise / hold / brake /
    FCW / AEB) by shrinking its distance; parity on band flags proves the
    planner port covers each branch."""
    T = 60
    tables = np.zeros((T, 4, 7), np.float32)
    for t in range(T):
        # closer over time: image y of the bbox bottom climbs
        cy = 280 + 6.5 * t
        tables[t, 0] = _box_row(640, min(cy, 690.0), 140, 100, 0.9, 1)
    py = _python_rows(tables)
    nat = _native_rows(harness, tables, tmp_path)
    assert any(int(r["fcw"]) for r in py), "scenario never reached FCW"
    for t, (p, n) in enumerate(zip(py, nat)):
        assert (int(n["fcw"]), int(n["aeb"])) == (p["fcw"], p["aeb"]), \
            f"frame {t}"
        assert abs(float(n["effort"]) - p["effort"]) <= 1e-5 * max(
            1.0, abs(p["effort"]))


def test_kalman_transfer_uses_current_frame_filter(harness):
    """CIPO model-confusion transfer must inherit the donor track's
    filter AS OF THIS FRAME (Python prev_tracks aliases objects mutated
    in place). C++-side selftest: replicates the donor filter manually
    and requires exact equality of the transferred state."""
    out = subprocess.run([str(harness), "--selftest-transfer"],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "selftest-transfer: ok" in out.stdout
