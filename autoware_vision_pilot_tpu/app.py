"""VisionPilot-TPU standalone application.

The main.cpp analog: loads the .conf, opens the frame source (video or
camera), builds the lateral+longitudinal device pipelines, and runs the
loop with CSV flight recording, SHM seqlock publishing, optional display
and CAN polling. Graceful degradation everywhere (missing CAN / SHM / viz
never kill the pipeline — main.cpp:1832-1933 contract).

Run:  python -m autoware_vision_pilot_tpu.app --config visionpilot.conf \
          [--max-frames N] [--weights-dir DIR]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from .runtime.config import load_config, Config
from .runtime.pipeline import (
    LateralPipeline, LongitudinalPipeline, PipelineEngine, SCALAR_FIELDS)
from .perception.tracking import ObjectFinder
from .utils.csv_logger import CsvFlightRecorder
from .utils import visualization as viz
from .drivers.can_interface import CanInterface
from .export.checkpoints import load_msgpack


def _load_model_vars(cfg: Config, name: str, model, example_shape,
                     dtype=jnp.bfloat16):
    """Load msgpack weights if configured, else random init (with warning)."""
    key = jax.random.key(0)
    if example_shape is not None:
        init = model.init(key, jnp.zeros(example_shape, dtype))
    mc = cfg.models.get(name)
    if mc and mc.path and Path(mc.path).exists():
        return load_msgpack(mc.path, init)
    print(f"[app] WARNING: no weights for {name} "
          f"({mc.path if mc else 'unconfigured'}) — random init")
    return init


def build_engine(cfg: Config, frame_source, sink=None,
                 frame_hw=(720, 1280), dtype=jnp.bfloat16):
    from .models.ego_lanes import EgoLanesNetwork
    from .models.auto_steer_temporal import AutoSteerTemporalNet
    from .models.auto_speed import AutoSpeedNetwork

    kw = dict(dtype=dtype, param_dtype=dtype)
    lanes_vars = _load_model_vars(
        cfg, "egolanes", EgoLanesNetwork(**kw), (1, 320, 640, 3), dtype)
    steer_vars = _load_model_vars(
        cfg, "autosteer", AutoSteerTemporalNet(**kw), (1, 80, 160, 6), dtype)
    speed_vars = _load_model_vars(
        cfg, "autospeed",
        AutoSpeedNetwork(variant="n", num_classes=4, img_h=640, img_w=640,
                         **kw), (1, 640, 640, 3), dtype)

    lateral = LateralPipeline(lanes_vars, steer_vars, cfg,
                              frame_hw=frame_hw, dtype=dtype)
    longitudinal = LongitudinalPipeline(speed_vars, cfg, frame_hw=frame_hw,
                                        dtype=dtype)
    H = np.eye(3)
    if cfg.homography_yaml and Path(cfg.homography_yaml).exists():
        import yaml
        node = yaml.safe_load(Path(cfg.homography_yaml).read_text())["H"]
        data = node if isinstance(node, list) else node["data"]
        H = np.asarray(data, np.float64).reshape(3, 3)
    finder = ObjectFinder(H, frame_hw[1], frame_hw[0])
    return PipelineEngine(cfg, lateral, longitudinal, finder,
                          frame_source, sink=sink)


def compose_display_frame(res, lat_out, tracking, frame, wheel,
                          fps: float = 0.0, crop_y: int = 420,
                          ego=None, wheel_gt=None):
    """Unified display composite in the reference's exact overlay order
    (unifiedDisplayThread, main.cpp:881-974): tracked boxes -> lane masks
    through the cropped-ROI work-res pipeline -> display resize +
    steering wheels (pred + CAN ground truth) -> LDW -> AEB/FCW -> CIPO
    HUD -> frame/sync labels. `frame` is the raw BGR capture; returns
    the annotated copy. The fps overlay is an addition over the
    reference (it prints FPS to stdout instead)."""
    tracked, cipo_id = (), -1
    if tracking is not None:
        tracked = tracking.tracked_objects
        cipo_id = tracking.cipo.track_id if tracking.cipo.exists else -1
    gt_deg = None
    if ego is not None and getattr(ego, "valid", False) and \
            not np.isnan(getattr(ego, "steering_angle_deg", np.nan)):
        gt_deg = ego.steering_angle_deg
    out = viz.unified_display_frame(
        frame, np.asarray(lat_out["lane_masks"], np.float32),
        tracked_objects=tracked, cipo_track_id=cipo_id,
        steering_deg=res.steering_deg, gt_steering_deg=gt_deg,
        wheel_pred=wheel, wheel_gt=wheel_gt if wheel_gt is not None
        else wheel,
        lane_departure=res.lane_departure, fcw=res.fcw, aeb=res.aeb,
        cipo_exists=res.cipo_distance >= 0,
        ideal_speed_ms=res.set_speed, safe_distance_m=res.safe_distance,
        control_effort_ms2=res.accel_effort, frame_num=res.frame_num,
        crop_y=crop_y)
    if fps > 0:
        import cv2
        cv2.putText(out, f"{fps:.1f} FPS", (10, 110),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--no-shm", action="store_true")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)

    # frame source
    if cfg.mode == "video":
        from .drivers.camera import open_video
        cap = open_video(cfg.video_path)
    else:
        from .drivers.camera import open_camera
        cap = open_camera(cfg.camera_device_id
                          if not cfg.camera_auto_select else None)

    def frame_source():
        ok, frame = cap.read()
        return frame if ok else None

    # CAN (graceful)
    can = CanInterface(cfg.can.interface_name) if cfg.can.enabled else None

    # SHM publisher (graceful)
    shm = None
    if not args.no_shm:
        try:
            from .host.shm import (SharedStatePublisher,
                                   VisionPilotStateStruct)
            shm = SharedStatePublisher()
        except Exception as e:
            print(f"[app] SHM publish disabled: {e}")

    csv_log = CsvFlightRecorder(cfg.output.csv_log_path) \
        if cfg.output.csv_log_path else None

    # Rerun telemetry (graceful: no SDK -> no-op), main.cpp:46-48 +
    # rerun.* config keys
    rerun_log = None
    if cfg.rerun.enabled:
        from .utils.rerun_logger import RerunLogger
        rerun_log = RerunLogger(spawn_viewer=cfg.rerun.spawn_viewer,
                                save_path=cfg.rerun.save_path or None)

    writer = None
    if cfg.output.save_video:
        import cv2
        writer = cv2.VideoWriter(
            cfg.output.output_video_path,
            cv2.VideoWriter_fourcc(*"MJPG"),
            cfg.target_fps or 10.0, (1280, 720))

    wheel = viz.make_steering_wheel_image() \
        if (writer is not None or cfg.output.enable_viz or
            (rerun_log is not None and rerun_log.enabled)) else None

    t_start = time.perf_counter()
    frame_count = [0]
    # instantaneous HUD FPS over a 30-frame window (a cumulative average
    # would be dominated by the first-frame compile for the whole run)
    from collections import deque
    frame_times = deque(maxlen=30)

    def compose(res, lat_out, tracking, frame, ego=None):
        now = time.perf_counter()
        frame_times.append(now)
        span = frame_times[-1] - frame_times[0]
        fps = (len(frame_times) - 1) / span if span > 0 else 0.0
        return compose_display_frame(res, lat_out, tracking, frame,
                                     wheel, fps=fps, ego=ego)

    def sink(res, lat_out, tracking, frame=None):
        if can is not None:
            can.update()
            ego = can.get_state()
        else:
            ego = None
        if csv_log:
            csv_log.log(
                frame=res.frame_num,
                steering_deg=res.steering_deg,
                cte_m=res.cte, yaw_error_rad=res.yaw_error,
                set_speed_ms=res.set_speed,
                accel_effort_ms2=res.accel_effort,
                cipo_exists=res.cipo_distance >= 0,
                cipo_distance_m=res.cipo_distance,
                cipo_velocity_ms=res.cipo_velocity,
                fcw=res.fcw, aeb=res.aeb, cut_in=res.cut_in,
                kalman_reset=res.kalman_reset,
                ego_speed_ms=(ego.speed_ms if ego else float("nan")),
                can_valid=(ego.valid if ego else False),
            )
        if shm is not None:
            from .host.shm import VisionPilotStateStruct
            s = VisionPilotStateStruct()
            s.frame_number = res.frame_num
            s.steering_pid_deg = res.steering_deg
            s.cte_m = res.cte
            s.yaw_error_rad = res.yaw_error
            s.lane_departure_warning = res.lane_departure
            s.cipo_exists = res.cipo_distance >= 0
            s.cipo_distance_m = max(res.cipo_distance, 0.0)
            s.cipo_velocity_ms = res.cipo_velocity
            s.cut_in_detected = res.cut_in
            s.kalman_reset = res.kalman_reset
            s.ideal_speed_ms = res.set_speed
            s.fcw_active = res.fcw
            s.aeb_active = res.aeb
            s.control_effort_ms2 = res.accel_effort
            if ego is not None:
                s.ego_speed_ms = ego.speed_ms
                s.ego_steering_angle_deg = ego.steering_angle_deg
                s.can_valid = ego.valid
            else:
                s.ego_speed_ms = float("nan")
                s.can_valid = False
            shm.publish(s)
        composite = None
        if frame is not None and (writer is not None or
                                  cfg.output.enable_viz or
                                  (rerun_log and rerun_log.enabled)):
            composite = compose(res, lat_out, tracking, frame, ego)
        if rerun_log is not None and rerun_log.enabled:
            masks = np.asarray(lat_out["lane_masks"], np.float32)
            sc = dict(zip(SCALAR_FIELDS, np.asarray(lat_out["scalars"])))
            rerun_log.log_data(
                res.frame_num, frame_bgr=frame,
                ego_left=masks[..., 0], ego_right=masks[..., 1],
                other_lanes=masks[..., 2],
                stacked_view_bgr=composite,
                can_steering_deg=(ego.steering_angle_deg if ego else 0.0),
                can_speed_kmph=(ego.speed_ms * 3.6 if ego else 0.0),
                can_valid=(ego.valid if ego else False),
                pid_steering_raw_deg=float(sc["steering_raw"]),
                pid_steering_filtered_deg=res.steering_deg,
                autosteer_deg=float(sc["autosteer_deg"]),
                cte=res.cte, yaw_error=res.yaw_error,
                # AutoSteer angle substitutes curvature feed-forward
                # (path_finder.cpp:95-97): log the same fused signal
                curvature=float(sc["autosteer_deg"]) * np.pi / 180.0,
                fused_valid=bool(sc["fused_valid"] > 0.5))
        if composite is not None:
            if writer is not None:
                writer.write(composite)
            if cfg.output.enable_viz:
                try:
                    import cv2
                    cv2.imshow("VisionPilot-TPU", composite)
                    cv2.waitKey(1)
                except Exception:
                    pass
        frame_count[0] += 1

    engine = build_engine(cfg, frame_source, sink=sink)
    try:
        results = engine.run(max_frames=args.max_frames)
    finally:
        cap.release()
        if csv_log:
            csv_log.close()
        if writer:
            writer.release()
        if shm:
            shm.close()
    dt = time.perf_counter() - t_start
    n = len(results)
    print(f"[app] processed {n} frames in {dt:.1f}s "
          f"({n / dt:.1f} FPS incl. warmup)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
