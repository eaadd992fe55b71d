"""Rerun telemetry logger (N25 equivalent; production_release/src/rerun/
rerun_logger.cpp / rerun_logger.hpp:33-89): frames, masks, CAN state,
PID/AutoSteer angles, PathFinder metrics, inference timings — spawn a
viewer or save .rrd. Gated: degrades to a no-op when the rerun SDK is not
installed (same optional-feature contract as ENABLE_RERUN)."""
from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import rerun as rr
    _HAS_RERUN = True
except ImportError:  # pragma: no cover
    rr = None
    _HAS_RERUN = False


class RerunLogger:
    def __init__(self, app_id: str = "visionpilot_tpu",
                 spawn_viewer: bool = False,
                 save_path: Optional[str] = None):
        self.enabled = _HAS_RERUN
        if not self.enabled:
            print("[rerun] SDK not installed — telemetry disabled")
            return
        rr.init(app_id)
        if spawn_viewer:
            rr.spawn()
        elif save_path:
            rr.save(save_path)

    def log_data(self, frame_number: int, *,
                 frame_bgr: Optional[np.ndarray] = None,
                 lane_masks: Optional[np.ndarray] = None,
                 steering_deg: float = None,
                 autosteer_deg: float = None,
                 cte_m: float = None, yaw_error_rad: float = None,
                 ego_speed_ms: float = None,
                 set_speed_ms: float = None,
                 inference_us: float = None):
        if not self.enabled:
            return
        rr.set_time_sequence("frame", frame_number)
        if frame_bgr is not None:
            rr.log("camera/frame", rr.Image(frame_bgr[..., ::-1]))
        if lane_masks is not None:
            rr.log("perception/lane_masks",
                   rr.Image((lane_masks * 255).astype(np.uint8)))
        for name, v in [("control/steering_deg", steering_deg),
                        ("control/autosteer_deg", autosteer_deg),
                        ("pathfinder/cte_m", cte_m),
                        ("pathfinder/yaw_error_rad", yaw_error_rad),
                        ("vehicle/ego_speed_ms", ego_speed_ms),
                        ("planner/set_speed_ms", set_speed_ms),
                        ("perf/inference_us", inference_us)]:
            if v is not None:
                rr.log(name, rr.Scalar(float(v)))
