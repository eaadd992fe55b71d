"""The real-time dual perception pipeline (lateral + longitudinal).

TPU-native redesign of production_release/main.cpp (1959 LoC, 4 threads):
instead of engine-per-model ONNX sessions with CPU pre/post hops, each
pipeline half is ONE jitted XLA program that keeps everything on device:

  lateral:     crop -> fused preprocess -> EgoLanes -> temporal AutoSteer
               (2-frame ring, main.cpp:473-535) -> threshold -> LaneFilter
               (scan+RANSAC) -> LaneTracker (BEV) -> PathFinder (Bayes) ->
               steering controller + moving-average filter
  longitudinal: letterbox -> AutoSpeed -> decode -> masked NMS

The host side mirrors the reference's thread structure (capture /
lateral / longitudinal / display) with a ping-pong frame buffer and
bounded queues; only tiny scalars and small mask tensors cross back.
Classical scalar state machines that are branch-heavy (ObjectFinder
tracking, SpeedPlanner, longitudinal PID) stay on host — they are O(10)
floats per frame.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.ego_lanes import EgoLanesNetwork
from ..models.auto_steer_temporal import (
    AutoSteerTemporalNet, steering_from_logits)
from ..models.auto_speed import AutoSpeedNetwork
from ..ops.preprocess import preprocess_imagenet, letterbox
from ..ops.postprocess import (
    threshold_channels, nms_fixed, decode_yolo_to_original)
from ..perception.lane_filter import LaneFilterState, lane_filter_update
from ..perception.lane_tracker import (
    LaneTrackerState, lane_tracker_update, bev_pixels_to_meters)
from ..perception.path_finder import BayesState, path_finder_update
from ..perception.tracking import ObjectFinder
from ..control.steering import SteeringState, steering_init, steering_step
from ..control.speed_planner import SpeedPlanner
from ..control.pi_controller import PIController
from .config import Config
from .timers import PerformanceMetrics


class ThreadSafeQueue:
    """Bounded queue with drop-oldest backpressure (main.cpp:86-143)."""

    def __init__(self, max_size: int = 2):
        self.q = queue.Queue(maxsize=max_size)

    def push(self, item):
        while True:
            try:
                self.q.put_nowait(item)
                return
            except queue.Full:
                try:
                    self.q.get_nowait()
                except queue.Empty:
                    pass

    def pop(self, timeout=0.1):
        try:
            return self.q.get(timeout=timeout)
        except queue.Empty:
            return None


class DoubleFrameBuffer:
    """Ping-pong latest-frame buffer with condvar (main.cpp:150-219)."""

    def __init__(self):
        self._lock = threading.Condition()
        self._frame = None
        self._frame_num = -1
        self._last_read = -1

    def write(self, frame, frame_num):
        with self._lock:
            self._frame = frame
            self._frame_num = frame_num
            self._lock.notify_all()

    def wait_for_new_frame(self, timeout=0.5):
        with self._lock:
            if self._frame_num <= self._last_read:
                self._lock.wait(timeout)
            if self._frame_num <= self._last_read:
                return None, -1
            self._last_read = self._frame_num
            return self._frame, self._frame_num


class LateralState(NamedTuple):
    prev_lane_raw: jnp.ndarray      # (80, 160, 3) previous EgoLanes logits
    lane_filter: LaneFilterState
    lane_tracker: LaneTrackerState
    bayes: BayesState
    steering: SteeringState
    key: jnp.ndarray


# layout of the packed lateral scalar vector (fetched in one round-trip)
SCALAR_FIELDS = ("steering_filtered", "steering_raw", "autosteer_deg",
                 "cte", "yaw_error", "lane_width", "fused_valid",
                 "path_valid")


def build_lateral_step(lanes_vars, autosteer_vars, cfg: Config,
                       frame_hw=(720, 1280), crop_y: int = 420,
                       dtype=jnp.bfloat16, net_hw=(320, 640),
                       lanes_net=None):
    """Build the fused per-frame lateral step function.

    Returns step(frame_u8, state) -> (outputs dict, new LateralState) —
    pure and jittable; `LateralPipeline` jits it directly, the fleet
    serving mode (`runtime/fleet.py`) vmaps it over independent streams.

    net_hw is the EgoLanes input size (production 320x640; the fast
    test tier runs the identical step at 96x192 with a dryrun-depth
    `lanes_net` — state must then come from
    init_lateral_state(mask_hw=net_hw/4)).
    """
    kw = dict(dtype=dtype, param_dtype=dtype)
    mask_hw = (net_hw[0] // 4, net_hw[1] // 4)
    lanes = lanes_net if lanes_net is not None else EgoLanesNetwork(**kw)
    steer_net = AutoSteerTemporalNet(**kw)
    s = cfg.steering
    K = (s.Kp, s.Ki, s.Kd, s.Ks)
    threshold = (cfg.models["egolanes"].threshold
                 if "egolanes" in cfg.models else 0.0)

    def step(frame_u8, state: LateralState):
        cropped = frame_u8[crop_y:]
        x = preprocess_imagenet(cropped[None], net_hw, dtype=dtype)
        lane_logits = lanes.apply(lanes_vars, x)[0]          # (80,160,3)
        lane_logits32 = lane_logits.astype(jnp.float32)

        # temporal AutoSteer on [t-1, t] stacked masks
        stacked = jnp.concatenate(
            [state.prev_lane_raw, lane_logits32], axis=-1)[None]
        _, curr_logits = steer_net.apply(
            autosteer_vars, stacked.astype(dtype))
        autosteer_deg = steering_from_logits(
            curr_logits.astype(jnp.float32))[0]
        autosteer_rad = autosteer_deg * (jnp.pi / 180.0)

        masks = threshold_channels(lane_logits32, threshold)
        k1, k2, k3 = jax.random.split(state.key, 3)
        lc, lv, rc, rv, lf_state, _, _ = lane_filter_update(
            masks[..., 0], masks[..., 1], masks[..., 2],
            state.lane_filter, k1)

        trk, lt_state = lane_tracker_update(
            lc, lv, rc, rv, state.lane_tracker,
            model_hw=mask_hw,
            image_hw=(frame_hw[0] - crop_y, frame_hw[1]))

        left_m = bev_pixels_to_meters(trk.bev_left_pts)
        right_m = bev_pixels_to_meters(trk.bev_right_pts)
        pf_out, bayes = path_finder_update(
            state.bayes, left_m, trk.bev_left_mask,
            right_m, trk.bev_right_mask, autosteer_rad, k2)

        # reference call site (main.cpp:580-589): steering computed
        # only on fused_valid frames, yaw_error in DEGREES (*180/pi),
        # feed-forward = fused curvature channel (the Bayes-fused
        # AutoSteer angle) passed through unchanged; the moving-average
        # ring advances only on bev-valid frames.
        filtered, raw_angle, steer_state = steering_step(
            state.steering, pf_out.cte,
            pf_out.yaw_error * (180.0 / jnp.pi),
            pf_out.curvature, *K,
            fused_valid=pf_out.fused_valid,
            bev_valid=trk.path_valid)

        new_state = LateralState(lane_logits32, lf_state, lt_state,
                                 bayes, steer_state, k3)
        # scalar results packed into ONE vector so the host fetches
        # them in a single device round-trip (layout in SCALAR_FIELDS)
        scalars = jnp.stack([
            filtered, raw_angle, autosteer_deg,
            pf_out.cte, pf_out.yaw_error, pf_out.lane_width,
            pf_out.fused_valid.astype(jnp.float32),
            trk.path_valid.astype(jnp.float32),
        ]).astype(jnp.float32)
        coeffs = jnp.stack([trk.left_coeffs, trk.right_coeffs,
                            trk.center_coeffs]).astype(jnp.float32)
        outputs = {
            "scalars": scalars,
            "coeffs": coeffs,       # (3, 6) left/right/center
            "lane_masks": masks,    # viz only — not fetched per frame
        }
        return outputs, new_state

    return step


def init_lateral_state(seed: int = 0, mask_hw=(80, 160)) -> LateralState:
    return LateralState(
        prev_lane_raw=jnp.zeros(mask_hw + (3,), jnp.float32),
        lane_filter=LaneFilterState.init(),
        lane_tracker=LaneTrackerState.init(),
        bayes=BayesState.init(),
        steering=steering_init(),
        key=jax.random.key(seed),
    )


class LateralPipeline:
    """Fused lateral step: one device program per frame."""

    def __init__(self, lanes_vars, autosteer_vars, cfg: Config,
                 frame_hw=(720, 1280), crop_y: int = 420,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        self.crop_y = crop_y
        self.frame_hw = frame_hw
        step = build_lateral_step(lanes_vars, autosteer_vars, cfg,
                                  frame_hw=frame_hw, crop_y=crop_y,
                                  dtype=dtype)
        self._step = jax.jit(step, donate_argnums=(1,))

    def init_state(self, seed: int = 0) -> LateralState:
        return init_lateral_state(seed)

    def __call__(self, frame_u8, state):
        return self._step(frame_u8, state)


def build_longitudinal_step(autospeed_vars, cfg: Config,
                            frame_hw=(720, 1280), input_hw=(640, 640),
                            dtype=jnp.bfloat16, max_det: int = 64):
    """Build the per-frame AutoSpeed detection step: letterbox -> net ->
    decode -> fixed-shape NMS -> ONE packed (max_det, 7) table
    [x1, y1, x2, y2, score, class_id, valid] so the host fetches results
    in a single round-trip. Jitted by `LongitudinalPipeline`, vmapped by
    the fleet serving mode."""
    kw = dict(dtype=dtype, param_dtype=dtype)
    net = AutoSpeedNetwork(variant="n", num_classes=4,
                           img_h=input_hw[0], img_w=input_hw[1], **kw)
    conf_t = cfg.longitudinal.conf_thresh
    iou_t = cfg.longitudinal.iou_thresh

    def step(frame_u8):
        x, scale, pad = letterbox(frame_u8[None], input_hw, frame_hw,
                                  dtype=dtype)
        pred = net.apply(autospeed_vars, x)[0].astype(jnp.float32)
        boxes, scores, cls = decode_yolo_to_original(
            pred, scale, pad, frame_hw)
        b, s, c, v = nms_fixed(boxes, scores, cls, max_det=max_det,
                               iou_thresh=iou_t, conf_thresh=conf_t)
        return jnp.concatenate(
            [b, s[:, None], c[:, None].astype(jnp.float32),
             v[:, None].astype(jnp.float32)], axis=1)

    return step


class LongitudinalPipeline:
    """AutoSpeed detection + on-device NMS; tracking/planning on host."""

    def __init__(self, autospeed_vars, cfg: Config, frame_hw=(720, 1280),
                 input_hw=(640, 640), dtype=jnp.bfloat16, max_det: int = 64):
        self.cfg = cfg
        self._step = jax.jit(build_longitudinal_step(
            autospeed_vars, cfg, frame_hw=frame_hw, input_hw=input_hw,
            dtype=dtype, max_det=max_det))

    def __call__(self, frame_u8):
        return self._step(frame_u8)


def sink_wants_frame(sink) -> bool:
    """True if a result sink should receive the raw frame as a 4th
    POSITIONAL argument (display/video composition). Sinks may take
    (res, lat_out, tracking) or additionally the frame; *args sinks
    receive it, **kwargs-only extras do not count as a positional slot."""
    if sink is None:
        return False
    import inspect
    try:
        params = inspect.signature(sink).parameters.values()
    except (TypeError, ValueError):
        return False
    n_pos = sum(p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                for p in params)
    return n_pos >= 4 or any(p.kind == p.VAR_POSITIONAL for p in params)


@dataclasses.dataclass
class FrameResult:
    frame_num: int
    steering_deg: float = 0.0
    cte: float = 0.0
    yaw_error: float = 0.0
    set_speed: float = 0.0
    accel_effort: float = 0.0
    safe_distance: float = 0.0
    cipo_distance: float = -1.0
    cipo_velocity: float = 0.0
    fcw: bool = False
    aeb: bool = False
    cut_in: bool = False
    kalman_reset: bool = False
    n_tracks: int = 0
    lane_departure: bool = False


class PipelineEngine:
    """Host orchestration: capture -> {lateral, longitudinal} -> sink.

    frame_source: callable returning (frame_bgr_u8 np.ndarray | None).
    sink: callable(FrameResult, lateral_outputs, tracking_result).
    """

    def __init__(self, cfg: Config, lateral: LateralPipeline,
                 longitudinal: Optional[LongitudinalPipeline],
                 object_finder: Optional[ObjectFinder],
                 frame_source: Callable[[], Optional[np.ndarray]],
                 sink: Optional[Callable] = None):
        self.cfg = cfg
        self.lateral = lateral
        self.longitudinal = longitudinal
        self.object_finder = object_finder
        self.frame_source = frame_source
        self.sink = sink
        self._sink_wants_frame = sink_wants_frame(sink)
        self.buffer = DoubleFrameBuffer()
        self.metrics = PerformanceMetrics()
        self.speed_planner = SpeedPlanner(
            ego_speed=cfg.longitudinal.ego_speed_default_ms,
            is_cipo_present=False)
        self.pid = PIController(cfg.longitudinal.pid_Kp,
                                cfg.longitudinal.pid_Ki,
                                cfg.longitudinal.pid_Kd)
        self._stop = threading.Event()

    def warmup(self, frame_hw=(720, 1280)):
        """Absorb compile/first-dispatch latency before going live — the
        reference's warm-up inference contract (main.cpp:1641-1680)."""
        dummy = jnp.zeros((*frame_hw, 3), jnp.uint8)
        state = self.lateral.init_state(seed=999)
        out, _ = self.lateral(dummy, state)
        jax.block_until_ready(out["scalars"])
        if self.longitudinal is not None:
            jax.block_until_ready(self.longitudinal(dummy))

    def _harvest(self, frame_num, frame, lat_out, lon_out):
        """Fetch device results and run the host-side longitudinal state
        machines for one frame (host work for frame N-1 overlaps frame N's
        device compute in run()). Exactly two device fetches per frame:
        the packed lateral scalar vector and the packed detection table."""
        res = FrameResult(frame_num=frame_num)
        tracking = None
        if lon_out is not None:
            table = np.asarray(lon_out)       # (max_det, 7) — one fetch
            vv = table[:, 6] > 0.5
            dets = [(*table[i, :4], table[i, 4], int(table[i, 5]))
                    for i in range(len(vv)) if vv[i]]
            if self.object_finder is not None:
                tracking = self.object_finder.update_and_get_cipo(
                    dets, frame)
                sp = self.speed_planner
                sp.set_ego_speed(
                    self.cfg.longitudinal.ego_speed_default_ms)
                sp.set_is_cipo_present(tracking.cipo.exists)
                if tracking.cipo.exists:
                    sp.set_cipo_state(tracking.cipo.velocity_ms,
                                      tracking.cipo.distance_m)
                set_speed = sp.calc_ideal_driving_speed()
                if tracking.cut_in_detected or tracking.kalman_reset:
                    self.pid.reset()
                effort = self.pid.compute_effort(sp.ego_speed, set_speed)
                res.set_speed = set_speed
                res.accel_effort = effort
                res.safe_distance = sp.calc_safe_rss_distance()
                res.fcw = sp.get_fcw_state()
                res.aeb = sp.get_aeb_state()
                res.cut_in = tracking.cut_in_detected
                res.kalman_reset = tracking.kalman_reset
                res.n_tracks = len(tracking.tracked_objects)
                if tracking.cipo.exists:
                    res.cipo_distance = tracking.cipo.distance_m
                    res.cipo_velocity = tracking.cipo.velocity_ms

        sc = np.asarray(lat_out["scalars"])   # (8,) — one fetch
        s = dict(zip(SCALAR_FIELDS, sc))
        res.steering_deg = float(s["steering_filtered"])
        res.cte = float(s["cte"])
        res.yaw_error = float(s["yaw_error"])
        # lane departure: drift beyond 50% of the lane half-width
        # (main.cpp unified-display warning contract)
        lane_w = abs(float(s["lane_width"]))
        res.lane_departure = s["fused_valid"] > 0.5 and lane_w > 0.1 and \
            abs(res.cte) > 0.5 * (lane_w / 2.0)

        if self.sink is not None:
            if self._sink_wants_frame:
                self.sink(res, lat_out, tracking, frame)
            else:
                self.sink(res, lat_out, tracking)
        return res

    def run(self, max_frames: Optional[int] = None, warmup: bool = False,
            pipeline_depth: int = 1):
        """Dual-pipeline loop with k-frame software pipelining: frame N's
        device programs are dispatched (async) before frame N-k's results
        are fetched, hiding device latency behind host work — the same
        decoupling the reference gets from its capture/display threads
        (main.cpp DoubleFrameBuffer + result queues). Results stream with a
        `pipeline_depth`-frame delay.

        The device->host copies of the two per-frame result arrays (the
        packed lateral scalar vector and the packed detection table) start
        asynchronously at dispatch time (`copy_to_host_async`); by the
        time frame N-k is harvested the bytes have already landed, so the
        harvest never pays a blocking link round-trip. The lateral state
        pytree itself never leaves the device (donated buffer). Depth 1
        reproduces the reference's one-frame decoupling; deeper values
        hide longer links (the remote-TPU tunnel) at the cost of control
        latency — on local-PCIe hosts depth 1-2 is the right setting."""
        if warmup:
            self.warmup()
        from collections import deque
        depth = max(1, int(pipeline_depth))
        target_dt = 1.0 / self.cfg.target_fps if self.cfg.target_fps else 0.0
        lat_state = self.lateral.init_state()
        frame_num = 0
        results = []
        pending = deque()  # (frame_num, frame, lat_out, lon_out)
        while not self._stop.is_set():
            if max_frames is not None and frame_num >= max_frames:
                break
            t0 = time.perf_counter()
            frame = self.frame_source()
            if frame is None:
                break
            # frame_source may return (host_frame, device_frame) — e.g. a
            # prefetcher that double-buffers uploads (the DoubleFrameBuffer
            # role): the device buffer feeds the programs, the host view
            # feeds the host-side tracking (ORB crops) without a fetch.
            if isinstance(frame, tuple):
                frame, dev_frame = frame
            else:
                dev_frame = jnp.asarray(frame)
            t_cap = time.perf_counter()

            # dispatch frame N (async — returns device futures) and start
            # the device->host copies of the per-frame result arrays
            lat_out, lat_state = self.lateral(dev_frame, lat_state)
            lat_out["scalars"].copy_to_host_async()
            lon_out = None
            if self.longitudinal is not None:
                lon_out = self.longitudinal(dev_frame)
                lon_out.copy_to_host_async()
            t_inf = time.perf_counter()

            # harvest frame N-depth while N..N-depth+1 execute
            pending.append((frame_num, frame, lat_out, lon_out))
            if len(pending) > depth:
                results.append(self._harvest(*pending.popleft()))
            frame_num += 1
            t_end = time.perf_counter()
            self.metrics.add_frame(capture_s=t_cap - t0,
                                   inference_s=t_inf - t_cap,
                                   display_s=t_end - t_inf,
                                   e2e_s=t_end - t0)
            if target_dt:
                sleep = target_dt - (time.perf_counter() - t0)
                if sleep > 0:
                    time.sleep(sleep)
        while pending:
            results.append(self._harvest(*pending.popleft()))
        return results

    def stop(self):
        self._stop.set()
