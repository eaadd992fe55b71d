"""Fleet serving: N independent camera streams on one device program.

The reference runtime serves exactly one camera (production_release/
main.cpp:366-448 — a single capture thread). On TPU the per-stream
B=1 configuration leaves most of the MXU idle: the 320x640 conv nets
are weight-bandwidth-bound at batch 1. Batching independent streams
restores arithmetic intensity — the weights are read from HBM once per
tick and amortized over every stream.

This module vmaps the SAME fused lateral step that the single-stream
`LateralPipeline` jits (`build_lateral_step`) over a leading stream
axis: every stream carries its own full device-resident state
(EgoLanes temporal ring, LaneFilter history, LaneTracker width cache,
Bayes filter, steering controller ring), so fleet results are
bit-identical to running N separate pipelines (tests/test_fleet.py
asserts this equivalence).

Scaling out: pass a `jax.sharding.Mesh` and the stream axis is sharded
over the mesh's 'data' axis — streams:chips is a pure data-parallel
layout with zero collectives, so it rides ICI bandwidth-free and scales
linearly. This is the serving analog of the DP training step
(`parallel/multichip_inference.py` covers the stateless clip case).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .config import Config
from .pipeline import (
    LateralState, build_lateral_step, init_lateral_state, SCALAR_FIELDS)

__all__ = ["FleetLateralPipeline", "FleetLongitudinalPipeline",
           "FleetEngine", "unpack_fleet_scalars", "SCALAR_FIELDS"]


def _stack_states(n: int, seed: int, mask_hw=(80, 160)) -> LateralState:
    base = init_lateral_state(seed, mask_hw=mask_hw)
    stacked = jax.tree.map(
        lambda x: jnp.stack([x] * n), base,
        is_leaf=lambda x: isinstance(x, jnp.ndarray))
    # independent per-stream RNG streams
    return stacked._replace(
        key=jax.random.split(jax.random.key(seed), n))


class FleetLateralPipeline:
    """Vmapped lateral stack over `n_streams` independent cameras.

    __call__(frames_u8 (N,H,W,3), states) -> (outputs, states) where
    every output of the single-stream step gains a leading stream axis
    (scalars (N,8), coeffs (N,3,6), lane_masks (N,80,160,3)).
    """

    def __init__(self, lanes_vars, autosteer_vars, cfg: Config,
                 n_streams: int, frame_hw=(720, 1280), crop_y: int = 420,
                 dtype=jnp.bfloat16, mesh=None, pad_to: int = 0,
                 net_hw=(320, 640), lanes_net=None):
        """pad_to > n_streams runs the device program at a larger
        PHYSICAL batch (padding streams carry zero frames and their own
        dead state) and slices outputs back to n_streams — a serving
        knob for batch sizes whose conv tiling is slow (XLA picks
        layouts per physical batch; see docs/SCALING.md fleet table).
        Per-stream results are bit-identical to the unpadded pipeline
        (vmap is elementwise over the stream axis; tests/test_fleet.py).
        """
        self.n_streams = n_streams
        self.pad_to = max(pad_to, n_streams) if pad_to else n_streams
        self.mesh = mesh
        self._mask_hw = (net_hw[0] // 4, net_hw[1] // 4)
        step = build_lateral_step(lanes_vars, autosteer_vars, cfg,
                                  frame_hw=frame_hw, crop_y=crop_y,
                                  dtype=dtype, net_hw=net_hw,
                                  lanes_net=lanes_net)
        vstep = jax.vmap(step)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._shard = lambda t: jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(
                    mesh, P(*(("data",) + (None,) * (x.ndim - 1))))), t)
        else:
            self._shard = lambda t: t
        n_pad = self.pad_to - n_streams
        if n_pad:
            def padded(frames, states):
                pad = jnp.zeros((n_pad,) + frames.shape[1:], frames.dtype)
                out, new_states = vstep(
                    jnp.concatenate([frames, pad]), states)
                return jax.tree.map(lambda x: x[:n_streams], out), \
                    new_states
            self._step = jax.jit(padded, donate_argnums=(1,))
        else:
            self._step = jax.jit(vstep, donate_argnums=(1,))

    def init_states(self, seed: int = 0) -> LateralState:
        return self._shard(_stack_states(self.pad_to, seed,
                                         mask_hw=self._mask_hw))

    def __call__(self, frames_u8, states):
        return self._step(self._shard(frames_u8), states)


class FleetLongitudinalPipeline:
    """Vmapped AutoSpeed detection over `n_streams` cameras.

    The single-stream device step is stateless (tracking lives on host),
    so the fleet variant is a plain vmap: (N,H,W,3) -> (N, max_det, 7)
    packed detection tables.
    """

    def __init__(self, autospeed_vars, cfg: Config, n_streams: int,
                 frame_hw=(720, 1280), input_hw=(640, 640),
                 dtype=jnp.bfloat16, max_det: int = 64, mesh=None):
        from .pipeline import build_longitudinal_step

        self.n_streams = n_streams
        step = build_longitudinal_step(
            autospeed_vars, cfg, frame_hw=frame_hw, input_hw=input_hw,
            dtype=dtype, max_det=max_det)
        vstep = jax.vmap(step)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._shard = lambda x: jax.device_put(
                x, NamedSharding(mesh, P("data", None, None, None)))
        else:
            self._shard = lambda x: x
        self._step = jax.jit(vstep)

    def __call__(self, frames_u8):
        return self._step(self._shard(frames_u8))


def unpack_fleet_scalars(scalars) -> list[dict]:
    """(N, 8) device array -> list of per-stream {field: float} dicts."""
    arr = np.asarray(scalars)
    return [dict(zip(SCALAR_FIELDS, map(float, row))) for row in arr]


class FleetEngine:
    """Host orchestration for N streams: one device tick per frame-set.

    The fleet analog of `PipelineEngine`: each tick dispatches the vmapped
    lateral (and optional longitudinal) programs on all N streams, then
    harvests tick T-depth while T executes (same software pipelining as
    the single-stream engine). Host-side per-stream state machines
    (ObjectFinder tracking, RSS speed planning, longitudinal PID) run on
    the harvested detections.

    frame_source: callable -> (N,H,W,3) uint8 ndarray | None (None ends
    the run). sink: optional callable(tick_index, list[FrameResult]).
    """

    def __init__(self, cfg: Config, lateral: FleetLateralPipeline,
                 longitudinal: Optional[FleetLongitudinalPipeline],
                 object_finders: Optional[list] = None,
                 frame_source=None, sink=None):
        from ..control.speed_planner import SpeedPlanner
        from ..control.pi_controller import PIController

        self.cfg = cfg
        self.lateral = lateral
        self.longitudinal = longitudinal
        self.n = lateral.n_streams
        self.object_finders = object_finders
        self.frame_source = frame_source
        self.sink = sink
        lon = cfg.longitudinal
        self.speed_planners = [
            SpeedPlanner(ego_speed=lon.ego_speed_default_ms,
                         is_cipo_present=False) for _ in range(self.n)]
        self.pids = [PIController(lon.pid_Kp, lon.pid_Ki, lon.pid_Kd)
                     for _ in range(self.n)]

    def _harvest(self, tick, frames, lat_out, lon_out):
        from .pipeline import FrameResult
        results = []
        tables = np.asarray(lon_out) if lon_out is not None else None
        scalars = unpack_fleet_scalars(lat_out["scalars"])
        for i in range(self.n):
            res = FrameResult(frame_num=tick)
            s = scalars[i]
            res.steering_deg = s["steering_filtered"]
            res.cte = s["cte"]
            res.yaw_error = s["yaw_error"]
            # lane departure from the fetched scalars — same contract as
            # PipelineEngine._harvest (main.cpp unified-display warning)
            lane_w = abs(s["lane_width"])
            res.lane_departure = s["fused_valid"] > 0.5 and \
                lane_w > 0.1 and abs(res.cte) > 0.5 * (lane_w / 2.0)
            if tables is not None and self.object_finders is not None:
                t = tables[i]
                vv = t[:, 6] > 0.5
                dets = [(*t[j, :4], t[j, 4], int(t[j, 5]))
                        for j in range(len(vv)) if vv[j]]
                trk = self.object_finders[i].update_and_get_cipo(
                    dets, frames[i])
                sp = self.speed_planners[i]
                sp.set_ego_speed(self.cfg.longitudinal.ego_speed_default_ms)
                sp.set_is_cipo_present(trk.cipo.exists)
                if trk.cipo.exists:
                    sp.set_cipo_state(trk.cipo.velocity_ms,
                                      trk.cipo.distance_m)
                    res.cipo_distance = trk.cipo.distance_m
                    res.cipo_velocity = trk.cipo.velocity_ms
                res.set_speed = sp.calc_ideal_driving_speed()
                if trk.cut_in_detected or trk.kalman_reset:
                    self.pids[i].reset()
                res.accel_effort = self.pids[i].compute_effort(
                    sp.ego_speed, res.set_speed)
                res.fcw = sp.get_fcw_state()
                res.aeb = sp.get_aeb_state()
                res.cut_in = trk.cut_in_detected
                res.kalman_reset = trk.kalman_reset
                res.n_tracks = len(trk.tracked_objects)
            results.append(res)
        if self.sink is not None:
            self.sink(tick, results)
        return results

    def run(self, max_ticks: Optional[int] = None, pipeline_depth: int = 1):
        from collections import deque
        states = self.lateral.init_states()
        depth = max(1, int(pipeline_depth))
        pending = deque()
        all_results = []
        tick = 0
        while max_ticks is None or tick < max_ticks:
            frames = self.frame_source()
            if frames is None:
                break
            dev = jnp.asarray(frames)
            lat_out, states = self.lateral(dev, states)
            lat_out["scalars"].copy_to_host_async()
            lon_out = None
            if self.longitudinal is not None:
                lon_out = self.longitudinal(dev)
                lon_out.copy_to_host_async()
            pending.append((tick, frames, lat_out, lon_out))
            if len(pending) > depth:
                all_results.append(self._harvest(*pending.popleft()))
            tick += 1
        while pending:
            all_results.append(self._harvest(*pending.popleft()))
        return all_results
