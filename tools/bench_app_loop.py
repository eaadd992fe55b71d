"""Measure the full application loop FPS (capture -> fused lateral program
incl. LaneFilter/LaneTracker/Bayes/steering -> AutoSpeed+NMS -> host
tracking/RSS/PID) at several software-pipeline depths.

Round-1 recorded 11.5 FPS through the remote tunnel at depth 1 — the
blocking per-frame scalar fetch paid a full link round-trip. The lateral
state pytree is device-resident either way; a deeper pipeline keeps the
fetch latency off the critical path (VERDICT round 1, item 4).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_app_loop.py
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax

cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from autoware_vision_pilot_tpu.runtime.config import Config
from autoware_vision_pilot_tpu.runtime.pipeline import (
    LateralPipeline, LongitudinalPipeline, PipelineEngine)
from autoware_vision_pilot_tpu.perception.tracking import ObjectFinder
from autoware_vision_pilot_tpu.models.ego_lanes import EgoLanesNetwork
from autoware_vision_pilot_tpu.models.auto_steer_temporal import (
    AutoSteerTemporalNet)
from autoware_vision_pilot_tpu.models.auto_speed import AutoSpeedNetwork


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cfg = Config()
    cfg.target_fps = 0.0  # unpaced

    dtype = jnp.bfloat16
    kw = dict(dtype=dtype, param_dtype=dtype)
    rng = jax.random.key(0)
    lanes_v = EgoLanesNetwork(**kw).init(
        rng, jnp.zeros((1, 320, 640, 3), dtype))
    steer_v = AutoSteerTemporalNet(**kw).init(
        rng, jnp.zeros((1, 80, 160, 6), dtype))
    speed_v = AutoSpeedNetwork(variant="n", num_classes=4, img_h=640,
                               img_w=640, **kw).init(
        rng, jnp.zeros((1, 640, 640, 3), dtype))

    lat = LateralPipeline(lanes_v, steer_v, cfg, dtype=dtype)
    lon = LongitudinalPipeline(speed_v, cfg, dtype=dtype)

    # DISTINCT frames (the tunnel memoizes identical executions); two
    # source modes: host frames (upload per frame — through this tunnel
    # the 2.7 MB/51 MB/s upload bounds the loop at ~19 FPS, measuring the
    # link) and pre-uploaded (host, device) pairs (the local-PCIe-host
    # analog: a capture prefetcher double-buffering uploads).
    n_distinct = 64
    host_frames = [np.random.default_rng(i).integers(
        0, 255, (720, 1280, 3), dtype=np.uint8) for i in range(n_distinct)]
    dev_frames = [jnp.asarray(f) for f in host_frames]

    configs = [
        ("upload   +tracking", "upload", True, (1, 8)),
        ("preupload+tracking", "preuploaded", True, (1, 8)),
        ("preupload no-track", "preuploaded", False, (1, 2, 4, 8)),
    ]
    for label, mode, track, depths in configs:
      print(f"-- {label}")
      for depth in depths:
        i = 0

        def source():
            nonlocal i
            i += 1
            j = i % n_distinct
            if mode == "preuploaded":
                return host_frames[j], dev_frames[j]
            return host_frames[j]

        of = ObjectFinder(np.eye(3), 1280, 720) if track else None
        eng = PipelineEngine(cfg, lat, lon, of,
                             frame_source=source, sink=None)
        eng.warmup()
        # warm the remote execution path (~100 cold executions per
        # program — BENCH_NOTES "Remote execution warm-up"); shared
        # across configs since the programs are the same
        eng.run(max_frames=150, pipeline_depth=8)
        i = 0
        t0 = time.perf_counter()
        results = eng.run(max_frames=n_frames, pipeline_depth=depth)
        dt = time.perf_counter() - t0
        fps = len(results) / dt
        print(f"  depth={depth}: {fps:6.1f} FPS "
              f"({dt / len(results) * 1e3:.1f} ms/frame, "
              f"{len(results)} frames)", flush=True)


if __name__ == "__main__":
    main()
