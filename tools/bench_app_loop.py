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

from autoware_vision_pilot_tpu.core.cache import setup_compilation_cache
setup_compilation_cache(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")

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
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    int8 = "--int8" in sys.argv
    n_frames = int(args[0]) if args else 100
    cfg = Config()
    cfg.target_fps = 0.0  # unpaced

    dtype = jnp.bfloat16
    kw = dict(dtype=dtype, param_dtype=dtype)
    rng = jax.random.key(0)
    lanes_net = EgoLanesNetwork(**kw)
    speed_net = AutoSpeedNetwork(variant="n", num_classes=4, img_h=640,
                                 img_w=640, **kw)
    lanes_v = lanes_net.init(rng, jnp.zeros((1, 320, 640, 3), dtype))
    steer_v = AutoSteerTemporalNet(**kw).init(
        rng, jnp.zeros((1, 80, 160, 6), dtype))
    speed_v = speed_net.init(rng, jnp.zeros((1, 640, 640, 3), dtype))

    if int8:
        # the QAT-certified deployment config (min_ch=256, BENCH_NOTES r5):
        # calibrate each net on the EXACT tensors the app step feeds it
        from autoware_vision_pilot_tpu.export.quantize import (
            quantize_variables_for_int8_conv,
            calibrate_int8_activation_scales)
        from autoware_vision_pilot_tpu.ops import preprocess_imagenet
        from autoware_vision_pilot_tpu.ops.preprocess import letterbox
        crng = np.random.default_rng(7)
        frames = [jnp.asarray(crng.integers(0, 255, (720, 1280, 3),
                                            dtype=np.uint8))
                  for _ in range(4)]
        lanes_v = quantize_variables_for_int8_conv(lanes_v, 256)
        lanes_v = calibrate_int8_activation_scales(
            lanes_net, lanes_v,
            [preprocess_imagenet(f[None, 420:], (320, 640), dtype=dtype)
             for f in frames])
        speed_v = quantize_variables_for_int8_conv(speed_v, 256)
        speed_v = calibrate_int8_activation_scales(
            speed_net, speed_v,
            [letterbox(f[None], (640, 640), (720, 1280), dtype=dtype)[0]
             for f in frames])
        print("-- int8 (min_ch=256, PTQ-calibrated static scales)")

    lat = LateralPipeline(lanes_v, steer_v, cfg, dtype=dtype)
    lon = LongitudinalPipeline(speed_v, cfg, dtype=dtype)

    # Measurement validity (BENCH_NOTES items 1-2 + "Remote execution
    # warm-up"): the tunnel memoizes identical (program, args)
    # executions, and the stateless longitudinal program would replay
    # from cache if any timed frame were ever executed before. So every
    # timed run gets a FRESH pool of distinct frames (never seen by any
    # prior run), and the one-time execution warm-up uses its own
    # dedicated pool. The lateral program's carried state makes its
    # executions unique regardless.
    pool_seed = [0]

    def make_pool(n):
        rng = np.random.default_rng(1000 + pool_seed[0])
        pool_seed[0] += 1
        host = [rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)
                for _ in range(n)]
        return host, [jnp.asarray(f) for f in host]

    def make_source(host, dev, mode):
        i = [0]

        def source():
            i[0] += 1
            j = i[0] % len(host)
            if mode == "preuploaded":
                return host[j], dev[j]
            return host[j]
        return source

    # one-time execution warm-up (programs are shared by all configs)
    wh, wd = make_pool(150)
    warm_eng = PipelineEngine(cfg, lat, lon,
                              ObjectFinder(np.eye(3), 1280, 720),
                              frame_source=make_source(wh, wd,
                                                       "preuploaded"))
    warm_eng.warmup()
    warm_eng.run(max_frames=150, pipeline_depth=8)
    del wh, wd

    configs = [
        ("upload   +tracking", "upload", True, (1, 8)),
        ("preupload+tracking", "preuploaded", True, (1, 8)),
        ("preupload no-track", "preuploaded", False, (1, 2, 4, 8)),
    ]
    for label, mode, track, depths in configs:
      print(f"-- {label}")
      for depth in depths:
        host_frames, dev_frames = make_pool(n_frames + 1)
        of = ObjectFinder(np.eye(3), 1280, 720) if track else None
        eng = PipelineEngine(cfg, lat, lon, of,
                             frame_source=make_source(
                                 host_frames, dev_frames, mode),
                             sink=None)
        t0 = time.perf_counter()
        results = eng.run(max_frames=n_frames, pipeline_depth=depth)
        dt = time.perf_counter() - t0
        fps = len(results) / dt
        print(f"  depth={depth}: {fps:6.1f} FPS "
              f"({dt / len(results) * 1e3:.1f} ms/frame, "
              f"{len(results)} frames)", flush=True)


if __name__ == "__main__":
    main()
