"""Fleet serving benchmark: aggregate FPS vs number of vmapped streams.

Measures the full stateful lateral stack (EgoLanes + temporal AutoSteer +
LaneFilter + LaneTracker + Bayes PathFinder + steering) batched over N
independent camera streams in ONE device program per tick
(runtime/fleet.FleetLateralPipeline), with the hardened methodology of
bench.py: distinct pre-uploaded frames, async per-tick scalar fetches
awaited k ticks later.

Usage: python tools/bench_fleet.py [--streams 1,2,4,8] [--ticks 60]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
from collections import deque

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def bench_fleet(n_streams: int, n_ticks: int = 60, depth: int = 8,
                warmup_ticks: int = 150, dtype=jnp.bfloat16,
                int8: bool = False, pad_to: int = 0) -> float:
    from autoware_vision_pilot_tpu.models.ego_lanes import EgoLanesNetwork
    from autoware_vision_pilot_tpu.models.auto_steer_temporal import (
        AutoSteerTemporalNet)
    from autoware_vision_pilot_tpu.runtime import (
        Config, FleetLateralPipeline)

    key = jax.random.key(0)
    lanes = EgoLanesNetwork(dtype=dtype, param_dtype=dtype)
    lanes_vars = lanes.init(key, jnp.zeros((1, 320, 640, 3), dtype))
    steer_vars = AutoSteerTemporalNet(dtype=dtype, param_dtype=dtype).init(
        key, jnp.zeros((1, 80, 160, 6), dtype))
    if int8:
        # selective int8 MXU path on the EgoLanes trunk (>=128ch convs,
        # static calibrated activation scales) — same recipe as
        # bench.py --int8; AutoSteer (tiny) stays bf16
        from autoware_vision_pilot_tpu.export.quantize import (
            quantize_variables_for_int8_conv,
            calibrate_int8_activation_scales)
        lanes_vars = quantize_variables_for_int8_conv(lanes_vars, 128)
        rngq = np.random.default_rng(7)
        cal = [jnp.asarray(rngq.normal(0.0, 1.0, (1, 320, 640, 3)), dtype)
               for _ in range(4)]
        lanes_vars = calibrate_int8_activation_scales(
            lanes, lanes_vars, cal)

    cfg = Config()
    fleet = FleetLateralPipeline(lanes_vars, steer_vars, cfg,
                                 n_streams=n_streams, dtype=dtype,
                                 pad_to=pad_to)
    states = fleet.init_states(seed=0)

    rng = np.random.default_rng(0)
    ticks = [jnp.asarray(rng.integers(
        0, 256, (n_streams, 720, 1280, 3), dtype=np.uint8))
        for _ in range(n_ticks)]

    # Warmup: compile AND warm the remote execution path. The axon
    # tunnel's first ~100 executions of a fresh program run ~40x slower
    # than steady state (measured: 158 -> 4.2 ms/frame for the lateral
    # program, BENCH_NOTES "Remote execution warm-up"); timing inside
    # that window measures the tunnel's warm-up, not the chip.
    for t in range(warmup_ticks):
        out, states = fleet(ticks[t % n_ticks], states)
    np.asarray(out["scalars"])

    # The carried states chain tick-to-tick, so ONE final fetch of the
    # scalars (derived from the final states) transitively forces every
    # tick to have really executed — no memoized replays (states differ
    # every tick) and no per-tick fetch serializing the loop on the
    # tunnel's ~10 ms round trip (which measures the tunnel, not the
    # chip; production reads results over local PCIe). Median of 3
    # windows rejects shared-tunnel interference.
    window_fps = []
    for w in range(3):
        t0 = time.perf_counter()
        for t in range(n_ticks):
            out, states = fleet(ticks[(w * 17 + t) % n_ticks], states)
        np.asarray(out["scalars"])
        dt = (time.perf_counter() - t0) / n_ticks
        window_fps.append(n_streams / dt)
    window_fps.sort()
    return window_fps[1]  # aggregate frames/sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="1,2,4,8")
    ap.add_argument("--ticks", type=int, default=60)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--pad_to", type=int, default=0,
                    help="run the device program at this physical batch "
                         "(>= streams), slicing outputs — probes whether "
                         "a slow batch-N conv tiling is avoidable")
    args = ap.parse_args()

    from autoware_vision_pilot_tpu.core.cache import setup_compilation_cache
    setup_compilation_cache(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")

    suffix = "_int8" if args.int8 else ""
    if args.pad_to:
        suffix += f"_pad{args.pad_to}"
    for n in [int(s) for s in args.streams.split(",")]:
        fps = bench_fleet(n, args.ticks, int8=args.int8,
                          pad_to=args.pad_to)
        print(json.dumps({
            "metric": f"fleet_lateral_{n}streams_aggregate_fps{suffix}",
            "value": round(fps, 2), "unit": "frames/sec",
            "per_stream_fps": round(fps / n, 2)}), flush=True)


if __name__ == "__main__":
    main()
