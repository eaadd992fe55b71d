"""Export the full per-frame pipeline as native-app bundles: the lateral
step always, and with --longitudinal the AutoSpeed detection step too.

Produces the artifact directory `host/tools/visionpilot_app.cpp` runs
Python-free — the TPU-native deployable unit matching the reference's
standalone production binary (VisionPilot/production_release/
main.cpp:1543-1959). The whole lateral stack (preprocess -> EgoLanes ->
temporal AutoSteer -> LaneFilter -> LaneTracker -> PathFinder ->
steering) exports as ONE StableHLO program with the carried temporal
state as explicit f32 wire tensors (export/native_app.py docstring).

Weights: random-init by default (export-contract proof); pass
--lanes/--steer msgpack checkpoints for trained weights.

Run: JAX_PLATFORMS=cpu python tools/export_native_app.py [outdir]
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="exports/native_app")
    ap.add_argument("--lanes", help="EgoLanes msgpack checkpoint")
    ap.add_argument("--steer", help="AutoSteerTemporal msgpack checkpoint")
    ap.add_argument("--speed", help="AutoSpeed msgpack checkpoint")
    ap.add_argument("--longitudinal", action="store_true",
                    help="also export the AutoSpeed detection bundle "
                         "(letterbox -> net -> decode -> fixed NMS) the "
                         "app's --lon mode consumes")
    ap.add_argument("--frame-hw", default="720,1280")
    args = ap.parse_args()
    frame_hw = tuple(int(v) for v in args.frame_hw.split(","))

    import jax
    import jax.numpy as jnp
    from autoware_vision_pilot_tpu.models.ego_lanes import EgoLanesNetwork
    from autoware_vision_pilot_tpu.models.auto_steer_temporal import (
        AutoSteerTemporalNet)
    from autoware_vision_pilot_tpu.runtime import (
        Config, build_lateral_step, init_lateral_state)
    from autoware_vision_pilot_tpu.export.native_app import export_native_app
    from autoware_vision_pilot_tpu.export.checkpoints import load_msgpack

    key = jax.random.key(0)
    dtype = jnp.float32  # cross-runtime parity dtype (XLA:CPU executes it)
    kw = dict(dtype=dtype, param_dtype=dtype)
    lanes_vars = EgoLanesNetwork(**kw).init(
        key, jnp.zeros((1, 320, 640, 3), dtype))
    steer_vars = AutoSteerTemporalNet(**kw).init(
        key, jnp.zeros((1, 80, 160, 6), dtype))
    if args.lanes:
        lanes_vars = load_msgpack(args.lanes, lanes_vars)
    if args.steer:
        steer_vars = load_msgpack(args.steer, steer_vars)

    step = build_lateral_step(lanes_vars, steer_vars, Config(),
                              frame_hw=frame_hw, dtype=dtype)
    state = init_lateral_state(seed=0)
    man = export_native_app(step, state, (*frame_hw, 3), args.out,
                            name="lateral")
    print(f"wrote {man}")

    if args.longitudinal:
        from autoware_vision_pilot_tpu.models.auto_speed import (
            AutoSpeedNetwork)
        from autoware_vision_pilot_tpu.runtime.pipeline import (
            build_longitudinal_step)
        speed_vars = AutoSpeedNetwork(variant="n", num_classes=4,
                                      img_h=640, img_w=640, **kw).init(
            key, jnp.zeros((1, 640, 640, 3), dtype))
        if args.speed:
            speed_vars = load_msgpack(args.speed, speed_vars)
        lon = build_longitudinal_step(speed_vars, Config(),
                                      frame_hw=frame_hw, dtype=dtype)
        # the app loop contract is stateful; the detector is stateless —
        # export with an empty state pytree (n_state 0)
        lon_step = lambda frame_u8, state: ({"dets": lon(frame_u8)}, state)
        man2 = export_native_app(lon_step, (), (*frame_hw, 3), args.out,
                                 name="longitudinal",
                                 outputs_from=lambda out: [out["dets"]])
        print(f"wrote {man2}")


if __name__ == "__main__":
    main()
