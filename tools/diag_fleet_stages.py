"""Per-stage batch sweep of the fleet lateral step (N=4 dip root cause).

diag_fleet_n4 localized the dip: the bare EgoLanes conv stack scales
cleanly through batch 4 (7.3 ms), but the FULL fleet step jumps
superlinearly from 10.3 ms (N=3) to 17.7 ms (N=4) and stays there
(N=5: 17.4 ms) — a step function in the non-conv tail. This tool times
each stage of `build_lateral_step` as its own vmapped jitted program at
N in {2,3,4,5,8} to name the stage that steps:

  preprocess    (N,300,1280,3) u8 crop -> (N,320,640,3) bf16 resize
  autosteer     AutoSteerTemporalNet on (N,1,80,160,6)
  lane_filter   lane_filter_update on (N,80,160) masks x3
  lane_tracker  lane_tracker_update (BEV warp gathers)

Chained-checksum timing per verify SKILL.md (unique args, one final
fetch forces the window).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_fleet_stages.py
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.core.cache import setup_compilation_cache
setup_compilation_cache(
    pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")

N_WARM = 120
N_TIME = 120


def timeit(fn, *args):
    s = jnp.float32(0.0)
    for i in range(N_WARM):
        s = fn(s * 1e-20 + jnp.float32(i), *args)
    float(np.asarray(s))
    s = jnp.float32(1.0)
    t0 = time.perf_counter()
    for i in range(N_TIME):
        s = fn(s * 1e-20 + jnp.float32(N_WARM + i), *args)
    float(np.asarray(s))
    return (time.perf_counter() - t0) / N_TIME * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,3,4,5,8")
    ap.add_argument("--stages", default="preprocess,autosteer,"
                                        "lane_filter,lane_tracker")
    ap.add_argument("--iters", type=int, default=0,
                    help="override warm+timed iteration counts (smoke)")
    args = ap.parse_args()
    if args.iters:
        global N_WARM, N_TIME
        N_WARM = N_TIME = args.iters
    batches = [int(s) for s in args.batches.split(",")]
    stages = set(args.stages.split(","))

    from autoware_vision_pilot_tpu.ops import (
        preprocess_imagenet, threshold_channels)
    from autoware_vision_pilot_tpu.models.auto_steer_temporal import (
        AutoSteerTemporalNet)
    from autoware_vision_pilot_tpu.perception.lane_filter import (
        LaneFilterState, lane_filter_update)
    from autoware_vision_pilot_tpu.perception.lane_tracker import (
        LaneTrackerState, lane_tracker_update)

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    for n in batches:
        if "preprocess" in stages:
            frames = jnp.asarray(rng.integers(
                0, 256, (n, 300, 1280, 3), dtype=np.uint8))

            @jax.jit
            def prep(salt, frames):
                x = jax.vmap(lambda f: preprocess_imagenet(
                    f[None], (320, 640), dtype=dt)[0])(frames)
                return jnp.sum(x.astype(jnp.float32)) + salt

            ms = timeit(prep, frames)
            print(json.dumps({"stage": "preprocess", "n": n,
                              "ms": round(ms, 3)}), flush=True)

        if "autosteer" in stages:
            net = AutoSteerTemporalNet(dtype=dt, param_dtype=dt)
            v = net.init(jax.random.key(0),
                         jnp.zeros((1, 80, 160, 6), dt))
            x = jnp.asarray(rng.normal(size=(n, 1, 80, 160, 6)), dt)

            @jax.jit
            def steer(salt, x):
                _, logits = jax.vmap(
                    lambda xi: net.apply(v, xi))(
                        x + (salt * 1e-6).astype(dt))
                return jnp.sum(logits.astype(jnp.float32))

            ms = timeit(steer, x)
            print(json.dumps({"stage": "autosteer", "n": n,
                              "ms": round(ms, 3)}), flush=True)

        if "lane_filter" in stages:
            logits = jnp.asarray(rng.normal(size=(n, 80, 160, 3)),
                                 jnp.float32)
            st = jax.tree.map(
                lambda x: jnp.stack([x] * n),
                LaneFilterState.init(),
                is_leaf=lambda x: isinstance(x, jnp.ndarray))
            keys = jax.random.split(jax.random.key(0), n)

            @jax.jit
            def lf(salt, logits, st, keys):
                m = threshold_channels(logits + salt * 1e-6, 0.0)
                out = jax.vmap(lane_filter_update)(
                    m[..., 0], m[..., 1], m[..., 2], st, keys)
                return jnp.sum(out[0]) + jnp.sum(out[2])

            ms = timeit(lf, logits, st, keys)
            print(json.dumps({"stage": "lane_filter", "n": n,
                              "ms": round(ms, 3)}), flush=True)

        if "lane_tracker" in stages:
            st = jax.tree.map(
                lambda x: jnp.stack([x] * n),
                LaneTrackerState.init(),
                is_leaf=lambda x: isinstance(x, jnp.ndarray))
            deg = 5
            lc = jnp.asarray(rng.normal(size=(n, deg + 1)), jnp.float32)
            rc = jnp.asarray(rng.normal(size=(n, deg + 1)), jnp.float32)
            lv = jnp.ones((n,), bool)
            rv = jnp.ones((n,), bool)

            @jax.jit
            def lt(salt, lc, rc, lv, rv, st):
                trk, new = jax.vmap(
                    lambda a, b, c, d, e: lane_tracker_update(
                        a + salt * 1e-6, b, c + salt * 1e-6, d, e,
                        model_hw=(80, 160), image_hw=(300, 1280)))(
                    lc, lv, rc, rv, st)
                return jnp.sum(trk.center_coeffs)

            ms = timeit(lt, lc, rc, lv, rv, st)
            print(json.dumps({"stage": "lane_tracker", "n": n,
                              "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
