"""Diagnose the fleet N=4 aggregate-FPS dip (VERDICT r2 weak #5 / next #6).

Round 2 measured aggregate fleet FPS 271 (N=2) -> 225 (N=4) -> 362+ (N=8):
batch 4 is slower in aggregate than batch 2. This tool isolates WHERE:

1. per-N sweep of the EgoLanes forward alone (batched, no fleet state)
2. per-N sweep of the full fleet step (vmapped stateful lateral stack)
3. batch-4 vs batch-4-padded-to-8 (pad workaround test)

and prints per-batch ms + aggregate FPS as one JSON line per config.
All timings use the hardened methodology: f32 salt feeding the input so
every (program, args) pair is unique, 150-exec warm-up per program, async
block at the end.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_fleet_n4.py
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

N_WARM = 150
N_TIME = 150


def timeit(fn, *args):
    """Chained-checksum timing: each call's f32 salt carries the previous
    call's fetched-at-the-end checksum, so the single final fetch proves
    every execution ran (block_until_ready through the tunnel is phantom
    — BENCH_NOTES round-2 trap) and every (program, args) pair is unique
    (no memoized replays)."""
    s = jnp.float32(0.0)
    for i in range(N_WARM):
        s = fn(s * 1e-20 + jnp.float32(i), *args)
    float(np.asarray(s))
    t0 = time.perf_counter()
    s = jnp.float32(1.0)
    for i in range(N_TIME):
        s = fn(s * 1e-20 + jnp.float32(N_WARM + i), *args)
    float(np.asarray(s))
    return (time.perf_counter() - t0) / N_TIME * 1e3


def sweep_egolanes(batches):
    from autoware_vision_pilot_tpu.models.ego_lanes import EgoLanesNetwork
    m = EgoLanesNetwork(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    v = m.init(jax.random.key(0), jnp.zeros((1, 320, 640, 3), jnp.bfloat16))
    rng = np.random.default_rng(0)
    for n in batches:
        x = jnp.asarray(rng.normal(size=(n, 320, 640, 3)), jnp.bfloat16)

        @jax.jit
        def fwd(salt, x):
            out = m.apply(v, x + salt.astype(x.dtype))
            return jnp.sum(out.astype(jnp.float32))

        ms = timeit(fwd, x)
        print(json.dumps({"which": "egolanes_fwd", "n": n,
                          "ms_per_batch": round(ms, 3),
                          "aggregate_fps": round(n / ms * 1e3, 1)}),
              flush=True)


def sweep_fleet(batches):
    from autoware_vision_pilot_tpu.models.ego_lanes import EgoLanesNetwork
    from autoware_vision_pilot_tpu.models.auto_steer_temporal import (
        AutoSteerTemporalNet)
    from autoware_vision_pilot_tpu.runtime import Config, FleetLateralPipeline

    key = jax.random.key(0)
    dt = jnp.bfloat16
    lanes_vars = EgoLanesNetwork(dtype=dt, param_dtype=dt).init(
        key, jnp.zeros((1, 320, 640, 3), dt))
    steer_vars = AutoSteerTemporalNet(dtype=dt, param_dtype=dt).init(
        key, jnp.zeros((1, 80, 160, 6), dt))
    rng = np.random.default_rng(0)
    for n in batches:
        fleet = FleetLateralPipeline(lanes_vars, steer_vars, Config(),
                                     n_streams=n, dtype=dt)
        states = fleet.init_states(seed=0)
        # small pool is safe here: the carried states differ every tick,
        # so (program, args) never repeats even when frames cycle
        pool = [jnp.asarray(rng.integers(0, 256, (n, 720, 1280, 3),
                                         dtype=np.uint8))
                for _ in range(24)]
        # states chain tick-to-tick, so fetching the FINAL scalars (which
        # derive from the final states) transitively forces every tick
        for t in range(N_WARM):
            out, states = fleet(pool[t % 24], states)
        np.asarray(out["scalars"])
        t0 = time.perf_counter()
        for t in range(N_TIME):
            out, states = fleet(pool[(N_WARM + t) % 24], states)
        np.asarray(out["scalars"])
        ms = (time.perf_counter() - t0) / N_TIME * 1e3
        print(json.dumps({"which": "fleet_step", "n": n,
                          "ms_per_tick": round(ms, 3),
                          "aggregate_fps": round(n / ms * 1e3, 1)}),
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,3,4,5,6,8")
    ap.add_argument("--skip-fleet", action="store_true")
    args = ap.parse_args()
    batches = [int(s) for s in args.batches.split(",")]
    sweep_egolanes(batches)
    if not args.skip_fleet:
        sweep_fleet(batches)


if __name__ == "__main__":
    main()
