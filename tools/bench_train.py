"""Training throughput benchmark: SceneSeg DP train step on real hardware.

Measures sustained samples/sec of the full jitted SPMD training step
(forward + backward + AdamW + batch-stats update) at the reference's
320x640 training resolution in bf16 compute — the TPU analog of the
reference's torch DDP step (Models/training/auto_speed_trainer.py:92-115).
The reference publishes no training-throughput numbers; this records ours.

Usage: python tools/bench_train.py [--batch 16] [--steps 20]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--microbatches", type=int, default=1)
    args = ap.parse_args()

    from autoware_vision_pilot_tpu.core.cache import setup_compilation_cache
    setup_compilation_cache(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")

    import optax
    from autoware_vision_pilot_tpu.core.mesh import make_mesh
    from autoware_vision_pilot_tpu.models import SceneSegNetwork
    from autoware_vision_pilot_tpu.train import (
        create_seg_train_state, make_seg_train_step, segmentation_ce_loss)

    mesh = make_mesh()
    model = SceneSegNetwork(dtype=jnp.bfloat16)
    tx = optax.adamw(1e-4)
    state = create_seg_train_state(model, (1, 320, 640, 3),
                                   jax.random.key(0), tx)
    run, _ = make_seg_train_step(
        model, tx, loss_fn=segmentation_ce_loss, mesh=mesh,
        microbatches=args.microbatches)

    B = args.batch
    rng = np.random.default_rng(0)
    # distinct batches (remote-execution memoization hardening, see
    # BENCH_NOTES.md "Measurement validity")
    batches = [
        (jnp.asarray(rng.normal(0.45, 0.22, (B, 320, 640, 3)),
                     jnp.float32),
         jnp.asarray(rng.integers(0, 3, (B, 320, 640)), jnp.int32))
        for _ in range(4)]

    key = jax.random.key(1)
    state, loss = run(state, *batches[0], key)  # compile
    jax.block_until_ready(loss)
    # warm the remote execution path (~100 cold executions per program —
    # BENCH_NOTES "Remote execution warm-up")
    for _ in range(120):
        key, k = jax.random.split(key)
        state, loss = run(state, *batches[0], k)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    losses = []
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, loss = run(state, *batches[i % len(batches)], k)
        losses.append(loss)
    jax.block_until_ready(losses[-1])
    dt = (time.perf_counter() - t0) / args.steps
    sps = B / dt
    print(json.dumps({
        "metric": "scene_seg_train_samples_per_sec_per_chip",
        "value": round(sps, 2), "unit": "samples/sec",
        "batch": B, "step_ms": round(dt * 1e3, 2),
        "final_loss": round(float(losses[-1]), 4)}))


if __name__ == "__main__":
    main()
