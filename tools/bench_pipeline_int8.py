"""End-to-end int8 vs bf16 A/B on the hardened measurement harness.

Round-1's per-op int8 comparisons used block-timing, which BENCH_NOTES
("Measurement validity revisited") showed is unreliable through the
remote tunnel. This is the trustworthy version: the full
SceneSeg+Scene3D+EgoLanes pipeline (the bench.py headline config) and
the B=10 clip config, bf16 vs selectively-int8-quantized
(quantize_variables_for_int8_conv + static activation calibration),
measured with distinct pre-uploaded frames and async-copied per-frame
summaries (forced materialization).

The isolated-chain data (tools/bench_int8_chain.py, K=48 B=8):
int8 is 1.5-2.9x faster than bf16 at >=128 channels, parity at 64.
MIN_CH selects which convs go int8.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pipeline_int8.py
"""
from __future__ import annotations

import os
import pathlib
import sys
import time
from collections import deque

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.core.cache import setup_compilation_cache
setup_compilation_cache(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")

MIN_CH = int(os.environ.get("MIN_CH", "128"))
N = int(os.environ.get("N_FRAMES", "120"))
DEPTH = 16


def build(variant: str, batch: int = 1):
    from autoware_vision_pilot_tpu.models import EgoLanesNetwork
    from autoware_vision_pilot_tpu.models.multitask import (
        SharedPerceptionStack)
    from autoware_vision_pilot_tpu.ops import (
        preprocess_imagenet, argmax_mask, threshold_channels,
        depth_minmax_scale)
    from autoware_vision_pilot_tpu.export.quantize import (
        quantize_variables_for_int8_conv,
        calibrate_int8_activation_scales)

    kw = dict(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    stack = SharedPerceptionStack(with_domain=False, **kw)
    lanes = EgoLanesNetwork(**kw)
    key = jax.random.key(0)
    x0 = jnp.zeros((batch, 320, 640, 3), jnp.bfloat16)
    stack_v = stack.init(key, x0)
    lanes_v = lanes.init(key, x0)

    if variant == "int8":
        stack_v = quantize_variables_for_int8_conv(
            stack_v, min_channels=MIN_CH)
        lanes_v = quantize_variables_for_int8_conv(
            lanes_v, min_channels=MIN_CH)
        rng = np.random.default_rng(7)
        cal = [jnp.asarray(rng.normal(0.0, 1.0, x0.shape), jnp.bfloat16)
               for _ in range(4)]
        stack_v = calibrate_int8_activation_scales(stack, stack_v, cal)
        lanes_v = calibrate_int8_activation_scales(lanes, lanes_v, cal)

    @jax.jit
    def stack_step(frame_u8):
        x = preprocess_imagenet(frame_u8, (320, 640), dtype=jnp.bfloat16)
        seg_logits, depth_map, _ = stack.apply(stack_v, x)
        mask = argmax_mask(seg_logits.astype(jnp.float32))
        d = depth_minmax_scale(depth_map.astype(jnp.float32))
        return x, mask, d

    @jax.jit
    def lanes_step(x, mask, d):
        lane_masks = threshold_channels(
            lanes.apply(lanes_v, x).astype(jnp.float32))
        summary = jnp.stack([
            jnp.sum(mask).astype(jnp.float32), jnp.mean(d),
            jnp.sum(lane_masks).astype(jnp.float32)])
        return mask, lane_masks, summary

    def pipeline(frames_u8):
        x, mask, d = stack_step(frames_u8)
        return lanes_step(x, mask, d)

    return pipeline


def measure(pipeline, frames, batch: int = 1, warm_frames=None):
    out = pipeline(frames[0])
    np.asarray(out[2])
    # warm the remote execution path on a DISJOINT pool (~150 cold
    # executions per program — BENCH_NOTES "Remote execution warm-up");
    # warm frames must not reappear in the timed loop or the tunnel
    # serves memoized replays
    for f in (warm_frames or []):
        out = pipeline(f)
    if warm_frames:
        np.asarray(out[2])
    t0 = time.perf_counter()
    pending = deque()
    for f in frames:
        out = pipeline(f)
        out[2].copy_to_host_async()
        pending.append(out[2])
        if len(pending) > DEPTH:
            np.asarray(pending.popleft())
    while pending:
        np.asarray(pending.popleft())
    dt = (time.perf_counter() - t0) / len(frames)
    return batch / dt


def agreement(p_bf16, p_int8, frame):
    m1, l1, _ = p_bf16(frame)
    m2, l2, _ = p_int8(frame)
    mask_agree = float(jnp.mean((m1 == m2).astype(jnp.float32)))
    lane_agree = float(jnp.mean((l1 == l2).astype(jnp.float32)))
    return mask_agree, lane_agree


def main():
    rng = np.random.default_rng(0)
    for batch, tag in ((1, "stream"), (10, "clip")):
        frames = [jnp.asarray(rng.integers(
            0, 256, (batch, 720, 1280, 3), dtype=np.uint8))
            for _ in range(max(N // batch, 24))]
        warm = [jnp.asarray(rng.integers(
            0, 256, (batch, 720, 1280, 3), dtype=np.uint8))
            for _ in range(max(150 // batch, 16))]
        p_bf16 = build("bf16", batch)
        p_int8 = build("int8", batch)
        fps_bf16 = measure(p_bf16, frames, batch, warm_frames=warm)
        fps_int8 = measure(p_int8, frames, batch, warm_frames=warm)
        ma, la = agreement(p_bf16, p_int8, frames[0])
        print(f"[{tag} B={batch} min_ch={MIN_CH}] "
              f"bf16 {fps_bf16:7.1f} FPS | int8 {fps_int8:7.1f} FPS "
              f"({fps_int8 / fps_bf16:4.2f}x) | "
              f"seg agree {ma:.4f}, lanes agree {la:.4f}", flush=True)


if __name__ == "__main__":
    main()
