"""Measure the remaining headline levers together on the hardened
harness: single-program fusion (one dispatch/frame, weights as args)
x {bf16, selective int8}. Follows tools/bench_pipeline_int8.py results:
stream int8 min_ch=128 = 144.8 FPS vs 117.0 bf16.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_fused_int8.py
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

N = int(os.environ.get("N_FRAMES", "120"))
DEPTH = 16


def build_fused(variant: str, min_ch: int = 128, q_transpose: bool = False):
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
    x0 = jnp.zeros((1, 320, 640, 3), jnp.bfloat16)
    stack_v = stack.init(key, x0)
    lanes_v = lanes.init(key, x0)
    if variant == "int8":
        stack_v = quantize_variables_for_int8_conv(
            stack_v, min_ch, quantize_transpose=q_transpose)
        lanes_v = quantize_variables_for_int8_conv(
            lanes_v, min_ch, quantize_transpose=q_transpose)
        rng = np.random.default_rng(7)
        cal = [jnp.asarray(rng.normal(0.0, 1.0, x0.shape), jnp.bfloat16)
               for _ in range(4)]
        stack_v = calibrate_int8_activation_scales(stack, stack_v, cal)
        lanes_v = calibrate_int8_activation_scales(lanes, lanes_v, cal)

    @jax.jit
    def fused_step(sv, lv, frame_u8):
        x = preprocess_imagenet(frame_u8[None], (320, 640),
                                dtype=jnp.bfloat16)
        seg_logits, depth_map, _ = stack.apply(sv, x)
        mask = argmax_mask(seg_logits.astype(jnp.float32))
        d = depth_minmax_scale(depth_map.astype(jnp.float32))
        lane_masks = threshold_channels(
            lanes.apply(lv, x).astype(jnp.float32))
        summary = jnp.stack([
            jnp.sum(mask).astype(jnp.float32), jnp.mean(d),
            jnp.sum(lane_masks).astype(jnp.float32)])
        return summary

    sv = jax.device_put(stack_v)
    lv = jax.device_put(lanes_v)
    return lambda f: fused_step(sv, lv, f)


def measure(pipeline, frames):
    out = pipeline(frames[0])
    np.asarray(out)
    t0 = time.perf_counter()
    pending = deque()
    for f in frames:
        out = pipeline(f)
        out.copy_to_host_async()
        pending.append(out)
        if len(pending) > DEPTH:
            np.asarray(pending.popleft())
    while pending:
        np.asarray(pending.popleft())
    return len(frames) / (time.perf_counter() - t0)


def main():
    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.integers(0, 256, (720, 1280, 3),
                                       dtype=np.uint8)) for _ in range(N)]
    variants = [("bf16", 128, False), ("int8", 128, False),
                ("int8", 64, False), ("int8", 128, True),
                ("int8", 64, True)]
    if os.environ.get("VARIANTS"):  # e.g. "int8:64:1,int8:128:1"
        variants = []
        for spec in os.environ["VARIANTS"].split(","):
            v, m, t = spec.split(":")
            variants.append((v, int(m), bool(int(t))))
    for variant, min_ch, q_t in variants:
        p = build_fused(variant, min_ch, q_t)
        fps = measure(p, frames)
        print(f"[fused-1prog {variant} min_ch={min_ch} "
              f"q_transpose={int(q_t)}] {fps:7.1f} FPS "
              f"({fps / 30.0:.2f}x north star)", flush=True)


if __name__ == "__main__":
    main()
