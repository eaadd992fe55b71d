"""Per-stage cost table for the headline pipeline (VERDICT r3 item 10).

Times each stage of the fused 3-net pipeline as its own jitted program
with the hardened chained-checksum harness (verify SKILL.md r3 recipe),
so the decoder-tail roofline work attacks the right stage:

  preprocess         720p uint8 -> 320x640 bf16 imagenet tensor
  backbone           EfficientNet-B0 trunk (shared SceneSeg/Scene3D)
  stack_full         trunk + SceneContext/Neck/Heads (seg + depth)
  seg_decoder        stack_full minus backbone (derived)
  egolanes_full      EgoLanes net
  postprocess        argmax + threshold + depth scale
  fused_everything   the bench.py --fused program

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_pipeline_stages.py
"""
from __future__ import annotations

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
    s = jnp.float32(0.0)
    for i in range(N_WARM):
        s = fn(s * 1e-20 + jnp.float32(i), *args)
    float(np.asarray(s))
    best = np.inf
    for _ in range(2):
        s = jnp.float32(1.0)
        t0 = time.perf_counter()
        for i in range(N_TIME):
            s = fn(s * 1e-20 + jnp.float32(N_WARM + i), *args)
        float(np.asarray(s))
        best = min(best, (time.perf_counter() - t0) / N_TIME * 1e3)
    return best


def main():
    from autoware_vision_pilot_tpu.models import EgoLanesNetwork
    from autoware_vision_pilot_tpu.models.multitask import (
        SharedPerceptionStack)
    from autoware_vision_pilot_tpu.models.efficientnet import (
        EfficientNetB0Features)
    from autoware_vision_pilot_tpu.ops import (
        preprocess_imagenet, argmax_mask, threshold_channels,
        depth_minmax_scale)

    kw = dict(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    stack = SharedPerceptionStack(with_domain=False, **kw)
    lanes = EgoLanesNetwork(**kw)
    key = jax.random.key(0)
    x0 = jnp.zeros((1, 320, 640, 3), jnp.bfloat16)
    stack_v = stack.init(key, x0)
    lanes_v = lanes.init(key, x0)

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 256, (720, 1280, 3), np.uint8))
    x = jnp.asarray(rng.normal(size=(1, 320, 640, 3)), jnp.bfloat16)

    results = {}

    @jax.jit
    def t_pre(salt, frame):
        out = preprocess_imagenet((frame + salt.astype(jnp.uint8))[None],
                                  (320, 640), dtype=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32))
    results["preprocess"] = timeit(t_pre, frame)

    # standalone backbone with its own params (same arch as the trunk)
    bb_own = EfficientNetB0Features(**kw)
    bb_own_v = bb_own.init(key, x0)

    @jax.jit
    def t_bb(salt, x):
        feats = bb_own.apply(bb_own_v, x + salt.astype(x.dtype))
        return jnp.sum(feats[4].astype(jnp.float32))
    results["backbone"] = timeit(t_bb, x)

    @jax.jit
    def t_stack(salt, x):
        seg, depth, _ = stack.apply(stack_v, x + salt.astype(x.dtype))
        return (jnp.sum(seg.astype(jnp.float32)) +
                jnp.sum(depth.astype(jnp.float32)))
    results["stack_full"] = timeit(t_stack, x)

    @jax.jit
    def t_lanes(salt, x):
        out = lanes.apply(lanes_v, x + salt.astype(x.dtype))
        return jnp.sum(out.astype(jnp.float32))
    results["egolanes_full"] = timeit(t_lanes, x)

    seg0 = jnp.zeros((1, 320, 640, 3), jnp.float32)
    d0 = jnp.zeros((1, 320, 640, 1), jnp.float32)
    l0 = jnp.zeros((1, 80, 160, 3), jnp.float32)

    @jax.jit
    def t_post(salt, seg, d, lmask):
        m = argmax_mask(seg + salt)
        dd = depth_minmax_scale(d + salt)
        lm = threshold_channels(lmask + salt)
        return (jnp.sum(m).astype(jnp.float32) + jnp.mean(dd) +
                jnp.sum(lm))
    results["postprocess"] = timeit(t_post, seg0, d0, l0)

    @jax.jit
    def t_fused(salt, frame):
        xx = preprocess_imagenet((frame + salt.astype(jnp.uint8))[None],
                                 (320, 640), dtype=jnp.bfloat16)
        seg, depth, _ = stack.apply(stack_v, xx)
        mask = argmax_mask(seg.astype(jnp.float32))
        dd = depth_minmax_scale(depth.astype(jnp.float32))
        lm = threshold_channels(lanes.apply(lanes_v, xx).astype(jnp.float32))
        return (jnp.sum(mask).astype(jnp.float32) + jnp.mean(dd) +
                jnp.sum(lm))
    results["fused_everything"] = timeit(t_fused, frame)

    results["seg_decoder_derived"] = round(
        results["stack_full"] - results["backbone"], 3)
    for k, v in results.items():
        print(json.dumps({"stage": k, "ms": round(float(v), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
