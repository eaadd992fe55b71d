"""Benchmark: SceneSeg+Scene3D+EgoLanes multi-net pipeline FPS per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured FPS / 30 (the BASELINE.json north star: the full
3-net pipeline at >=30 FPS sustained per TPU chip).

The pipeline is the production configuration: one jitted XLA program per
frame doing fused preprocess (resize/normalize) -> three bf16 forwards
sharing nothing -> on-device postprocess (argmax + lane thresholds + depth
scaling). Frames stream host->device uint8; only tiny results return.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np
import jax
import jax.numpy as jnp


def _quantize_int8(model, variables, x0, min_channels=128):
    """Selective int8 MXU path (+24% streaming FPS measured, BENCH_NOTES
    "Round 2: int8 end-to-end"): int8 weights + static calibrated
    activation scales for convs with >= min_channels input channels."""
    from autoware_vision_pilot_tpu.export.quantize import (
        quantize_variables_for_int8_conv,
        calibrate_int8_activation_scales)
    variables = quantize_variables_for_int8_conv(variables, min_channels)
    rng = np.random.default_rng(7)
    cal = [jnp.asarray(rng.normal(0.0, 1.0, x0.shape), x0.dtype)
           for _ in range(4)]
    return calibrate_int8_activation_scales(model, variables, cal)


def build_pipeline(int8: bool = False, min_ch: int = 256):
    from autoware_vision_pilot_tpu.models import EgoLanesNetwork
    from autoware_vision_pilot_tpu.models.multitask import (
        SharedPerceptionStack)
    from autoware_vision_pilot_tpu.ops import (
        preprocess_imagenet, argmax_mask, threshold_channels,
        depth_minmax_scale)

    kw = dict(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    # SceneSeg+Scene3D share their (frozen, identical-by-training) backbone:
    # the fused stack computes the trunk once per frame — same outputs as
    # the separate networks (tests/test_multitask.py), less work.
    stack = SharedPerceptionStack(with_domain=False, **kw)
    lanes = EgoLanesNetwork(**kw)

    key = jax.random.key(0)
    x0 = jnp.zeros((1, 320, 640, 3), jnp.bfloat16)
    stack_v = stack.init(key, x0)
    lanes_v = lanes.init(key, x0)
    if int8:
        stack_v = _quantize_int8(stack, stack_v, x0, min_channels=min_ch)
        lanes_v = _quantize_int8(lanes, lanes_v, x0, min_channels=min_ch)

    # Two jitted programs (the remote-compile tunnel caps program size;
    # async dispatch overlaps execution). Preprocess fused into the first.
    @jax.jit
    def stack_step(frame_u8):
        x = preprocess_imagenet(frame_u8[None], (320, 640),
                                dtype=jnp.bfloat16)
        seg_logits, depth_map, _ = stack.apply(stack_v, x)
        mask = argmax_mask(seg_logits.astype(jnp.float32))
        d = depth_minmax_scale(depth_map.astype(jnp.float32))
        return x, mask, d

    @jax.jit
    def lanes_step(x, mask, d, prev_summary):
        lane_masks = threshold_channels(
            lanes.apply(lanes_v, x).astype(jnp.float32))
        # tiny per-frame summary whose eventual fetch forces real
        # materialization (block_until_ready alone does not guarantee
        # execution through the remote tunnel, and identical executions
        # can be memoized — see BENCH_NOTES.md "Measurement validity");
        # chained to the previous frame's summary so fetching the final
        # one transitively forces the whole window (main() "why the
        # chain").
        summary = jnp.stack([
            jnp.sum(mask).astype(jnp.float32), jnp.mean(d),
            jnp.sum(lane_masks).astype(jnp.float32)])
        summary = summary + prev_summary * 1e-20
        return lane_masks, summary

    def pipeline(frame_u8, prev_summary=None):
        if prev_summary is None:
            prev_summary = jnp.zeros((3,), jnp.float32)
        x, mask, d = stack_step(frame_u8)
        lane_masks, summary = lanes_step(x, mask, d, prev_summary)
        return mask, d, lane_masks, summary

    return pipeline


def build_pipeline_fused(int8: bool = False, min_ch: int = 256):
    """The reference configuration for non-tunneled deployments: ALL of
    preprocess + SceneSeg/Scene3D fused trunk + EgoLanes + postprocess in
    ONE XLA program (one dispatch per frame). Round 1 could not compile
    this through the remote tunnel (HTTP 413 payload cap) because the
    weights were baked into the HLO as constants; with weights passed as
    ARGUMENTS (commit ac39057) the program payload is tiny and the cap no
    longer applies."""
    from autoware_vision_pilot_tpu.models import EgoLanesNetwork
    from autoware_vision_pilot_tpu.models.multitask import (
        SharedPerceptionStack)
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
    if int8:
        stack_v = _quantize_int8(stack, stack_v, x0, min_channels=min_ch)
        lanes_v = _quantize_int8(lanes, lanes_v, x0, min_channels=min_ch)

    @jax.jit
    def fused_step(stack_v, lanes_v, frame_u8, prev_summary):
        x = preprocess_imagenet(frame_u8[None], (320, 640),
                                dtype=jnp.bfloat16)
        seg_logits, depth_map, _ = stack.apply(stack_v, x)
        mask = argmax_mask(seg_logits.astype(jnp.float32))
        d = depth_minmax_scale(depth_map.astype(jnp.float32))
        lane_masks = threshold_channels(
            lanes.apply(lanes_v, x).astype(jnp.float32))
        summary = jnp.stack([
            jnp.sum(mask).astype(jnp.float32), jnp.mean(d),
            jnp.sum(lane_masks).astype(jnp.float32)])
        # data-chain to the previous frame's summary (scaled to
        # numerical irrelevance): fetching the FINAL summary then
        # transitively forces every chained execution to have really run
        # — one tunnel round trip for the whole window instead of one
        # per frame (see main() "why the chain").
        summary = summary + prev_summary * 1e-20
        return mask, d, lane_masks, summary

    sv = jax.device_put(stack_v)
    lv = jax.device_put(lanes_v)

    def pipeline(frame_u8, prev_summary=None):
        if prev_summary is None:
            prev_summary = jnp.zeros((3,), jnp.float32)
        return fused_step(sv, lv, frame_u8, prev_summary)

    return pipeline


def bench_clip(batch: int = 10, clip_len: int = 100):
    """BASELINE config 3: EgoLanes + DomainSeg over a batched 100-frame
    clip — the time dimension becomes the batch dimension (the closest
    meaningful analog of sequence parallelism for this workload,
    SURVEY §5.7). Prints a JSON line with clip frames/sec."""
    import json
    from autoware_vision_pilot_tpu.models import (
        EgoLanesNetwork, DomainSegNetwork)
    from autoware_vision_pilot_tpu.ops import (
        preprocess_imagenet, threshold_channels)

    kw = dict(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    lanes = EgoLanesNetwork(**kw)
    domain = DomainSegNetwork(**kw)
    key = jax.random.key(0)
    x0 = jnp.zeros((batch, 320, 640, 3), jnp.bfloat16)
    lv = lanes.init(key, x0)
    dv = domain.init(key, x0)

    @jax.jit
    def lanes_step(frames_u8):
        x = preprocess_imagenet(frames_u8, (320, 640), dtype=jnp.bfloat16)
        return threshold_channels(
            lanes.apply(lv, x).astype(jnp.float32)), x

    @jax.jit
    def domain_step(x):
        return domain.apply(dv, x).astype(jnp.float32) > 0

    # Measurement validity: every execution's window is DISTINCT (sliding
    # by one frame through a long clip — repeating the same batch windows
    # lets the tunnel serve memoized replays), and ~150 executions warm
    # the remote execution path before timing (BENCH_NOTES "Remote
    # execution warm-up").
    n_warm, n_timed = 150, 50
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.integers(
        0, 256, (n_warm + n_timed + batch, 720, 1280, 3), dtype=np.uint8))

    def exec_window(j):
        masks, x = lanes_step(
            jax.lax.dynamic_slice_in_dim(clip, j, batch, axis=0))
        return domain_step(x)

    from collections import deque

    def drive(j0, n, depth=8):
        pending = deque()
        for j in range(j0, j0 + n):
            out = exec_window(j)
            out.copy_to_host_async()
            pending.append(out)
            if len(pending) > depth:
                np.asarray(pending.popleft())
        while pending:
            np.asarray(pending.popleft())

    out = exec_window(0)
    np.asarray(out)          # compile + force
    drive(0, n_warm)         # warm the execution path, results fetched

    t0 = time.perf_counter()
    drive(n_warm, n_timed)
    dt = time.perf_counter() - t0
    fps = batch * n_timed / dt
    print(json.dumps({
        "metric": "egolanes+domainseg_clip100_fps_per_chip",
        "value": round(fps, 2), "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3)}))


def main(fused: bool = True, int8: bool = True, min_ch: int = 256):
    # Default deployment config (round 5): ONE fused program with
    # selective int8 at min_ch=256 — the configuration that passed the
    # QAT >=0.999 argmax-agreement bar (0.99908) with int8 GT-mIoU at or
    # above bf16 (BENCH_NOTES "Round 5: QAT closure"). bf16 fallback:
    # --bf16.
    # persistent compilation cache (analog of the TRT engine cache),
    # keyed per machine+backend so foreign-host entries can't poison it
    from autoware_vision_pilot_tpu.core.cache import setup_compilation_cache
    setup_compilation_cache(pathlib.Path(__file__).parent / ".jax_cache")

    pipeline = (build_pipeline_fused(int8=int8, min_ch=min_ch) if fused
                else build_pipeline(int8=int8, min_ch=min_ch))
    rng = np.random.default_rng(0)
    # Measurement contract (see BENCH_NOTES.md "Measurement validity"):
    # - DISTINCT frame per iteration: the remote terminal memoizes
    #   identical (program, args) executions.
    # - A REAL per-frame result fetch: block_until_ready alone does not
    #   guarantee execution through the tunnel. The tiny summary vector's
    #   device->host copy starts asynchronously at dispatch and is awaited
    #   DEPTH frames later, overlapping the link round-trip with compute
    #   (verified: asarray costs 0.2 ms once the async copy has landed).
    # - Frames are PRE-UPLOADED: the axon tunnel moves ~51 MB/s, so a
    #   per-frame 2.7 MB upload costs 53 ms — that measures the tunnel,
    #   not the chip. Production hosts feed the chip over local PCIe.
    #   (Upload-per-frame through this tunnel: 19 FPS, link-bound.)
    N = 120
    frames = [jnp.asarray(rng.integers(0, 256, (720, 1280, 3),
                                       dtype=np.uint8)) for _ in range(N)]

    # Warmup: compile AND warm the remote execution path. The axon
    # tunnel's first ~100 executions of a fresh program run far slower
    # than steady state (measured 158 -> 4.2 ms/frame on the lateral
    # program — BENCH_NOTES "Remote execution warm-up"). The warm-up
    # frames are DISJOINT from the timed set and every warm-up result is
    # fetched: executing the timed (program, args) pairs here would turn
    # the timed loop into memoized replays, and unfetched executions may
    # never run at all (BENCH_NOTES "Measurement validity" items 1-2).
    warm_frames = [jnp.asarray(rng.integers(0, 256, (720, 1280, 3),
                                            dtype=np.uint8))
                   for _ in range(150)]
    out = pipeline(warm_frames[0])
    float(np.asarray(out[3])[0])
    s = None
    for f in warm_frames:
        out = pipeline(f, s)
        s = out[3]
    float(np.asarray(s)[0])  # forces the whole warm chain

    # Why the chain: every frame's summary depends on the previous
    # frame's, so ONE final fetch transitively proves every execution in
    # the window really ran (no memoized replays — all frames distinct;
    # no skipped executions — the fetched value depends on all of them).
    # Fetching a summary EVERY frame instead serializes the loop on the
    # tunnel's ~9-11 ms round trip and measures the tunnel, not the chip
    # (round-2 headline 117.7 and this morning's 88.5 are both just the
    # RTT of the day; the chip streams this pipeline far faster).
    # Production hosts read results over local PCIe at microseconds —
    # same rationale as pre-uploading input frames (above). Three
    # windows, median, to reject shared-tunnel interference.
    window_fps = []
    for w in range(3):
        t0 = time.perf_counter()
        s = None
        for i in range(N):
            out = pipeline(frames[(w * 37 + i) % N], s)
            s = out[3]
        float(np.asarray(s)[0])
        dt = (time.perf_counter() - t0) / N
        window_fps.append(1.0 / dt)
    window_fps.sort()
    fps = window_fps[1]
    dt = 1.0 / fps
    # Shared-tunnel interference makes same-program windows vary up to
    # 1.5-2x across minutes (BENCH_NOTES "round 3"); the spread is part
    # of the honest result. spread = (max-min)/median of the 3 windows.
    spread = (window_fps[-1] - window_fps[0]) / fps

    # Per-frame latency at pipeline depth 1 (dispatch -> result on host):
    # BASELINE.json's metric is "frames/sec/chip ...; p50 per-frame
    # latency". Fresh frames (never executed -> no memoized replays); each
    # iteration blocks on its own result, so this is the depth-1
    # latency-optimized mode, not the depth-16 throughput mode timed above.
    # 15 unmeasured mode-switch warm frames first: the first blocking
    # dispatch after the deep async loop pays a one-time drain/resync
    # cost (observed 7.5 s once) that is harness state, not per-frame
    # latency.
    lat_frames = [jnp.asarray(rng.integers(0, 256, (720, 1280, 3),
                                           dtype=np.uint8))
                  for _ in range(75)]
    for f in lat_frames[:15]:
        np.asarray(pipeline(f)[3])
    lat_ms = []
    for f in lat_frames[15:]:
        t0 = time.perf_counter()
        out = pipeline(f)
        np.asarray(out[3])
        lat_ms.append((time.perf_counter() - t0) * 1e3)
    lat_ms.sort()
    p50 = lat_ms[len(lat_ms) // 2]
    p99 = lat_ms[min(len(lat_ms) - 1, int(len(lat_ms) * 0.99))]

    metric = "scene_seg+scene3d+ego_lanes_pipeline_fps_per_chip"
    if fused:
        metric += "_fused1prog"
    if int8:
        metric += "_int8"
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
        "window_spread": round(spread, 3),
        "window_fps": [round(f, 1) for f in window_fps],
        "latency_ms_p50": round(p50, 2),
        "latency_ms_p99": round(p99, 2),
    }))


if __name__ == "__main__":
    if "--clip" in sys.argv:
        from autoware_vision_pilot_tpu.core.cache import (
            setup_compilation_cache)
        setup_compilation_cache(pathlib.Path(__file__).parent / ".jax_cache")
        bench_clip()
    else:
        main(fused="--unfused" not in sys.argv,
             int8="--bf16" not in sys.argv)
