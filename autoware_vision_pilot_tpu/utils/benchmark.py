"""Model benchmarking: warmup + timed runs, FLOPs estimation, profiler
traces.

Equivalent of Models/data_utils/benchmark.py:17-48 (50 warmup + 1000 timed
runs with device sync, thop FLOPs :94-95) — here FLOPs come from XLA's own
cost analysis and traces from jax.profiler.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def benchmark(fn: Callable, *args, warmup: int = 50, runs: int = 1000,
              name: str = "model") -> Dict[str, float]:
    """Time a jitted callable with proper device sync. Returns stats dict
    and prints the reference-style report."""
    f = fn if hasattr(fn, "lower") else jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        out = f(*args)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(runs):
        out = f(*args)
    jax.block_until_ready(out)
    total = time.perf_counter() - t0
    ms = total / runs * 1e3
    fps = runs / total
    print(f"[bench] {name}: {ms:.3f} ms/iter, {fps:.1f} FPS "
          f"({warmup} warmup + {runs} timed)")
    return {"ms_per_iter": ms, "fps": fps, "runs": runs}


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """Analytical FLOP count from XLA cost analysis (thop analog)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def tensor_stats(name: str, x) -> str:
    """Debug helper matching the reference's printTensorStats
    (test/test_autosteer.cpp:21-49): min/max/mean/std + first values."""
    x = jnp.asarray(x, jnp.float32)
    s = (f"{name}: shape={tuple(x.shape)} min={float(jnp.min(x)):.5f} "
         f"max={float(jnp.max(x)):.5f} mean={float(jnp.mean(x)):.5f} "
         f"std={float(jnp.std(x)):.5f} "
         f"first={[round(float(v), 4) for v in x.reshape(-1)[:5]]}")
    print(s)
    return s


def compare_tensors(a, b, name: str = "tensors") -> float:
    """Frame-to-frame identity check (test_autosteer.cpp:51-82 — catches
    'identical tensor' bugs in temporal pipelines). Returns max |diff|."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    d = float(jnp.max(jnp.abs(a - b)))
    same = d == 0.0
    print(f"[compare] {name}: max|diff|={d:.6f}"
          f"{'  *** IDENTICAL — temporal buffer bug? ***' if same else ''}")
    return d
