"""Microbenchmark: is an int8-in/int8-out conv chain faster than bf16?

Round-1 finding (BENCH_NOTES.md "int8 experiments"): per-layer int8 convs
with f32 dequant between layers measured SLOWER than bf16 — the models
are activation-bandwidth bound, so int8 only pays if activations stay
int8 BETWEEN layers (1 byte vs 2 of HBM traffic per element) with the
requant folded into the conv epilogue.

This benchmark answers that question in isolation before committing to a
QAT-level redesign: K stacked 3x3 convs at representative decoder shapes,
three variants
  bf16    : bf16 weights/activations + tanh-GELU
  int8-f32: int8 MXU conv, f32 activations between layers (round-1 mode)
  int8-i8 : int8 MXU conv, static scales, GELU folded into the requant
            epilogue, int8 activations between layers (round-2 mode)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_int8_chain.py
"""
from __future__ import annotations

import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from autoware_vision_pilot_tpu.core.cache import setup_compilation_cache
setup_compilation_cache(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")

import os
# Defaults chosen so kernel time dominates the ~2 ms per-execution
# dispatch floor of the remote tunnel (measured: at K=6/B=1 every variant
# reads ~1.9 ms regardless of dtype — that is the floor, not the kernel).
K_LAYERS = int(os.environ.get("K_LAYERS", "48"))
BATCH = int(os.environ.get("BATCH", "8"))


def gelu_tanh(x):
    return 0.5 * x * (1 + jnp.tanh(0.7978845608 * (x + 0.044715 * x ** 3)))


def conv_kw():
    return dict(window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))


def chain_bf16(x, ws):
    h = x
    for w in ws:
        h = lax.conv_general_dilated(h, w, **conv_kw())
        h = gelu_tanh(h)
    return h


def chain_int8_f32(x, wqs, wscales, xscales):
    """Round-1 mode: quantize activation each layer, dequant to f32 out."""
    h = x
    for wq, sw, sx in zip(wqs, wscales, xscales):
        hq = jnp.clip(jnp.round(h / sx), -127, 127).astype(jnp.int8)
        y32 = lax.conv_general_dilated(
            hq, wq, preferred_element_type=jnp.int32, **conv_kw())
        h = gelu_tanh(y32.astype(jnp.float32) * (sx * sw))
    return h


def chain_int8_i8(xq, wqs, wscales, xscales, yscales):
    """Round-2 mode: activations STAY int8; GELU + requant fused into the
    conv epilogue; one dequant at the very end."""
    h = xq  # int8
    for i, (wq, sw, sx, sy) in enumerate(
            zip(wqs, wscales, xscales, yscales)):
        y32 = lax.conv_general_dilated(
            h, wq, preferred_element_type=jnp.int32, **conv_kw())
        yf = gelu_tanh(y32.astype(jnp.float32) * (sx * sw))
        h = jnp.clip(jnp.round(yf / sy), -127, 127).astype(jnp.int8)
    return h.astype(jnp.float32) * yscales[-1]


def timeit(fn, xs, *args, iters=200, warmup=150):
    """Measurement contract (BENCH_NOTES.md "Measurement validity" +
    "Remote execution warm-up"): EVERY call gets a unique per-iteration
    salt argument that feeds the output, so no (program, args) pair ever
    repeats and the tunnel cannot serve memoized replays (cycling a small
    input pool repeats pairs after len(xs) iterations — the round-2 bug
    this replaced); ~150 warm executions precede timing; materialization
    is forced with an async-copied per-iter summary awaited a window
    later (block_until_ready alone does not prove execution)."""
    from collections import deque
    salt = 0
    for i in range(warmup):
        out = fn(xs[i % len(xs)], jnp.float32(salt), *args)
        salt += 1
    np.asarray(out)
    t0 = time.perf_counter()
    pending = deque()
    for i in range(iters):
        out = fn(xs[i % len(xs)], jnp.float32(salt), *args)
        salt += 1
        out.copy_to_host_async()
        pending.append(out)
        if len(pending) > 16:
            np.asarray(pending.popleft())
    while pending:
        np.asarray(pending.popleft())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("20x40x512", (BATCH, 20, 40, 512), 512),
        ("40x80x256", (BATCH, 40, 80, 256), 256),
        ("80x160x128", (BATCH, 80, 160, 128), 128),
        ("160x320x64", (BATCH, 160, 320, 64), 64),
    ]
    print(f"K_LAYERS={K_LAYERS} BATCH={BATCH}")
    print(f"{'shape':>12} {'bf16':>8} {'int8-f32':>9} {'int8-i8':>8} "
          f"{'i8/bf16':>8}")
    N_IN = 16
    for name, xshape, ch in shapes:
        xs16 = [jnp.asarray(rng.normal(0, 1, xshape), jnp.bfloat16)
                for _ in range(N_IN)]
        ws, wqs, wscales = [], [], []
        for _ in range(K_LAYERS):
            w = rng.normal(0, 0.05, (3, 3, ch, ch)).astype(np.float32)
            ws.append(jnp.asarray(w, jnp.bfloat16))
            s = np.abs(w).max(axis=(0, 1, 2)) / 127.0
            wqs.append(jnp.asarray(
                np.clip(np.round(w / s), -127, 127), jnp.int8))
            wscales.append(jnp.asarray(s, jnp.float32))
        xscales = [jnp.float32(0.05)] * K_LAYERS
        yscales = [jnp.float32(0.05)] * K_LAYERS

        # each variant returns a scalar summary so the per-iter fetch is
        # tiny; the reduction cost is negligible vs K_LAYERS 3x3 convs.
        # `salt` is the uniqueness argument timeit passes — it must feed
        # the output so the executable cannot drop it.
        f_bf16 = jax.jit(lambda x, salt, w=tuple(ws):
                         jnp.sum(chain_bf16(x, w).astype(jnp.float32))
                         + salt * 1e-12)
        f_i8f32 = jax.jit(lambda x, salt, w=tuple(wqs), s=tuple(wscales),
                          xs=tuple(xscales):
                          jnp.sum(chain_int8_f32(
                              x.astype(jnp.float32), w, s, xs))
                          + salt * 1e-12)
        xq16 = [jnp.clip(jnp.round(
            x.astype(jnp.float32) / 0.05), -127, 127).astype(jnp.int8)
            for x in xs16]
        f_i8i8 = jax.jit(lambda xq, salt, w=tuple(wqs), s=tuple(wscales),
                         xs=tuple(xscales), ys=tuple(yscales):
                         jnp.sum(chain_int8_i8(xq, w, s, xs, ys))
                         + salt * 1e-12)

        t1 = timeit(f_bf16, xs16)
        t2 = timeit(f_i8f32, xs16)
        t3 = timeit(f_i8i8, xq16)
        flops = 2 * BATCH * xshape[1] * xshape[2] * ch * ch * 9 * K_LAYERS
        print(f"{name:>12} {t1:8.3f} {t2:9.3f} {t3:8.3f} {t3/t1:8.2f}"
              f"   bf16={flops/t1/1e9:5.0f} i8={flops/t3/1e9:5.0f} TOP/s")


if __name__ == "__main__":
    main()


def recheck_anomaly():
    """20x40x512 bf16 measured above v5e peak — rule out result caching by
    feeding distinct inputs per call and checking scaling with layers."""
    rng = np.random.default_rng(1)
    ch = 512
    xs = [jnp.asarray(rng.normal(0, 1, (1, 20, 40, ch)), jnp.bfloat16)
          for _ in range(16)]
    ws = [jnp.asarray(rng.normal(0, 0.05, (3, 3, ch, ch)), jnp.bfloat16)
          for _ in range(K_LAYERS)]
    f = jax.jit(chain_bf16)
    for _ in range(10):
        out = f(xs[0], ws)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(200):
        out = f(xs[i % 16], ws)
    jax.block_until_ready(out)
    per = (time.perf_counter() - t0) / 200 * 1e3
    flops = 2 * 20 * 40 * ch * ch * 9 * K_LAYERS
    print(f"distinct-inputs 20x40x512 bf16: {per:.3f} ms "
          f"({flops / per / 1e9:.0f} TFLOP/s)")
