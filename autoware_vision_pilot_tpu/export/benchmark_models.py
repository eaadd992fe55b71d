"""Model benchmarking across precisions: f32 vs bf16 vs int8-PTQ.

Equivalent of Models/exports/benchmark_onnx_models.py (PyTorch vs
ONNX-FP32 vs INT8: speed + mIoU parity): measures per-precision latency
and output agreement (mIoU for segmentation outputs, max deviation for
dense outputs) against the f32 baseline.

Run: python -m autoware_vision_pilot_tpu.export.benchmark_models [model]
"""
from __future__ import annotations

import sys
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.benchmark import benchmark
from .quantize import QuantizedInference


def compare_precisions(model_f32, variables_f32, input_shape,
                       runs: int = 200, seg_output: bool = True,
                       name: str = "model") -> Dict[str, Dict]:
    """Returns {precision: {ms_per_iter, fps, miou_vs_f32|max_dev}}."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-2, 2, input_shape).astype(np.float32))

    results = {}

    f32 = jax.jit(lambda x: model_f32.apply(variables_f32, x))
    ref = np.asarray(f32(x), np.float32)
    results["f32"] = benchmark(f32, x, warmup=20, runs=runs,
                               name=f"{name}/f32")

    # bf16
    vars_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, variables_f32)
    bf16 = jax.jit(lambda x: model_f32.apply(
        vars_bf16, x.astype(jnp.bfloat16)))
    out = np.asarray(bf16(x), np.float32)
    results["bf16"] = benchmark(bf16, x, warmup=20, runs=runs,
                                name=f"{name}/bf16")
    results["bf16"].update(_agreement(ref, out, seg_output))

    # int8 PTQ weights
    q = QuantizedInference(model_f32, variables_f32, input_shape)
    out = np.asarray(q(x), np.float32)
    results["int8"] = benchmark(lambda x: q(x), x, warmup=20, runs=runs,
                                name=f"{name}/int8")
    results["int8"].update(_agreement(ref, out, seg_output))
    return results


def _agreement(ref: np.ndarray, out: np.ndarray, seg: bool) -> Dict:
    if seg and ref.ndim == 4 and ref.shape[-1] > 1:
        a = np.argmax(ref, -1)
        b = np.argmax(out, -1)
        inter = 0.0
        union = 0.0
        for c in range(ref.shape[-1]):
            inter += ((a == c) & (b == c)).sum()
            union += ((a == c) | (b == c)).sum()
        return {"miou_vs_f32": float(inter / max(union, 1))}
    return {"max_dev_vs_f32": float(np.abs(ref - out).max())}


def main(argv=None):
    name = (argv or sys.argv[1:] or ["SceneSegLite"])[0]
    if name == "SceneSegLite":
        from ..models.lite import DeepLabV3Plus
        model = DeepLabV3Plus(output_channels=3)
        shape = (1, 320, 640, 3)
    elif name == "SceneSeg":
        from ..models.scene_seg import SceneSegNetwork
        model = SceneSegNetwork()
        shape = (1, 320, 640, 3)
    else:
        raise SystemExit(f"unknown model {name}")
    variables = model.init(jax.random.key(0), jnp.zeros(shape))
    res = compare_precisions(model, variables, shape, name=name)
    for k, v in res.items():
        print(k, v)


if __name__ == "__main__":
    main()
