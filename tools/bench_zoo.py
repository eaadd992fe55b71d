"""Zoo-wide model benchmark — the reference's multi-model benchmark tool
(Models/exports/benchmark_onnx_models.py: per-model inference speed at
export shapes) rebuilt for TPU with the hardened chained-checksum harness
(verify SKILL.md r3 recipe).

Each model runs as its own jitted bf16 program at the reference export
shape (export/stablehlo_export.EXPORT_SHAPES), B=1, weights as arguments
stay device-resident. Prints one JSON line per model.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_zoo.py
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


def checksum(out):
    leaves = jax.tree.leaves(out)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def models():
    """(name, module, input_shape) at the reference export shapes
    (convert_pytorch_to_onnx.py:90-97)."""
    kw = dict(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    from autoware_vision_pilot_tpu.models import (
        SceneSegNetwork, EgoLanesNetwork)
    from autoware_vision_pilot_tpu.models.scene_3d import Scene3DNetwork
    from autoware_vision_pilot_tpu.models.domain_seg import DomainSegNetwork
    from autoware_vision_pilot_tpu.models.auto_speed import AutoSpeedNetwork
    from autoware_vision_pilot_tpu.models.auto_steer import AutoSteerNetwork
    from autoware_vision_pilot_tpu.models.auto_drive import AutoDriveNetwork
    from autoware_vision_pilot_tpu.models.lite.deeplabv3plus import (
        DeepLabV3Plus)

    yield "SceneSeg", SceneSegNetwork(**kw), (1, 320, 640, 3)
    yield "Scene3D", Scene3DNetwork(**kw), (1, 320, 640, 3)
    yield "DomainSeg", DomainSegNetwork(**kw), (1, 320, 640, 3)
    yield "EgoLanes", EgoLanesNetwork(**kw), (1, 320, 640, 3)
    yield ("AutoSpeed-n",
           AutoSpeedNetwork(variant="n", num_classes=4, img_h=640,
                            img_w=640, **kw), (1, 640, 640, 3))
    yield ("AutoSteer-n",
           AutoSteerNetwork(variant="n", img_h=512, img_w=1024, **kw),
           (1, 512, 1024, 3))
    yield ("AutoDrive",
           AutoDriveNetwork(**kw), (1, 512, 1024, 3))  # (t-1, t) pair
    yield ("SceneSegLite-DLV3P",
           DeepLabV3Plus(output_channels=3, **kw), (1, 320, 640, 3))


def main():
    rng = np.random.default_rng(0)
    for name, m, shape in models():
        try:
            two_frame = name == "AutoDrive"  # fwd(prev, curr)
            x0 = jnp.zeros(shape, jnp.bfloat16)
            v = (m.init(jax.random.key(0), x0, x0) if two_frame
                 else m.init(jax.random.key(0), x0))

            if two_frame:
                @jax.jit
                def fwd(salt, x, m=m, v=v):
                    xs = x + salt.astype(x.dtype)
                    return checksum(m.apply(v, xs, xs + 1))
            else:
                @jax.jit
                def fwd(salt, x, m=m, v=v):
                    return checksum(m.apply(v, x + salt.astype(x.dtype)))

            x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
            ms = timeit(fwd, x)
            n_params = sum(p.size for p in jax.tree.leaves(v))
            print(json.dumps({
                "model": name, "shape": list(shape),
                "ms_per_forward": round(ms, 3),
                "fps": round(1e3 / ms, 1),
                "params_m": round(n_params / 1e6, 2),
            }), flush=True)
        except Exception as e:  # keep sweeping on a per-model failure
            print(json.dumps({"model": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
