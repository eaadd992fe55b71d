"""Deployment export: serialized StableHLO artifacts.

The reference's deployment contract is the ONNX file
(Models/exports/convert_pytorch_to_onnx.py, shapes :90-97). The TPU-native
equivalent is jax.export: the jitted forward (preprocess + net + postproc)
serializes to a portable StableHLO artifact that any XLA runtime (TPU, GPU,
CPU; C++ via PjRt) can load without Python — the same role ONNX plays for
ONNX-Runtime/TensorRT.
"""
from __future__ import annotations

import pathlib
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

# reference export shapes (convert_pytorch_to_onnx.py:90-97)
EXPORT_SHAPES = {
    "SceneSeg": (1, 320, 640, 3),
    "Scene3D": (1, 320, 640, 3),
    "DomainSeg": (1, 320, 640, 3),
    "EgoLanes": (1, 320, 640, 3),
    "AutoSpeed": (1, 512, 1024, 3),
    "AutoSteer": (1, 512, 1024, 3),
    "AutoDrive": (1, 512, 1024, 3),
}


def export_stablehlo(fn: Callable, example_args: Sequence,
                     path: str | pathlib.Path) -> pathlib.Path:
    """Serialize jit(fn) at the example shapes to <path> (bytes).

    Traces with AVP_CT_EINSUM=0: exports usually run on a CPU host but
    are consumed by TPU/GPU runtimes, and the einsum ConvTranspose
    lowering (a CPU-compile-time workaround) is measurably slower at
    TPU runtime (tools/bench_ct_ab.py) — artifacts must carry the
    deployment-optimal lax.conv_transpose form.
    """
    import os
    prev = os.environ.get("AVP_CT_EINSUM")
    os.environ["AVP_CT_EINSUM"] = "0"
    try:
        exported = jax_export.export(jax.jit(fn))(*example_args)
    finally:
        if prev is None:
            os.environ.pop("AVP_CT_EINSUM", None)
        else:
            os.environ["AVP_CT_EINSUM"] = prev
    data = exported.serialize()
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    return path


def load_stablehlo(path: str | pathlib.Path):
    """Deserialize an exported artifact; returns a callable."""
    exported = jax_export.deserialize(
        pathlib.Path(path).read_bytes())
    return exported.call


def export_model(model, variables, name: str,
                 out_dir: str | pathlib.Path = "exports",
                 dtype=jnp.bfloat16) -> pathlib.Path:
    """Export `model.apply(variables, x)` at the reference shape for
    `name` (weights baked into the artifact as constants)."""
    shape = EXPORT_SHAPES[name]

    def fwd(x):
        return model.apply(variables, x)

    example = (jnp.zeros(shape, dtype),)
    return export_stablehlo(fwd, example,
                            pathlib.Path(out_dir) / f"{name}.stablehlo")
