#!/usr/bin/env python3
"""Export every model family to StableHLO deployment artifacts at the
reference shapes (the convert_pytorch_to_onnx.py analog — one command
produces the full artifact set).

Run: python tools/export_all.py [--out exports/] [--checkpoint-dir DIR]
     [--models SceneSeg,EgoLanes,...]
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def build(name: str, dtype):
    kw = dict(dtype=dtype, param_dtype=dtype)
    if name == "SceneSeg":
        from autoware_vision_pilot_tpu.models import SceneSegNetwork
        return SceneSegNetwork(**kw), (1, 320, 640, 3)
    if name == "Scene3D":
        from autoware_vision_pilot_tpu.models import Scene3DNetwork
        return Scene3DNetwork(**kw), (1, 320, 640, 3)
    if name == "DomainSeg":
        from autoware_vision_pilot_tpu.models import DomainSegNetwork
        return DomainSegNetwork(**kw), (1, 320, 640, 3)
    if name == "EgoLanes":
        from autoware_vision_pilot_tpu.models import EgoLanesNetwork
        return EgoLanesNetwork(**kw), (1, 320, 640, 3)
    if name == "AutoSpeed":
        from autoware_vision_pilot_tpu.models.auto_speed import (
            AutoSpeedNetwork)
        return AutoSpeedNetwork(variant="n", num_classes=4, **kw), \
            (1, 512, 1024, 3)
    if name == "AutoSteer":
        from autoware_vision_pilot_tpu.models.auto_steer import (
            AutoSteerNetwork)
        return AutoSteerNetwork(variant="n", **kw), (1, 512, 1024, 3)
    if name == "AutoSteerTemporal":
        from autoware_vision_pilot_tpu.models.auto_steer_temporal import (
            AutoSteerTemporalNet)
        return AutoSteerTemporalNet(**kw), (1, 80, 160, 6)
    if name == "SceneSegLite":
        from autoware_vision_pilot_tpu.models.lite import DeepLabV3Plus
        return DeepLabV3Plus(output_channels=3, **kw), (1, 320, 640, 3)
    raise SystemExit(f"unknown model {name}")


DEFAULT_MODELS = ("SceneSeg", "Scene3D", "DomainSeg", "EgoLanes",
                  "AutoSpeed", "AutoSteer", "AutoSteerTemporal",
                  "SceneSegLite")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="exports")
    ap.add_argument("--checkpoint-dir", default="",
                    help="dir of <Model>.msgpack weight files")
    ap.add_argument("--models", default=",".join(DEFAULT_MODELS))
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    a = ap.parse_args(argv)

    from autoware_vision_pilot_tpu.export.stablehlo_export import (
        export_stablehlo)
    from autoware_vision_pilot_tpu.export import load_msgpack

    dtype = jnp.bfloat16 if a.dtype == "bf16" else jnp.float32
    for name in a.models.split(","):
        name = name.strip()
        model, shape = build(name, dtype)
        n_in = 2 if name == "AutoDrive" else 1
        example = tuple(jnp.zeros(shape, dtype) for _ in range(n_in))
        variables = model.init(jax.random.key(0), *example)
        if a.checkpoint_dir:
            ckpt = pathlib.Path(a.checkpoint_dir) / f"{name}.msgpack"
            if ckpt.exists():
                variables = load_msgpack(ckpt, variables)
                print(f"[export] {name}: loaded {ckpt}")

        def fwd(*xs):
            return model.apply(variables, *xs)

        p = export_stablehlo(
            fwd, example, pathlib.Path(a.out) / f"{name}.stablehlo")
        print(f"[export] {name} -> {p} ({p.stat().st_size // 1024} KiB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
