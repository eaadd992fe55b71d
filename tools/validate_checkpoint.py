#!/usr/bin/env python3
"""Validation-as-test: full mIoU validation of a checkpoint over unified
datasets (Models/training/test_validate_scene_seg.py analog).

Run: python tools/validate_checkpoint.py --model SceneSeg \
        --checkpoint w.msgpack --data <root>:<DATASET> [--data ...]
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SceneSeg")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--data", action="append", required=True,
                    help="<root>:<DATASET_NAME>, repeatable")
    ap.add_argument("--batch", type=int, default=4)
    a = ap.parse_args(argv)

    from autoware_vision_pilot_tpu.models import SceneSegNetwork
    from autoware_vision_pilot_tpu.train import (
        SceneSegDataset, confusion_matrix, miou_from_confusion)
    from autoware_vision_pilot_tpu.train.datasets import batched_loader
    from autoware_vision_pilot_tpu.export import load_msgpack
    from autoware_vision_pilot_tpu.ops.preprocess import (
        IMAGENET_MEAN, IMAGENET_STD)

    model = SceneSegNetwork()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 320, 640, 3)))
    if a.checkpoint:
        variables = load_msgpack(a.checkpoint, variables)

    @jax.jit
    def val_step(images, labels):
        x = images.astype(jnp.float32) / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        out = model.apply(variables, x)
        return confusion_matrix(jnp.argmax(out, -1), labels, 3)

    cm_total = None
    for spec in a.data:
        root, name = spec.rsplit(":", 1)
        ds = SceneSegDataset(f"{root}/images", f"{root}/labels", name)
        n_val = ds.item_count()[1]
        for imgs, labs, _ in batched_loader(ds, range(n_val), a.batch,
                                            (320, 640), train=False):
            cm = val_step(jnp.asarray(imgs), jnp.asarray(labs))
            cm_total = cm if cm_total is None else cm_total + cm
        print(f"[val] {name}: done ({n_val} samples)")

    iou, miou, overall = miou_from_confusion(cm_total)
    names = ["background", "foreground", "road"]
    for n, v in zip(names, iou):
        print(f"  IoU {n}: {v:.4f}")
    print(f"mIoU: {miou:.4f}  overall: {overall:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
