"""Lite model evaluation CLI — analog of the reference's
Models/exports/lite_models/eval_{sceneseglite,scene3dlite,egolaneslite}.py
(the scripts behind the published Lite tables, model_library/Lite/
README.md:63-156).

One CLI covers the three Lite tasks; the task is selected by the config's
loss.type (cross_entropy -> mIoU, lanes_bce -> per-channel lane IoU,
depth_ssi -> AbsRel/delta1/MAE). Weights load from an orbax checkpoint
dir, a flax msgpack file, or a .onnx artifact (convert/onnx_import — the
reference's eval scripts take --onnx the same way). --bench additionally
reports device FPS with the chained-checksum methodology.

Usage:
  python -m autoware_vision_pilot_tpu.export.eval_lite \
      --config configs/SceneSegLite.yaml --msgpack best.msgpack \
      --data /data/val_npz --height 320 --width 640 [--bench]

Data layout: a directory of .npz files, each with `image` (H,W,3 uint8)
and `label` (H,W int for seg; H,W float for depth; H,W,C float for lane
masks). --synthetic N evaluates on N random samples (smoke/CI mode).
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parents[2]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.models.lite import build_lite_model
from autoware_vision_pilot_tpu.train.lite_trainer import (
    load_experiment_config)
from autoware_vision_pilot_tpu.train.metrics import (
    confusion_matrix, miou_from_confusion)
from autoware_vision_pilot_tpu.ops.preprocess import (
    IMAGENET_MEAN, IMAGENET_STD)


def load_weights(model, args, input_hw):
    var = model.init(jax.random.key(0),
                     jnp.zeros((1, *input_hw, 3), jnp.float32))
    if args.onnx:
        from autoware_vision_pilot_tpu.convert import import_onnx
        return import_onnx(var, args.onnx)
    if args.msgpack:
        from autoware_vision_pilot_tpu.export.checkpoints import load_msgpack
        return load_msgpack(args.msgpack, var)
    if args.checkpoint:
        from autoware_vision_pilot_tpu.export.checkpoints import (
            load_checkpoint)
        state = load_checkpoint(args.checkpoint, None)
        return {"params": state["params"],
                "batch_stats": state.get("batch_stats", {})}
    print("eval_lite: no weights given — evaluating the random init "
          "(smoke mode)", file=sys.stderr)
    return var


def iter_samples(args, input_hw):
    h, w = input_hw
    if args.synthetic:
        rng = np.random.default_rng(0)
        for _ in range(args.synthetic):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            if args.task == "depth":
                lbl = rng.random((h, w), dtype=np.float32)
            elif args.task == "lanes":
                lbl = (rng.random((h, w, 3)) > 0.9).astype(np.float32)
            else:
                lbl = rng.integers(0, args.num_classes, (h, w)).astype(
                    np.int32)
            yield img, lbl
        return
    data_dir = pathlib.Path(args.data)
    for f in sorted(data_dir.glob("*.npz")):
        d = np.load(f)
        yield d["image"], d["label"]


def main(argv=None):
    ap = argparse.ArgumentParser("Lite model evaluation (TPU)")
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", help="orbax checkpoint dir")
    ap.add_argument("--msgpack", help="flax msgpack weights file")
    ap.add_argument("--onnx", help=".onnx weights artifact")
    ap.add_argument("--data", help="dir of .npz samples (image,label)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="evaluate N synthetic samples (smoke mode)")
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--bench", action="store_true",
                    help="also measure device FPS (chained-checksum)")
    ap.add_argument("--bench-iters", type=int, default=120)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                    help="compute/param dtype (bf16 = MXU-native; the "
                         "TPU answer to the Jetson fp16 rows in the "
                         "reference Lite/README.md:63-156 table)")
    ap.add_argument("--int8", action="store_true",
                    help="selective int8 MXU conv path (PTQ-calibrated "
                         "static activation scales)")
    ap.add_argument("--int8-min-ch", type=int, default=128)
    ap.add_argument("--out", help="write the JSON summary here too")
    args = ap.parse_args(argv)

    cfg = load_experiment_config(args.config)
    loss_type = cfg.get("loss", {}).get("type", "cross_entropy")
    args.task = {"depth_ssi": "depth", "lanes_bce": "lanes"}.get(
        loss_type, "seg")
    args.num_classes = int(cfg.get("loss", {}).get("num_classes", 3))

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = build_lite_model(cfg, dtype=dt, param_dtype=dt)
    input_hw = (args.height, args.width)
    var = load_weights(model, args, input_hw)
    if args.int8:
        from autoware_vision_pilot_tpu.export.quantize import (
            quantize_variables_for_int8_conv,
            calibrate_int8_activation_scales)
        var = quantize_variables_for_int8_conv(var, args.int8_min_ch)
        rng = np.random.default_rng(11)
        cal = [(jnp.asarray(rng.integers(
            0, 256, (2, *input_hw, 3), dtype=np.uint8)).astype(dt) / 255.0
            - IMAGENET_MEAN) / IMAGENET_STD for _ in range(4)]
        var = calibrate_int8_activation_scales(model, var, cal)

    @jax.jit
    def forward(images_u8):
        x = images_u8.astype(dt) / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        return model.apply(var, x).astype(jnp.float32)

    # --- metric accumulation --------------------------------------------
    if args.task == "seg":
        cm = np.zeros((args.num_classes, args.num_classes), np.int64)
    elif args.task == "lanes":
        inter = np.zeros(3)
        union = np.zeros(3)
    else:
        absrel_sum, mae_sum, d1_sum, n_px = 0.0, 0.0, 0.0, 0

    n = 0
    for img, lbl in iter_samples(args, input_hw):
        out = np.asarray(forward(jnp.asarray(img[None])))[0]
        n += 1
        if args.task == "seg":
            # labels at output resolution (OS=1 head) or model output
            # upsampled — the reference evaluates at label resolution
            pred = out.argmax(-1)
            if pred.shape != lbl.shape:
                ry = lbl.shape[0] // pred.shape[0]
                lbl = lbl[::ry, ::ry][:pred.shape[0], :pred.shape[1]]
            cm += np.asarray(confusion_matrix(
                jnp.asarray(pred), jnp.asarray(lbl), args.num_classes,
                ignore_index=cfg.get("loss", {}).get("ignore_index")))
        elif args.task == "lanes":
            prob = 1.0 / (1.0 + np.exp(-out))
            pred = prob > 0.5
            if pred.shape != lbl.shape:
                ry = lbl.shape[0] // pred.shape[0]
                lbl = lbl[::ry, ::ry][:pred.shape[0], :pred.shape[1]]
            gt = lbl > 0.5
            inter += (pred & gt).sum((0, 1))
            union += (pred | gt).sum((0, 1))
        else:
            pred = out[..., 0]
            if pred.shape != lbl.shape:
                ry = lbl.shape[0] // pred.shape[0]
                lbl = lbl[::ry, ::ry][:pred.shape[0], :pred.shape[1]]
            valid = lbl > 1e-6
            p, g = pred[valid], lbl[valid]
            absrel_sum += float((np.abs(p - g) / np.maximum(g, 1e-6)).sum())
            mae_sum += float(np.abs(p - g).sum())
            ratio = np.maximum(p / np.maximum(g, 1e-6),
                               g / np.maximum(p, 1e-6))
            d1_sum += float((ratio < 1.25).sum())
            n_px += int(valid.sum())

    summary = {"config": str(args.config), "task": args.task,
               "samples": n, "input_hw": list(input_hw)}
    if args.task == "seg":
        per_class, miou, overall = miou_from_confusion(cm)
        summary["miou"] = round(float(miou), 5)
        summary["overall_iou"] = round(float(overall), 5)
        summary["per_class_iou"] = [
            None if np.isnan(x) else round(float(x), 5) for x in per_class]
    elif args.task == "lanes":
        iou = inter / np.maximum(union, 1)
        summary["lane_iou"] = [round(float(x), 5) for x in iou]
        summary["mean_lane_iou"] = round(float(iou.mean()), 5)
    else:
        summary["absrel"] = round(absrel_sum / max(n_px, 1), 5)
        summary["mae"] = round(mae_sum / max(n_px, 1), 5)
        summary["delta1"] = round(d1_sum / max(n_px, 1), 5)

    if args.bench:
        # chained-checksum timing (unique args per call; one final fetch)
        h, w = input_hw
        frame = jnp.asarray(
            np.random.default_rng(1).integers(0, 256, (1, h, w, 3),
                                              dtype=np.uint8))

        @jax.jit
        def step(salt, f):
            out = forward(f + (salt.astype(jnp.uint8) % 3))
            return jnp.sum(out.astype(jnp.float32)) * 1e-20 + salt

        s = jnp.float32(0.0)
        for i in range(args.bench_iters):
            s = step(s + jnp.float32(i), frame)
        float(np.asarray(s))
        s = jnp.float32(1.0)
        t0 = time.perf_counter()
        for i in range(args.bench_iters):
            s = step(s + jnp.float32(i + args.bench_iters), frame)
        float(np.asarray(s))
        ms = (time.perf_counter() - t0) / args.bench_iters * 1e3
        summary["device_ms_per_frame"] = round(ms, 3)
        summary["device_fps"] = round(1000.0 / ms, 1)

    line = json.dumps(summary)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")
    return summary


if __name__ == "__main__":
    main()
