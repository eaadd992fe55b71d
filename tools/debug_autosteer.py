#!/usr/bin/env python3
"""Manual E2E debug harness (the test_autosteer.cpp analog, N26): run
EgoLanes -> temporal AutoSteer over a video, print per-frame tensor
statistics and frame-to-frame tensor diffs to catch 'identical tensor'
temporal-buffer bugs (test_autosteer.cpp:21-82).

Run: python tools/debug_autosteer.py --video in.mp4 [--frames 30]
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
    ap.add_argument("--video", required=True)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--egolanes-ckpt", default="")
    ap.add_argument("--autosteer-ckpt", default="")
    a = ap.parse_args(argv)

    import cv2
    from autoware_vision_pilot_tpu.inference import (
        EgoLanesInfer, AutoSteerInfer)
    from autoware_vision_pilot_tpu.utils.benchmark import (
        tensor_stats, compare_tensors)

    lanes = EgoLanesInfer(checkpoint=a.egolanes_ckpt)
    steer = AutoSteerInfer(checkpoint=a.autosteer_ckpt)

    cap = cv2.VideoCapture(a.video)
    # AutoSteer consumes the RAW pre-threshold EgoLanes logits
    # (main.cpp:516-524 / test_autosteer.cpp compares raw tensors) —
    # feeding thresholded masks gives wrong steering angles.
    prev_raw = None
    for i in range(a.frames):
        ok, frame = cap.read()
        if not ok:
            break
        raw = lanes.inference_raw(frame)
        tensor_stats(f"frame {i} egolanes raw logits", raw)
        if prev_raw is not None:
            compare_tensors(prev_raw, raw,
                            f"egolanes t-1 vs t (frame {i})")
            angle = steer.inference(prev_raw, raw)
            print(f"  -> steering {angle:+.1f} deg")
        prev_raw = raw
    cap.release()
    return 0


if __name__ == "__main__":
    sys.exit(main())
