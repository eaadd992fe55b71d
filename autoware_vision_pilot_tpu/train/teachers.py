"""Pseudo-labeling teachers for the Lite trainer.

The reference's Lite trainer builds a DepthAnythingV2-Large torch model
and uses it to label unlabeled batches with relative depth
(Models/training/lite_trainer_base.py:249-278, encoder table
vits/vitb/vitl/vitg). The TPU trainer exposes the same capability
through the `pseudo_labeler(images_u8) -> labels` hook
(train/lite_trainer.py:86-94); this module provides the concrete
teacher so the hook is wired, not just documented.

The teacher itself stays a torch model (it is the reference's teacher,
and it runs once per unlabeled batch off the training hot path — the
JAX/TPU side only ever sees the resulting label array). Loading goes
through `transformers.AutoModelForDepthEstimation`, which serves the
official Depth-Anything-V2 releases; `model`/`processor` are injectable
so tests (and air-gapped hosts with local checkpoints) never touch the
network.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

# reference encoder-name table -> HF model ids of the same releases
DEPTH_ANYTHING_V2_MODELS = {
    "vits": "depth-anything/Depth-Anything-V2-Small-hf",
    "vitb": "depth-anything/Depth-Anything-V2-Base-hf",
    "vitl": "depth-anything/Depth-Anything-V2-Large-hf",
}


class DepthAnythingTeacher:
    """`pseudo_labeler` producing per-image relative depth in [0, 1].

    __call__(images_u8: (B,H,W,3) uint8 RGB) -> (B,H,W) float32.
    The SSI-mAE loss (train/losses.ssi_mae_depth_loss) is scale-shift
    invariant, so the per-image min-max normalization only fixes the
    label range, not the supervision signal.
    """

    def __init__(self, encoder: str = "vitl",
                 model: Any = None, processor: Any = None,
                 device: str = "cpu",
                 target_hw: Optional[Tuple[int, int]] = None):
        if encoder not in DEPTH_ANYTHING_V2_MODELS:
            raise ValueError(
                f"Invalid pseudo-labeler encoder type '{encoder}'. "
                f"Choose from {sorted(DEPTH_ANYTHING_V2_MODELS)}.")
        self.device = device
        self.target_hw = target_hw
        if model is None or processor is None:
            from transformers import (AutoImageProcessor,
                                      AutoModelForDepthEstimation)
            name = DEPTH_ANYTHING_V2_MODELS[encoder]
            processor = processor or AutoImageProcessor.from_pretrained(name)
            model = model or AutoModelForDepthEstimation.from_pretrained(name)
        import torch  # teacher is torch by design (see module docstring)
        self._torch = torch
        self.model = model.to(device).eval() if hasattr(model, "to") else model
        self.processor = processor

    def __call__(self, images_u8: np.ndarray) -> np.ndarray:
        torch = self._torch
        images = np.asarray(images_u8)
        if images.ndim != 4 or images.shape[-1] != 3:
            raise ValueError(f"expected (B,H,W,3) uint8, got {images.shape}")
        h, w = self.target_hw or images.shape[1:3]
        inputs = self.processor(images=list(images), return_tensors="pt")
        inputs = {k: v.to(self.device) if hasattr(v, "to") else v
                  for k, v in inputs.items()}
        with torch.no_grad():
            out = self.model(**inputs)
        depth = out.predicted_depth  # (B, h', w')
        if depth.ndim == 3:
            depth = depth[:, None]
        depth = torch.nn.functional.interpolate(
            depth, size=(h, w), mode="bilinear", align_corners=False)[:, 0]
        d = depth.float().cpu().numpy()
        lo = d.min(axis=(1, 2), keepdims=True)
        hi = d.max(axis=(1, 2), keepdims=True)
        return ((d - lo) / np.maximum(hi - lo, 1e-8)).astype(np.float32)
