"""SceneSeg — 3-class drivable-scene segmentation (background / foreground /
small objects) at 320x640. TPU-native rebuild of
Models/model_components/scene_seg_network.py (EfficientNet-B0 encoder ->
global-context attention -> ConvTranspose U-neck -> seg head)."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as fnn

from .efficientnet import EfficientNetB0Features, B0_STAGES
from .components import ContextBlock, UNeck, SegHead


class SceneSegNetwork(fnn.Module):
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None
    ctx_hw: tuple = (10, 20)  # stride-32 map of the 320x640 reference input
    backbone_stages: Any = B0_STAGES  # B0_DRYRUN_STAGES for cheap dryrun

    @fnn.compact
    def __call__(self, image, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        features = EfficientNetB0Features(
            name="Backbone", stages=self.backbone_stages, **kw)(
                image, train=train)
        context = ContextBlock(1280, *self.ctx_hw, name="SceneContext",
                               **kw)(features[4], train=train)
        neck = UNeck(1280, name="SceneNeck", **kw)(context, features)
        return SegHead(3, name="SceneSegHead", **kw)(neck, features)
