"""EgoLanes — 3-channel ego-lane masks at quarter resolution (80x160 for a
320x640 input). Rebuild of Models/model_components/ego_lanes_network.py:
EfficientNet-B0 -> pyramid max-pool fusion (1456 ch) -> context attention ->
U-neck -> quarter-res head."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as fnn

from .efficientnet import EfficientNetB0Features
from .components import (
    ContextBlock,
    UNeck,
    BackboneFeatureFusion,
    EgoLanesHead,
)


class EgoLanesNetwork(fnn.Module):
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None
    ctx_hw: tuple = (10, 20)
    # B0_DRYRUN_STAGES for compile-cheap test/dryrun configs (same taps
    # and strides, so the fusion/neck/head and the 80x160 mask contract
    # are exercised unchanged — only backbone depth shrinks)
    backbone_stages: Any = None

    @fnn.compact
    def __call__(self, image, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        if self.backbone_stages is not None:
            kw_bb = dict(kw, stages=self.backbone_stages)
        else:
            kw_bb = kw
        features = EfficientNetB0Features(name="BEVBackbone", **kw_bb)(
            image, train=train)
        fused = BackboneFeatureFusion(name="BackboneFeatureFusion")(features)
        context = ContextBlock(1456, *self.ctx_hw, name="AutoSteerContext",
                               **kw)(fused, train=train)
        neck = UNeck(1456, name="EgopathNeck", **kw)(context, features)
        return EgoLanesHead(name="EgoLanesHead", **kw)(neck)
