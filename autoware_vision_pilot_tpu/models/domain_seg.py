"""DomainSeg — binary roadwork-zone segmentation. Rebuild of
Models/model_components/domain_seg_network.py: frozen SceneSeg
backbone+context+neck (domain_seg_upstream.py) -> 1-class head."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as fnn

from .efficientnet import EfficientNetB0Features
from .components import ContextBlock, UNeck, SegHead


class _DomainSegUpstream(fnn.Module):
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None
    ctx_hw: tuple = (10, 20)

    @fnn.compact
    def __call__(self, image, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        features = EfficientNetB0Features(name="pretrainedBackBone", **kw)(
            image, train=False)
        context = ContextBlock(1280, *self.ctx_hw, name="pretrainedContext",
                               **kw)(features[4], train=False)
        neck = UNeck(1280, name="pretrainedNeck", **kw)(context, features)
        if train:
            neck = jax.lax.stop_gradient(neck)
            features = [jax.lax.stop_gradient(f) for f in features]
        return neck, features


class DomainSegNetwork(fnn.Module):
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None
    ctx_hw: tuple = (10, 20)

    @fnn.compact
    def __call__(self, image, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        neck, features = _DomainSegUpstream(
            name="DomainSegUpstream", ctx_hw=self.ctx_hw, **kw)(
            image, train=train)
        return SegHead(1, name="DomainSegHead", **kw)(neck, features)
