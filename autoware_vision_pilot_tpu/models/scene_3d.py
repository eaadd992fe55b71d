"""Scene3D — monocular relative depth at 320x640. Rebuild of
Models/model_components/scene_3d_network.py: frozen SceneSeg backbone
(pre_trained_backbone.py:6-16) -> DepthContext -> Scene3DNeck -> 1-ch head.

Freezing is a trainer concern here (the optimizer masks the
``PreTrainedBackbone`` subtree) rather than a module concern.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as fnn

from .efficientnet import EfficientNetB0Features
from .components import ContextBlock, UNeck, DepthHead


class _PreTrainedBackbone(fnn.Module):
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, image, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        # frozen in training: stop-gradient + no BN stat updates
        feats = EfficientNetB0Features(name="pretrainedBackBone", **kw)(
            image, train=False)
        return [jax.lax.stop_gradient(f) for f in feats] if train else feats


class Scene3DNetwork(fnn.Module):
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None
    ctx_hw: tuple = (10, 20)

    @fnn.compact
    def __call__(self, image, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        features = _PreTrainedBackbone(name="PreTrainedBackbone", **kw)(
            image, train=train)
        context = ContextBlock(1280, *self.ctx_hw, name="DepthContext",
                               **kw)(features[4], train=train)
        neck = UNeck(1280, name="DepthNeck", **kw)(context, features)
        return DepthHead(name="SuperDepthHead", **kw)(neck, features)
