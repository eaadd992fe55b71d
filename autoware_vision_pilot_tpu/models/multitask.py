"""Fused multi-task perception stack.

The reference runs SceneSeg, Scene3D and DomainSeg as separate engines,
yet by construction they share the same frozen upstream: Scene3D uses the
SceneSeg backbone (pre_trained_backbone.py:6-16) and DomainSeg uses the
SceneSeg backbone+context+neck (domain_seg_upstream.py). Running them as
independent programs recomputes that shared work every frame.

SharedPerceptionStack computes the shared trunk ONCE per frame and fans
out into the three heads — identical outputs to the three separate
networks when loaded from the same checkpoints (DomainSeg's upstream
weights must equal SceneSeg's, which is how the reference trains them),
at roughly the cost of SceneSeg + two decoders.

Parameter tree layout matches the individual networks so their
checkpoints import directly:
  Backbone/SceneContext/SceneNeck/SceneSegHead   (SceneSeg names)
  DepthContext/DepthNeck/SuperDepthHead          (Scene3D names)
  DomainSegHead                                  (DomainSeg name)
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import flax.linen as fnn

from .efficientnet import EfficientNetB0Features
from .components import ContextBlock, UNeck, SegHead, DepthHead


class SharedPerceptionStack(fnn.Module):
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None
    ctx_hw: Tuple[int, int] = (10, 20)
    with_domain: bool = True

    @fnn.compact
    def __call__(self, image, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        feats = EfficientNetB0Features(name="Backbone", **kw)(
            image, train=train)
        # SceneSeg branch (context+neck shared with DomainSeg)
        s_ctx = ContextBlock(1280, *self.ctx_hw, name="SceneContext",
                             **kw)(feats[4], train=train)
        s_neck = UNeck(1280, name="SceneNeck", **kw)(s_ctx, feats)
        seg = SegHead(3, name="SceneSegHead", **kw)(s_neck, feats)

        # Scene3D branch (own context/neck on the shared backbone)
        d_ctx = ContextBlock(1280, *self.ctx_hw, name="DepthContext",
                             **kw)(feats[4], train=train)
        d_neck = UNeck(1280, name="DepthNeck", **kw)(d_ctx, feats)
        depth = DepthHead(name="SuperDepthHead", **kw)(d_neck, feats)

        domain = None
        if self.with_domain:
            domain = SegHead(1, name="DomainSegHead", **kw)(s_neck, feats)
        return seg, depth, domain


def import_from_individual_checkpoints(stack_vars, scene_seg_vars,
                                       scene_3d_vars=None,
                                       domain_seg_vars=None):
    """Map the separate networks' variable trees onto the fused stack.

    scene_seg_vars: SceneSegNetwork variables (Backbone/SceneContext/
    SceneNeck/SceneSegHead copied 1:1).
    scene_3d_vars: Scene3DNetwork variables (DepthContext/DepthNeck/
    SuperDepthHead; its PreTrainedBackbone must equal SceneSeg's Backbone).
    domain_seg_vars: DomainSegNetwork variables (DomainSegHead).
    """
    import jax

    def merge(dst, src, names, src_prefix=None):
        for col in ("params", "batch_stats"):
            if col not in dst or col not in src:
                continue
            s = src[col]
            if src_prefix is not None:
                s = s.get(src_prefix, {})
            for n in names:
                if n in s:
                    dst[col][n] = s[n]
        return dst

    out = jax.tree.map(lambda x: x, stack_vars)  # copy
    out = {k: dict(v) for k, v in out.items()}
    merge(out, scene_seg_vars,
          ["Backbone", "SceneContext", "SceneNeck", "SceneSegHead"])
    if scene_3d_vars is not None:
        merge(out, scene_3d_vars,
              ["DepthContext", "DepthNeck", "SuperDepthHead"])
    if domain_seg_vars is not None:
        merge(out, domain_seg_vars, ["DomainSegHead"])
    return out
