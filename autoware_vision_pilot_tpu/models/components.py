"""Shared decoder components of the SceneSeg model family (NHWC flax).

The reference repeats one design across SceneSeg / Scene3D / DomainSeg /
EgoLanes (Models/model_components/{scene_context,scene_neck,scene_seg_head,
depth_context,scene_3d_neck,scene_3d_head,domain_seg_head,auto_steer_context,
ego_path_neck,ego_lanes_head}.py): a global-context attention block, a
3-stage ConvTranspose U-neck with 1x1 skip links, and a 2-stage upsampling
head. Here each is one parameterized module; attribute names mirror the
torch modules so checkpoints import generically.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ..nn.layers import Conv2d, ConvTranspose2d, Linear, gelu, max_pool2d


class ContextBlock(fnn.Module):
    """Global context attention (SceneContext/DepthContext/AutoSteerContext).

    mean-pool -> MLP (in_ch->800->800->200, GELU, sigmoid) -> reshape to a
    (ctx_h, ctx_w) map -> conv stack back to in_ch -> multiplicative
    attention ``context * x + x``.

    The reference hard-codes ``reshape([10, 20])`` (scene_context.py:41-43),
    i.e. batch 1 and a 320x640 input; here the reshape is batched
    (B, ctx_h, ctx_w, 1) which is identical for B=1.
    """
    in_ch: int = 1280
    ctx_h: int = 10
    ctx_w: int = 20
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        drop = fnn.Dropout(0.25, deterministic=not train)

        v = jnp.mean(x, axis=(1, 2))  # (B, C)
        c = Linear(800, name="context_layer_0", **kw)(v)
        c = drop(c)
        c = gelu(c)
        c = Linear(800, name="context_layer_1", **kw)(c)
        c = drop(c)
        c = gelu(c)
        c = Linear(self.ctx_h * self.ctx_w, name="context_layer_2", **kw)(c)
        c = drop(c)
        c = jax.nn.sigmoid(c)

        c = c.reshape(-1, self.ctx_h, self.ctx_w, 1)

        c = Conv2d(128, 3, 1, 1, name="context_layer_3", **kw)(c)
        c = gelu(c)
        c = Conv2d(256, 3, 1, 1, name="context_layer_4", **kw)(c)
        c = gelu(c)
        c = Conv2d(512, 3, 1, 1, name="context_layer_5", **kw)(c)
        c = gelu(c)
        c = Conv2d(self.in_ch, 3, 1, 1, name="context_layer_6", **kw)(c)
        c = gelu(c)

        return c * x + x


class UNeck(fnn.Module):
    """3-stage ConvTranspose decoder neck with encoder skip links
    (SceneNeck/Scene3DNeck/EgoPathNeck). in: (B,h,w,in_ch) + feature pyramid;
    out: (B, 8h, 8w, 256)."""
    in_ch: int = 1280
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, context, features: Sequence[jax.Array]):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)

        d = ConvTranspose2d(self.in_ch, 2, 2, name="upsample_layer_0", **kw)(context)
        d = d + Conv2d(self.in_ch, 1, 1, 0, name="skip_link_layer_0", **kw)(features[3])
        d = gelu(Conv2d(768, 3, 1, 1, name="decode_layer_0", **kw)(d))
        d = gelu(Conv2d(768, 3, 1, 1, name="decode_layer_1", **kw)(d))

        d = ConvTranspose2d(768, 2, 2, name="upsample_layer_1", **kw)(d)
        d = d + Conv2d(768, 1, 1, 0, name="skip_link_layer_1", **kw)(features[2])
        d = gelu(Conv2d(512, 3, 1, 1, name="decode_layer_2", **kw)(d))
        d = gelu(Conv2d(512, 3, 1, 1, name="decode_layer_3", **kw)(d))

        d = ConvTranspose2d(512, 2, 2, name="upsample_layer_2", **kw)(d)
        d = d + Conv2d(512, 1, 1, 0, name="skip_link_layer_2", **kw)(features[1])
        d = gelu(Conv2d(512, 3, 1, 1, name="decode_layer_4", **kw)(d))
        d = gelu(Conv2d(256, 3, 1, 1, name="decode_layer_5", **kw)(d))
        return d


class SegHead(fnn.Module):
    """2-stage upsampling segmentation head (SceneSegHead out_ch=3,
    DomainSegHead out_ch=1)."""
    out_ch: int = 3
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, neck, features: Sequence[jax.Array]):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        d = ConvTranspose2d(256, 2, 2, name="upsample_layer_3", **kw)(neck)
        d = d + Conv2d(256, 1, 1, 0, name="skip_link_layer_3", **kw)(features[0])
        d = gelu(Conv2d(256, 3, 1, 1, name="decode_layer_6", **kw)(d))
        d = gelu(Conv2d(128, 3, 1, 1, name="decode_layer_7", **kw)(d))

        d = ConvTranspose2d(128, 2, 2, name="upsample_layer_4", **kw)(d)
        d = gelu(Conv2d(128, 3, 1, 1, name="decode_layer_8", **kw)(d))
        d = gelu(Conv2d(64, 3, 1, 1, name="decode_layer_9", **kw)(d))
        return Conv2d(self.out_ch, 3, 1, 1, name="decode_layer_10", **kw)(d)


class DepthHead(fnn.Module):
    """Scene3DHead: like SegHead but a triple-conv 128-ch output block
    producing 1-channel relative depth (scene_3d_head.py:21-45)."""
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, neck, features: Sequence[jax.Array]):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        d = ConvTranspose2d(256, 2, 2, name="upsample_layer_3", **kw)(neck)
        d = d + Conv2d(256, 1, 1, 0, name="skip_link_layer_3", **kw)(features[0])
        d = gelu(Conv2d(256, 3, 1, 1, name="decode_layer_6", **kw)(d))
        d = gelu(Conv2d(128, 3, 1, 1, name="decode_layer_7", **kw)(d))

        d = ConvTranspose2d(128, 2, 2, name="upsample_layer_4", **kw)(d)
        d = gelu(Conv2d(128, 3, 1, 1, name="decode_layer_8", **kw)(d))
        d = gelu(Conv2d(128, 3, 1, 1, name="decode_layer_9", **kw)(d))
        return Conv2d(1, 3, 1, 1, name="decode_layer_10", **kw)(d)


class BackboneFeatureFusion(fnn.Module):
    """Parameter-free pyramid fusion: max-pool every level to stride 32 and
    concat channels (backbone_feature_fusion.py) -> 32+24+40+80+1280=1456."""

    @fnn.compact
    def __call__(self, features: Sequence[jax.Array]):
        f0 = features[0]
        for _ in range(4):
            f0 = max_pool2d(f0, 2, 2)
        f1 = features[1]
        for _ in range(3):
            f1 = max_pool2d(f1, 2, 2)
        f2 = features[2]
        for _ in range(2):
            f2 = max_pool2d(f2, 2, 2)
        f3 = max_pool2d(features[3], 2, 2)
        return jnp.concatenate([f0, f1, f2, f3, features[4]], axis=-1)


class EgoLanesHead(fnn.Module):
    """Quarter-res 3-class lane head (ego_lanes_head.py)."""
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, neck):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        d = gelu(Conv2d(256, 3, 1, 1, name="decode_layer_6", **kw)(neck))
        d = gelu(Conv2d(128, 3, 1, 1, name="decode_layer_7", **kw)(d))
        return Conv2d(3, 3, 1, 1, name="decode_layer_8", **kw)(d)
