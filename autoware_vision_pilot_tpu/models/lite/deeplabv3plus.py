"""DeepLabV3+ Lite — the small/fast model family.

Capability match for Models/model_components/lite_models/DeepLabv3Plus.py
(which wraps segmentation_models_pytorch): EfficientNet-B0/B1 encoder with
configurable output stride (8/16 via dilated stages), separable-conv ASPP
(rates 12/24/36 + image pooling), the V3+ low-level-skip decoder, and a
configurable regression/segmentation head (depth, upsampling, activation).
These are the "Lite" models the reference deploys at INT8 on edge
(model_library/Lite/README.md: SceneSegLite 7.82 GOP vs SceneSeg 224 GOP).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ...nn.layers import Conv2d
from ..efficientnet import EfficientNetEncoder, B0_STAGES, B1_STAGES

ENCODERS = {
    "efficientnet_b0": B0_STAGES,
    "efficientnet_b1": B1_STAGES,
}


class ConvBNReLU(fnn.Module):
    features: int
    kernel: int = 3
    dilation: int = 1
    separable: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        pad = (self.kernel - 1) // 2 * self.dilation
        if self.separable and self.kernel > 1:
            x = Conv2d(x.shape[-1], self.kernel, 1, pad, groups=x.shape[-1],
                       dilation=self.dilation, use_bias=False,
                       name="dw", **kw)(x)
            x = Conv2d(self.features, 1, 1, 0, use_bias=False,
                       name="pw", **kw)(x)
        else:
            x = Conv2d(self.features, self.kernel, 1, pad,
                       dilation=self.dilation, use_bias=False,
                       name="conv", **kw)(x)
        x = fnn.BatchNorm(use_running_average=not train, name="bn",
                          dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return fnn.relu(x)


class ASPP(fnn.Module):
    out_ch: int = 256
    rates: Sequence[int] = (12, 24, 36)
    separable: bool = True
    dropout: float = 0.5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        branches = [ConvBNReLU(self.out_ch, 1, name="b0", **kw)(x, train)]
        for i, r in enumerate(self.rates):
            branches.append(ConvBNReLU(
                self.out_ch, 3, dilation=r, separable=self.separable,
                name=f"b{i + 1}", **kw)(x, train))
        # image pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBNReLU(self.out_ch, 1, name="pool", **kw)(g, train)
        g = jnp.broadcast_to(g, (*x.shape[:-1], self.out_ch))
        branches.append(g)
        h = jnp.concatenate(branches, axis=-1)
        h = ConvBNReLU(self.out_ch, 1, name="proj", **kw)(h, train)
        h = fnn.Dropout(self.dropout, deterministic=not train)(h)
        return h


def _resize_to(x, ref):
    return jax.image.resize(
        x, (*x.shape[:-3], ref.shape[-3], ref.shape[-2], x.shape[-1]),
        method="bilinear")


class DeepLabV3Plus(fnn.Module):
    encoder_name: str = "efficientnet_b0"
    output_stride: int = 16
    decoder_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    aspp_separable: bool = True
    aspp_dropout: float = 0.5
    output_channels: int = 3
    head_upsampling: int = 4
    head_activation: Optional[str] = None  # None | 'sigmoid' | 'tanh'
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        feats = EfficientNetEncoder(
            ENCODERS[self.encoder_name], output_stride=self.output_stride,
            name="encoder", **kw)(x, train=train)
        low = feats[1]        # stride 4
        high = feats[-1]      # stride = output_stride

        h = ASPP(self.decoder_channels, self.atrous_rates,
                 self.aspp_separable, self.aspp_dropout,
                 name="aspp", **kw)(high, train)
        h = _resize_to(h, low)
        lowp = ConvBNReLU(48, 1, name="low_proj", **kw)(low, train)
        h = jnp.concatenate([h, lowp], axis=-1)
        h = ConvBNReLU(self.decoder_channels, 3, separable=True,
                       name="fuse", **kw)(h, train)

        out = Conv2d(self.output_channels, 3, 1, 1, name="head", **kw)(h)
        if self.head_upsampling and self.head_upsampling > 1:
            out = jax.image.resize(
                out, (*out.shape[:-3],
                      out.shape[-3] * self.head_upsampling,
                      out.shape[-2] * self.head_upsampling,
                      out.shape[-1]), method="bilinear")
        if self.head_activation == "sigmoid":
            out = jax.nn.sigmoid(out)
        elif self.head_activation == "tanh":
            out = jnp.tanh(out)
        return out
