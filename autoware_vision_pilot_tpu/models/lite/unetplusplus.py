"""UNet++ Lite — nested dense-skip decoder over the EfficientNet encoder.

Capability match for Models/model_components/lite_models/UnetPlusPlus.py:
the standard UNet++ topology X[i][j] = block(cat(X[i][0..j-1], up(X[i+1][j-1])))
with configurable decoder channels and head.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ...nn.layers import Conv2d
from ..efficientnet import EfficientNetEncoder
from .deeplabv3plus import ENCODERS, ConvBNReLU, _resize_to


class UnetPlusPlus(fnn.Module):
    encoder_name: str = "efficientnet_b0"
    decoder_channels: Sequence[int] = (256, 128, 64, 32)
    output_channels: int = 3
    head_upsampling: int = 2
    head_activation: Optional[str] = None
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        feats = EfficientNetEncoder(
            ENCODERS[self.encoder_name], output_stride=32,
            name="encoder", **kw)(x, train=train)
        # pyramid rows: 0 (stride 2) .. 4 (stride 32)
        rows = len(feats)
        grid = {(i, 0): feats[i] for i in range(rows)}

        for j in range(1, rows):
            for i in range(rows - j):
                ch = self.decoder_channels[min(i, len(self.decoder_channels) - 1)]
                up = _resize_to(grid[(i + 1, j - 1)], grid[(i, 0)])
                cat = jnp.concatenate(
                    [grid[(i, k)] for k in range(j)] + [up], axis=-1)
                h = ConvBNReLU(ch, 3, name=f"x_{i}_{j}_a", **kw)(cat, train)
                h = ConvBNReLU(ch, 3, name=f"x_{i}_{j}_b", **kw)(h, train)
                grid[(i, j)] = h

        out = Conv2d(self.output_channels, 3, 1, 1, name="head",
                     **kw)(grid[(0, rows - 1)])
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
