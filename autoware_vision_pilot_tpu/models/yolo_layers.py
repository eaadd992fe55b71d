"""YOLOv11-style building blocks (NHWC flax), rebuilt from the reference's
Models/model_components/common_layers.py:5-245 semantics: ConvBN, CSP/C3K2
bottleneck stacks, SPPF pooling pyramid, PSA/C2PSA local attention, the
custom CTX global-context block, and DFL box regression.

Attribute names mirror the torch modules so AutoSpeed/AutoSteer/AutoDrive
checkpoints import through convert.torch_import unchanged.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ..nn.layers import Conv2d, max_pool2d, silu

BN_EPS = 0.001
BN_MOMENTUM_FLAX = 0.97  # torch momentum 0.03


class YoloConv(fnn.Module):
    """Conv + BatchNorm + activation (reference `Conv`)."""
    features: int
    k: Any = 1
    s: Any = 1
    p: Any = 0
    g: int = 1
    act: str = "silu"  # "silu" | "identity"
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        y = Conv2d(self.features, self.k, self.s, self.p, groups=self.g,
                   use_bias=False, name="conv", dtype=self.dtype,
                   param_dtype=self.param_dtype, precision=self.precision)(x)
        y = fnn.BatchNorm(use_running_average=not train, epsilon=BN_EPS,
                          momentum=BN_MOMENTUM_FLAX, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="norm")(y)
        return silu(y) if self.act == "silu" else y


class Residual(fnn.Module):
    ch: int
    e: float = 0.5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        h = YoloConv(int(self.ch * self.e), k=3, p=1, name="conv1", **kw)(x, train)
        h = YoloConv(self.ch, k=3, p=1, name="conv2", **kw)(h, train)
        return x + h


class C3K(fnn.Module):
    """CSP bottleneck with 2 residual blocks (reference C3K / CSPModule)."""
    out_ch: int
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        half = self.out_ch // 2
        y = YoloConv(half, name="conv1", **kw)(x, train)
        y = Residual(half, e=1.0, name="res_m_0", **kw)(y, train)
        y = Residual(half, e=1.0, name="res_m_1", **kw)(y, train)
        z = YoloConv(half, name="conv2", **kw)(x, train)
        cat = jnp.concatenate([y, z], axis=-1)
        return YoloConv(self.out_ch, name="conv3", **kw)(cat, train)


class C3K2(fnn.Module):
    """CSP stage: split, n bottlenecks on the running half, concat all."""
    out_ch: int
    n: int = 1
    csp: bool = False
    r: int = 2
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        c = self.out_ch // self.r
        y = YoloConv(2 * c, name="conv1", **kw)(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.csp:
                ys.append(C3K(c, name=f"res_m_{i}", **kw)(ys[-1], train))
            else:
                ys.append(Residual(c, name=f"res_m_{i}", **kw)(ys[-1], train))
        cat = jnp.concatenate(ys, axis=-1)
        return YoloConv(self.out_ch, name="conv2", **kw)(cat, train)


# reference CSP/CSPModule are the same graph as C3K2/C3K under other names
CSP = C3K2
CSPModule = C3K


class SPPF(fnn.Module):
    """Spatial pyramid pooling (fast): 3 cascaded 5x5 maxpools + concat."""
    out_ch: int
    k: int = 5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        c_ = x.shape[-1] // 2
        x = YoloConv(c_, k=1, name="cv1", **kw)(x, train)
        y1 = max_pool2d(x, self.k, 1, self.k // 2)
        y2 = max_pool2d(y1, self.k, 1, self.k // 2)
        y3 = max_pool2d(y2, self.k, 1, self.k // 2)
        cat = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return YoloConv(self.out_ch, k=1, name="cv2", **kw)(cat, train)


class Attention(fnn.Module):
    """Tiny local self-attention over the spatial map (reference Attention).

    Channel bookkeeping follows torch's channel-major view() exactly so
    conv1/conv2 weights import 1:1.
    """
    ch: int
    num_head: int
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        nh = self.num_head
        dh = self.ch // nh
        dk = dh // 2
        scale = dk ** -0.5

        b, h, w, c = x.shape
        qkv = YoloConv(self.ch + dk * nh * 2, act="identity",
                       name="qkv", **kw)(x, train)
        # NHWC -> (B, nh, dk*2+dh, HW) channel-major like torch .view
        qkv = qkv.transpose(0, 3, 1, 2).reshape(b, nh, dk * 2 + dh, h * w)
        q, k, v = qkv[:, :, :dk], qkv[:, :, dk:2 * dk], qkv[:, :, 2 * dk:]

        attn = jnp.einsum("bnkq,bnkp->bnqp", q, k,
                          precision=self.precision) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bndq,bnpq->bndp", v, attn, precision=self.precision)
        o = o.reshape(b, c, h, w).transpose(0, 2, 3, 1)  # back to NHWC

        v_map = v.reshape(b, c, h, w).transpose(0, 2, 3, 1)
        o = o + YoloConv(self.ch, act="identity", k=3, p=1, g=self.ch,
                         name="conv1", **kw)(v_map, train)
        return YoloConv(self.ch, act="identity", name="conv2", **kw)(o, train)


class PSABlock(fnn.Module):
    ch: int
    num_head: int
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        x = x + Attention(self.ch, self.num_head, name="conv1", **kw)(x, train)
        h = YoloConv(self.ch * 2, name="conv2_0", **kw)(x, train)
        h = YoloConv(self.ch, act="identity", name="conv2_1", **kw)(h, train)
        return x + h


class PSA(fnn.Module):
    ch: int
    n: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        half = self.ch // 2
        y = YoloConv(2 * half, name="conv1", **kw)(x, train)
        a, b = y[..., :half], y[..., half:]
        for i in range(self.n):
            b = PSABlock(half, self.ch // 128, name=f"res_m_{i}", **kw)(b, train)
        return YoloConv(self.ch, name="conv2", **kw)(
            jnp.concatenate([a, b], axis=-1), train)


class C2PSA(fnn.Module):
    out_ch: int
    e: float = 0.5
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        c_ = int(x.shape[-1] * self.e)
        y = YoloConv(2 * c_, k=1, s=1, name="cv1", **kw)(x, train)
        a, b = y[..., :c_], y[..., c_:]
        b = PSABlock(c_, c_ // 64, name="middle_block", **kw)(b, train)
        return YoloConv(self.out_ch, k=1, s=1, name="cv2", **kw)(
            jnp.concatenate([a, b], axis=-1), train)


class _Conv1dCenter(fnn.Module):
    """torch Conv1d(in, out, 3, 1, 1) applied to a length-1 sequence: only
    the center kernel tap sees data (both neighbors are zero padding), so
    this is a matmul with kernel[1]. Full (3,I,O) kernel kept for import."""
    features: int
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, y):
        w = self.param("w1", fnn.initializers.variance_scaling(
            1 / 3, "fan_in", "uniform"), (3, y.shape[-1], self.features),
            self.param_dtype)
        b = self.param("b", fnn.initializers.zeros, (self.features,),
                       self.param_dtype)
        dt = self.dtype or y.dtype
        return jnp.dot(y.astype(dt), w[1].astype(dt),
                       precision=self.precision) + b.astype(dt)


class CTX(fnn.Module):
    """Reference's custom global-context block replacing C3K2
    (common_layers.py:183; model_library/AutoSpeed/README.md:3).

    mean-pool -> Conv1d(in_ch -> h*w, k3 on a length-1 sequence; only the
    center tap touches data) -> reshape to (h,w) map -> 2 convs -> gated
    attention -> out conv.
    """
    in_ch: int
    out_ch: int
    r: int = 2
    h: int = 16
    w: int = 32
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  precision=self.precision)
        b = x.shape[0]
        hh, ww = x.shape[1], x.shape[2]

        y = jnp.mean(x, axis=(1, 2))  # (B, C)

        c0 = _Conv1dCenter(self.h * self.w, name="exp0",
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           precision=self.precision)(y)
        c0 = silu(c0)
        c1 = c0.reshape(b, self.h, self.w, 1)
        c1 = silu(c1)

        c2 = Conv2d(self.in_ch // self.r, 3, 1, 1, name="ctx0", **kw)(c1)
        c2 = silu(c2)
        c3 = Conv2d(self.in_ch, 3, 1, 1, name="ctx1", **kw)(c2)
        c4 = silu(c3)

        # the attention map is (h, w); matches x spatially by construction
        assert (hh, ww) == (self.h, self.w), (
            f"CTX configured for {(self.h, self.w)}, got {(hh, ww)}")
        c4 = c4 * x + x
        ctx = silu(c4)
        return Conv2d(self.out_ch, 3, 1, 1, name="ctx2", **kw)(ctx)


def dfl_decode(box_logits, ch: int = 16, precision=None):
    """Distribution Focal Loss decode (reference DFL, common_layers.py:139):
    (B, A, 4*ch) logits -> (B, A, 4) expected offsets via softmax-weighted
    arange. The torch version is a frozen arange conv; identical math."""
    b, a, _ = box_logits.shape
    x = box_logits.reshape(b, a, 4, ch)
    p = jax.nn.softmax(x, axis=-1)
    bins = jnp.arange(ch, dtype=p.dtype)
    return jnp.einsum("bafc,c->baf", p, bins, precision=precision)
