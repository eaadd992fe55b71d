"""Layer library with exact PyTorch numeric semantics, NHWC layout.

Everything runs in NHWC (the natural TPU layout — lanes along channels feed
the MXU/VPU directly); the reference's NCHW tensors are transposed once at
the framework boundary. Parity rules (validated in tests/test_layers.py):

- Conv2d           : kernel HWIO; torch OIHW -> transpose(2,3,1,0).
- ConvTranspose2d  : ``lax.conv_transpose(transpose_kernel=True)`` with
                     kernel (kh,kw,O,I); torch IOHW -> transpose(2,3,1,0).
- Linear           : kernel (in,out) = torch weight.T.
- BatchNorm2d      : flax BatchNorm; torch momentum m -> flax momentum 1-m.
- GELU             : exact (erf) form — torch nn.GELU default. jax.nn.gelu
                     defaults to the tanh approximation, so approximate=False
                     is load-bearing for <=1e-3 parity.
- max_pool2d       : reduce_window, explicit symmetric padding.

Param leaf names are chosen so the torch->JAX converter
(convert/torch_import.py) can infer the transform from the leaf name alone:
'w' = conv kernel, 'wt' = conv-transpose kernel, 'wl' = linear kernel.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as fnn


def gelu(x):
    """GELU matching torch nn.GELU (exact erf) in float32 — the parity
    contract. In bfloat16 the tanh approximation is used: its error is
    below bf16 resolution (measured bit-identical SceneSeg outputs) and it
    avoids the erf transcendental on the VPU (17% whole-model speedup)."""
    return jax.nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


def silu(x):
    return jax.nn.silu(x)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv2d(fnn.Module):
    """NHWC conv with torch Conv2d semantics (symmetric integer padding)."""
    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    groups: int = 1
    use_bias: bool = True
    dilation: int = 1
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        cin = x.shape[-1]
        w = self.param(
            "w",
            fnn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (kh, kw, cin // self.groups, self.features),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        ph, pw = _pair(self.padding)
        conv_kw = dict(
            window_strides=_pair(self.stride),
            padding=[(ph, ph), (pw, pw)],
            rhs_dilation=_pair(self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )

        if w.dtype == jnp.int8:
            # native int8 MXU path (2x bf16 TOPS on v5e): weights were
            # pre-quantized per-output-channel by
            # export.quantize.quantize_variables_for_int8_conv. Activation
            # scale: static (calibrated 'x_scale' param — quantize fuses
            # into the producer's epilogue) when present, else dynamic
            # per-tensor (costs an extra reduction pass).
            w_scale = self.param("w_scale", fnn.initializers.ones,
                                 (self.features,), jnp.float32)
            xf = x.astype(jnp.float32)
            if self.has_variable("params", "x_scale"):
                # read via get_variable: the scale may be a scalar
                # (per-tensor) or a (cin,) vector (per-input-channel —
                # export folds it into the quantized weights, so the
                # dequant epilogue stays one per-output multiply)
                sx = jnp.asarray(
                    self.get_variable("params", "x_scale"), jnp.float32)
            else:
                amax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6)
                self.sow("intermediates", "act_amax", amax)
                sx = amax / 127.0
            if sx.ndim == 1:
                xq = jnp.clip(jnp.round(xf / sx[None, None, None, :]),
                              -127, 127).astype(jnp.int8)
                dequant = w_scale
            else:
                xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(
                    jnp.int8)
                dequant = sx * w_scale
            y32 = lax.conv_general_dilated(
                xq, w, preferred_element_type=jnp.int32, **conv_kw)
            y = y32.astype(jnp.float32) * dequant
            y = y.astype(dtype)
        else:
            y = lax.conv_general_dilated(
                x.astype(dtype), w.astype(dtype),
                precision=self.precision, **conv_kw)
        if self.use_bias:
            b = self.param("b", fnn.initializers.zeros, (self.features,),
                           self.param_dtype)
            y = y + b.astype(dtype)
        return y


class ConvTranspose2d(fnn.Module):
    """NHWC transposed conv with torch ConvTranspose2d semantics.

    Kernel layout (kh, kw, out, in) used with transpose_kernel=True so a
    torch weight (in, out, kh, kw) imports as transpose(2, 3, 1, 0).
    Only the k==s, padding=0 case (the reference's upsample blocks) needs
    to be exact; general strides follow the same convention.
    """
    features: int
    kernel_size: Any = 2
    stride: Any = 2
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        cin = x.shape[-1]
        w = self.param(
            "wt",
            fnn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (kh, kw, self.features, cin),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        # Non-overlapping case (k == s, the reference's upsample blocks):
        # each input pixel owns a disjoint kh x kw output block, so the
        # transposed conv is EXACTLY one contraction over cin followed by
        # depth-to-space (matches lax.conv_transpose to 1 ulp f32 —
        # summation order differs). One dot_general instead of a strided
        # conv: it runs
        # on the MXU as a plain matmul (the decoder-tail upsamples are the
        # HBM/layout hot spot, docs/SCALING.md) and its gradient is two
        # matmuls — XLA:CPU compiled each conv_transpose grad for ~20 s,
        # which is what blew the multichip dryrun budget in rounds 1-2.
        # Backend-dependent default, AVP_CT_EINSUM=0/1 overrides:
        # - CPU: einsum — XLA:CPU compiles each conv_transpose GRAD for
        #   ~20 s (that compile time blew the multichip-dryrun budget in
        #   rounds 1-2); the einsum grad is two matmuls.
        # - TPU: lax.conv_transpose — measured FASTER at runtime
        #   (tools/bench_ct_ab.py, honest chained-fetch timing: SceneSeg
        #   fwd 7.2 ms vs 8.5-10.2 ms with einsum+d2s; the 6-D d2s
        #   transpose costs more than XLA's native strided conv).
        use_einsum = os.environ.get("AVP_CT_EINSUM")
        if use_einsum is None:
            use_einsum = "1" if jax.default_backend() == "cpu" else "0"
        nonoverlap = (kh, kw) == (sh, sw) and use_einsum != "0"
        ct_kw = dict(
            strides=(sh, sw),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )

        def _d2s(y):
            # (B, h, w, kh, kw, O) -> (B, h*kh, w*kw, O)
            b, h, wd = y.shape[0], y.shape[1], y.shape[2]
            y = y.transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(b, h * kh, wd * kw, self.features)
        if w.dtype == jnp.int8:
            # int8 MXU path, mirroring Conv2d: per-output-channel int8
            # weights ('wt_scale') + static ('x_scale') or dynamic
            # activation scale.
            w_scale = self.param("wt_scale", fnn.initializers.ones,
                                 (self.features,), jnp.float32)
            xf = x.astype(jnp.float32)
            if self.has_variable("params", "x_scale"):
                sx = self.param("x_scale", fnn.initializers.ones,
                                (), jnp.float32)
            else:
                amax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6)
                self.sow("intermediates", "act_amax", amax)
                sx = amax / 127.0
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            if nonoverlap:
                y32 = _d2s(jnp.einsum("bhwc,ijoc->bhwijo", xq, w,
                                      preferred_element_type=jnp.int32))
            else:
                y32 = lax.conv_transpose(
                    xq, w, preferred_element_type=jnp.int32, **ct_kw)
            y = (y32.astype(jnp.float32) * (sx * w_scale)).astype(dtype)
        else:
            if nonoverlap:
                y = _d2s(jnp.einsum("bhwc,ijoc->bhwijo", x.astype(dtype),
                                    w.astype(dtype),
                                    precision=self.precision))
            else:
                y = lax.conv_transpose(
                    x.astype(dtype), w.astype(dtype),
                    precision=self.precision, **ct_kw)
        if self.use_bias:
            b = self.param("b", fnn.initializers.zeros, (self.features,),
                           self.param_dtype)
            y = y + b.astype(dtype)
        return y


class Linear(fnn.Module):
    features: int
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    precision: Any = None

    @fnn.compact
    def __call__(self, x):
        w = self.param(
            "wl",
            fnn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), w.astype(dtype), precision=self.precision)
        if self.use_bias:
            b = self.param("b", fnn.initializers.zeros, (self.features,),
                           self.param_dtype)
            y = y + b.astype(dtype)
        return y


class BatchNorm2d(fnn.Module):
    """BatchNorm over NHWC channels; torch eps/momentum conventions."""
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = False):
        bn = fnn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            axis_name=None,
            name="bn",
        )
        return bn(x)


def max_pool2d(x, kernel: int, stride: int | None = None, padding: int = 0):
    """torch nn.MaxPool2d semantics on NHWC."""
    stride = stride or kernel
    pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg_inf, lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=pad,
    )


def upsample2x_nearest(x):
    """torch nn.Upsample(scale_factor=2) (default mode='nearest'), NHWC."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
