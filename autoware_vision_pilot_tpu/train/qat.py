"""Quantization-aware training for the whole model zoo ("Quanty" QAT).

The reference's QAT flow covers every exported model via PT2E +
XNNPACKQuantizer with inserted observers (Models/exports/README.md:19-55,
Models/exports/quantization/). The TPU-native equivalent here is
observer-free JAX:

- **weights**: symmetric per-output-channel int8 fake-quant with a
  straight-through estimator, applied to the same conv kernels the
  deployment transform quantizes
  (export.quantize.quantize_variables_for_int8_conv selection rule);
- **activations**: per-tensor fake-quant at every Conv2d input via
  ``flax.linen.intercept_methods`` (the PT2E observer-insertion analog —
  no model changes needed), with the running amax sown so calibrated
  static scales fall out of training for free;
- **export**: `int8_variables_from_qat` converts QAT-trained weights +
  recorded activation scales straight into the int8 MXU inference format
  consumed by nn.layers.Conv2d.

Works with any flax module built on nn.layers (SceneSeg family, EgoLanes,
AutoSpeed/AutoSteer, Lite models); AutoDrive's bespoke QAT trainer
(train/autodrive_trainer.py) predates this and remains.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import flax.linen as fnn

from ..nn.layers import Conv2d


def fake_quant_ste(w, axis=None):
    """Symmetric int8 fake-quant with straight-through gradients.
    axis=None -> per-tensor scale; axis=tuple -> reduce over those dims
    (per-output-channel for HWIO kernels: axis=(0, 1, 2))."""
    amax = (jnp.max(jnp.abs(w)) if axis is None
            else jnp.max(jnp.abs(w), axis=axis, keepdims=True))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127) * scale
    return w + jax.lax.stop_gradient(q - w)


def fake_quant_params(params, min_channels: int = 32):
    """Fake-quant every conv kernel the deployment transform would
    quantize (rank-4 'w' leaves with >= min_channels input channels),
    per-output-channel — the training-time mirror of
    export.quantize.quantize_variables_for_int8_conv."""
    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v) if isinstance(v, dict) else v
               for k, v in node.items()}
        w = out.get("w")
        if w is not None and hasattr(w, "ndim") and w.ndim == 4 \
                and jnp.issubdtype(w.dtype, jnp.floating) \
                and w.shape[2] >= min_channels:
            out["w"] = fake_quant_ste(w, axis=(0, 1, 2))
        return out

    return walk(params)


def fake_quant_ste_static(x, scale):
    """Symmetric int8 fake-quant with a FIXED scale (frozen observer) and
    straight-through gradients — the exact numerics of the deployed
    static-x_scale int8 conv path (nn.layers.Conv2d). scale may be a
    scalar (per-tensor) or a (C,) vector (per-input-channel) for NHWC
    activations."""
    scale = jnp.asarray(scale, x.dtype)
    if scale.ndim == 1:
        scale = scale.reshape((1,) * (x.ndim - 1) + (-1,))
    q = jnp.clip(jnp.round(x / scale), -127, 127) * scale
    return x + jax.lax.stop_gradient(q - x)


def make_act_quant_interceptor(min_channels: int = 32,
                               static_scales: dict | None = None,
                               per_channel: bool = False):
    """flax intercept_methods hook fake-quanting every Conv2d input and
    sowing the activation amax so static deployment scales can be read
    back.

    static_scales=None -> dynamic per-batch scales (observer phase).
    static_scales={module-path-tuple: scale} -> FROZEN observers (the
    reference PT2E flow's observer-freezing phase,
    exports/README.md:19-55): the fake-quant uses the exact static
    scale the deployed int8 program will use, closing the train/deploy
    numerics gap.

    per_channel=True observes/quantizes activations per input channel
    (amax over N,H,W) — the export folds the vector scale into the
    weights (quantize_variables_for_int8_conv act_scales)."""
    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (isinstance(m, Conv2d) and context.method_name == "__call__"
                and args and hasattr(args[0], "ndim")
                and args[0].ndim == 4
                and args[0].shape[-1] >= min_channels
                and jnp.issubdtype(args[0].dtype, jnp.floating)):
            x = args[0]
            xf = x.astype(jnp.float32)
            if per_channel:
                amax = jnp.maximum(
                    jnp.max(jnp.abs(xf), axis=(0, 1, 2)), 1e-6)
            else:
                amax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6)
            m.sow("intermediates", "qat_act_amax", amax)
            if static_scales is not None:
                s = static_scales.get(tuple(m.path))
                xq = (xf if s is None
                      else fake_quant_ste_static(xf, s)).astype(x.dtype)
            else:
                axis = (0, 1, 2) if per_channel else None
                xq = fake_quant_ste(xf, axis=axis).astype(x.dtype)
            args = (xq,) + args[1:]
        return next_fun(*args, **kwargs)

    return interceptor


def qat_apply(model, variables, *args, min_channels: int = 32,
              quant_acts: bool = True, static_scales: dict | None = None,
              per_channel_act: bool = False, **kwargs):
    """model.apply with QAT numerics: fake-quanted conv kernels, and
    (optionally) fake-quanted conv input activations. Drop-in inside any
    loss function; gradients flow straight-through.

    Returns whatever model.apply returns. Pass
    ``mutable=[..., "intermediates"]`` to also receive the sown
    qat_act_amax observers."""
    v = dict(variables)
    v["params"] = fake_quant_params(v["params"], min_channels)
    if not quant_acts:
        return model.apply(v, *args, **kwargs)
    with fnn.intercept_methods(
            make_act_quant_interceptor(min_channels, static_scales,
                                       per_channel=per_channel_act)):
        return model.apply(v, *args, **kwargs)


def collect_act_scales(intermediates) -> dict:
    """Extract {module-path-tuple: amax/127} from sown qat_act_amax.
    Scalar observers yield float scales; per-channel observers yield
    (C,) numpy vectors (elementwise max over sow entries)."""
    import numpy as _np
    scales = {}

    def walk(node, path):
        for k, v in node.items():
            if k == "qat_act_amax":
                vals = v if isinstance(v, (tuple, list)) else [v]
                arrs = [_np.asarray(x) for x in vals]
                if arrs[0].ndim == 0:
                    amax = max(float(a) for a in arrs)
                    scales[tuple(path)] = amax / 127.0
                else:
                    amax = arrs[0]
                    for a in arrs[1:]:
                        amax = _np.maximum(amax, a)
                    scales[tuple(path)] = amax / 127.0
            elif isinstance(v, dict):
                walk(v, path + [k])

    walk(intermediates, [])
    return scales


def int8_variables_from_qat(variables, act_scales: dict,
                            min_channels: int = 32):
    """Convert QAT-trained float variables + recorded activation scales
    into the deployment int8 format (int8 'w' + 'w_scale' + static
    'x_scale' leaves) consumed natively by nn.layers.Conv2d. Vector
    (per-channel) activation scales are folded into the weights by
    quantize_variables_for_int8_conv."""
    from ..export.quantize import quantize_variables_for_int8_conv

    return quantize_variables_for_int8_conv(variables,
                                            min_channels=min_channels,
                                            act_scales=act_scales)


def distillation_kl(teacher_logits, student_logits, axis: int = -1):
    """Self-distillation term for QAT closure: KL(teacher || student) over
    the class axis, mean over pixels, computed in f32.

    Used with teacher = stop_gradient(float forward of the SAME params):
    the term directly penalizes quantization-induced output deviation,
    i.e. it optimizes the deployed int8-vs-bf16 argmax-agreement metric
    rather than only the task loss (the reference's QAT bar is
    accuracy-parity of the int8 export, Models/exports/README.md:19-55)."""
    t = jax.lax.stop_gradient(teacher_logits.astype(jnp.float32))
    s = student_logits.astype(jnp.float32)
    tp = jax.nn.softmax(t, axis=axis)
    return jnp.mean(jnp.sum(
        tp * (jax.nn.log_softmax(t, axis=axis)
              - jax.nn.log_softmax(s, axis=axis)), axis=axis))


def make_qat_loss(model, base_loss: Callable, min_channels: int = 32,
                  quant_acts: bool = True,
                  static_scales: dict | None = None,
                  freeze_bn: bool = False,
                  per_channel_act: bool = False):
    """Wrap a standard `loss(apply_fn, params, batch) -> scalar`-style
    closure: the returned callable has the signature
    ``loss(params, batch_stats, x, *loss_args, rngs=None)`` and runs the
    forward with QAT numerics.

    The reference's "advanced QAT recipes" are both supported
    (exports/README.md:23 "observer freezing, batch norm freezing"):
    - static_scales (from collect_act_scales of an earlier observer
      phase) trains against FROZEN observers — deployment-exact
      activation quantization;
    - freeze_bn=True runs the forward in eval-mode BN (running stats,
      no updates) — deployment-exact normalization.
    """
    def loss(params, batch_stats, x, *loss_args, rngs=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if freeze_bn:
            out, mut = qat_apply(
                model, variables, x, train=False,
                mutable=["intermediates"], rngs=rngs,
                min_channels=min_channels, quant_acts=quant_acts,
                static_scales=static_scales,
                per_channel_act=per_channel_act)
            mut = dict(mut)
            mut["batch_stats"] = batch_stats
        else:
            out, mut = qat_apply(
                model, variables, x, train=True,
                mutable=["batch_stats", "intermediates"], rngs=rngs,
                min_channels=min_channels, quant_acts=quant_acts,
                static_scales=static_scales,
                per_channel_act=per_channel_act)
        return base_loss(out, *loss_args), mut

    return loss
