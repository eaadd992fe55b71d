"""INT8 post-training quantization ("Quanty" equivalent).

The reference quantizes with PT2E + XNNPACKQuantizer (QAT and PTQ,
Models/exports/README.md:19-55, quantization/PTQ/). The TPU-native
equivalent: symmetric per-channel int8 weights with per-tensor activation
scales calibrated from data, executed as int8 MXU matmuls via
quantize->dequantize around each conv (XLA fuses the dq into the conv,
and int8 doubles MXU throughput on v5e).

Round-1 scope: weight quantization (per-output-channel scales for conv
kernels, per-tensor otherwise), a calibration pass recording activation
ranges, and a quantized-inference wrapper that de/quantizes around the
jitted forward. QAT hooks come later.
"""
from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp


def quantize_weights_int8(params, per_channel_rank: int = 4):
    """Quantize float param leaves to int8 with symmetric scales.

    Conv kernels (rank 4, HWIO) get per-output-channel scales; other
    tensors per-tensor. Returns (q_params pytree of int8, scales pytree).
    """
    def q(leaf):
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf, None
        if leaf.ndim == per_channel_rank:
            amax = jnp.max(jnp.abs(leaf), axis=(0, 1, 2), keepdims=True)
        else:
            amax = jnp.max(jnp.abs(leaf))
        scale = jnp.maximum(amax, 1e-8) / 127.0
        qv = jnp.clip(jnp.round(leaf / scale), -127, 127).astype(jnp.int8)
        return qv, scale

    flat, tree = jax.tree.flatten(params)
    qs = [q(l) for l in flat]
    q_params = jax.tree.unflatten(tree, [a for a, _ in qs])
    scales = jax.tree.unflatten(tree, [b if b is not None else 0.0
                                       for _, b in qs])
    return q_params, scales


def dequantize_weights(q_params, scales):
    def dq(leaf, s):
        if leaf.dtype == jnp.int8:
            return (leaf.astype(jnp.float32) * s).astype(jnp.float32)
        return leaf
    return jax.tree.map(dq, q_params, scales)


def weight_quant_error(params, dtype=jnp.float32) -> float:
    """Max relative weight error introduced by int8 round-trip (sanity)."""
    q, s = quantize_weights_int8(params)
    dq = dequantize_weights(q, s)
    errs = jax.tree.map(
        lambda a, b: (jnp.max(jnp.abs(a - b)) /
                      jnp.maximum(jnp.max(jnp.abs(a)), 1e-8))
        if jnp.issubdtype(a.dtype, jnp.floating) else 0.0,
        params, dq)
    return float(max(jax.tree.leaves(errs)))


class QuantizedInference:
    """PTQ wrapper: int8 weights stored, dequantized on device inside the
    jitted forward (XLA folds the dequant into the consuming conv; weight
    memory traffic drops 4x vs f32, 2x vs bf16 — the HBM-bound decoder
    layers are exactly where that matters)."""

    def __init__(self, model, variables, input_shape,
                 compute_dtype=jnp.bfloat16):
        params = variables["params"]
        self.q_params, self.scales = quantize_weights_int8(params)
        rest = {k: v for k, v in variables.items() if k != "params"}

        def fwd(q_params, x):
            p = jax.tree.map(
                lambda leaf, s: (leaf.astype(compute_dtype) *
                                 jnp.asarray(s, compute_dtype))
                if leaf.dtype == jnp.int8 else leaf,
                q_params, self.scales)
            return model.apply({"params": p, **rest}, x)

        self._fwd = jax.jit(fwd)
        self.input_shape = input_shape

    def __call__(self, x):
        return self._fwd(self.q_params, x)


def quantize_variables_for_int8_conv(variables, min_channels: int = 32,
                                     quantize_transpose: bool = False,
                                     act_scales: dict | None = None):
    """Transform a variables tree for the native int8 MXU conv path.

    Every Conv2d kernel leaf named 'w' (rank 4, HWIO) with at least
    `min_channels` input channels is replaced by a symmetric
    per-output-channel int8 tensor plus a sibling 'w_scale' leaf that
    nn.layers.Conv2d consumes at apply time (int8 x int8 -> int32 on the
    MXU, 2x bf16 throughput on v5e). Small convs (tiny C_in, e.g. the
    context blocks) stay float — they are dispatch-bound, not MXU-bound.

    act_scales: optional {module-path-tuple: scale} of calibrated
    activation scales. VECTOR scales (per-input-channel) are folded into
    the weights before weight quantization (w' = w * s_c), so the
    deployed conv dequantizes with w_scale alone — see
    nn.layers.Conv2d's vector-x_scale branch. Scalar scales are stored
    as-is.

    ConvTranspose/Linear kernels ('wt'/'wl') are left in float (the
    decoder transposed convs are a minority of FLOPs).
    """
    import jax.numpy as _jnp

    def walk(node, path=()):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + (k,))
            else:
                out[k] = v
        if "w" in out and hasattr(out["w"], "ndim") and out["w"].ndim == 4 \
                and jnp.issubdtype(out["w"].dtype, jnp.floating) \
                and out["w"].shape[2] >= min_channels:
            w = out["w"].astype(_jnp.float32)
            sx = (act_scales or {}).get(path)
            if sx is not None and getattr(_jnp.asarray(sx), "ndim", 0) == 1:
                # fold per-input-channel activation scales into the
                # kernel: conv(round(x/s_c), w * s_c) == conv(x, w)
                w = w * _jnp.asarray(sx, _jnp.float32)[None, None, :, None]
                out["x_scale"] = _jnp.asarray(sx, _jnp.float32)
            elif sx is not None:
                out["x_scale"] = _jnp.asarray(sx, _jnp.float32)
            amax = _jnp.max(_jnp.abs(w), axis=(0, 1, 2))
            scale = _jnp.maximum(amax, 1e-8) / 127.0
            out["w_scale"] = scale
            out["w"] = _jnp.clip(_jnp.round(w / scale), -127,
                                 127).astype(_jnp.int8)
        if quantize_transpose and "wt" in out \
                and hasattr(out["wt"], "ndim") and out["wt"].ndim == 4 \
                and jnp.issubdtype(out["wt"].dtype, jnp.floating) \
                and out["wt"].shape[3] >= min_channels:
            # ConvTranspose2d kernel (kh, kw, O, I): per-O scales at dim 2
            w = out["wt"].astype(_jnp.float32)
            amax = _jnp.max(_jnp.abs(w), axis=(0, 1, 3))
            scale = _jnp.maximum(amax, 1e-8) / 127.0
            out["wt_scale"] = scale
            out["wt"] = _jnp.clip(
                _jnp.round(w / scale[None, None, :, None]), -127,
                127).astype(_jnp.int8)
        return out

    result = {}
    for col, tree in variables.items():
        result[col] = walk(tree) if col == "params" else tree
    return result


def calibrate_int8_activation_scales(model, q_variables, sample_batches,
                                     percentile_headroom: float = 1.0):
    """PTQ activation calibration for the static int8 conv path.

    Runs the (weight-quantized) model over calibration batches collecting
    each int8 conv's dynamic activation amax (sown as
    intermediates/.../act_amax), then writes static per-conv 'x_scale'
    params = running_max(amax)/127. With static scales the quantize step
    fuses into the producing op's epilogue — no extra reduction pass.

    sample_batches: iterable of model inputs (already preprocessed).
    Returns a new variables tree with x_scale leaves inserted.
    """
    import jax as _jax
    import jax.numpy as _jnp

    running = {}

    def record(path, leaf):
        key = tuple(path)
        v = float(_jnp.max(_jnp.asarray(leaf)))
        running[key] = max(running.get(key, 0.0), v)

    for x in sample_batches:
        _, inter = model.apply(q_variables, x, mutable=["intermediates"])

        def walk(node, path):
            for k, v in node.items():
                if k == "act_amax":
                    for leaf in (v if isinstance(v, (tuple, list)) else [v]):
                        record(path, leaf)
                elif isinstance(v, dict):
                    walk(v, path + [k])

        walk(inter["intermediates"], [])

    params = _jax.tree.map(lambda x: x, q_variables["params"])
    params = {k: v for k, v in params.items()}

    def insert(node, path, scale):
        for p in path:
            node = node[p]
        node["x_scale"] = _jnp.asarray(scale, _jnp.float32)

    for path, amax in running.items():
        insert(params, list(path), amax * percentile_headroom / 127.0)

    out = dict(q_variables)
    out["params"] = params
    return out
