"""Export: msgpack/orbax roundtrips, int8 PTQ error bounds, StableHLO
serialize/deserialize round-trip."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as fnn

from autoware_vision_pilot_tpu.export import (
    save_msgpack, load_msgpack, save_checkpoint, load_checkpoint)
from autoware_vision_pilot_tpu.export.quantize import (
    quantize_weights_int8, dequantize_weights, weight_quant_error,
    QuantizedInference)
from autoware_vision_pilot_tpu.export.stablehlo_export import (
    export_stablehlo, load_stablehlo)


class Tiny(fnn.Module):
    @fnn.compact
    def __call__(self, x, train=False):
        h = fnn.Conv(8, (3, 3), padding=1)(x)
        return fnn.Conv(2, (1, 1))(fnn.relu(h))


def test_msgpack_roundtrip(tmp_path):
    m = Tiny()
    v = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    p = tmp_path / "w.msgpack"
    save_msgpack(p, v)
    v2 = load_msgpack(p, jax.tree.map(jnp.zeros_like, v))
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.int32(7)}
    save_checkpoint(tmp_path / "ckpt", state, step=7)
    restored = load_checkpoint(tmp_path / "ckpt",
                               jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7


def test_int8_quant_error_bounded():
    m = Tiny()
    v = m.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
    err = weight_quant_error(v["params"])
    assert err < 1.5 / 127  # half-ulp of symmetric int8


def test_quantized_inference_close():
    m = Tiny()
    v = m.init(jax.random.key(2), jnp.zeros((1, 8, 8, 3)))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 8, 8, 3)).astype(np.float32))
    ref = np.asarray(m.apply(v, x))
    q = QuantizedInference(m, v, (1, 8, 8, 3), compute_dtype=jnp.float32)
    out = np.asarray(q(x))
    assert np.abs(ref - out).max() < 0.05 * max(np.abs(ref).max(), 1)


def test_stablehlo_roundtrip(tmp_path):
    m = Tiny()
    v = m.init(jax.random.key(3), jnp.zeros((1, 8, 8, 3)))

    def fwd(x):
        return m.apply(v, x)

    p = export_stablehlo(fwd, (jnp.zeros((1, 8, 8, 3)),),
                         tmp_path / "tiny.stablehlo")
    assert p.exists() and p.stat().st_size > 0
    call = load_stablehlo(p)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 8, 8, 3)).astype(np.float32))
    out = call(x)
    out = out[0] if isinstance(out, (tuple, list)) else out
    out = np.asarray(out).reshape(1, 8, 8, 2)
    np.testing.assert_allclose(out, np.asarray(fwd(x)), atol=1e-6)


def test_int8_conv_path_close_to_float():
    """Native int8 MXU conv path: quantized variables produce outputs close
    to the float model (dynamic per-tensor activation + per-channel weight
    quantization)."""
    from autoware_vision_pilot_tpu.nn.layers import Conv2d
    from autoware_vision_pilot_tpu.export.quantize import (
        quantize_variables_for_int8_conv)
    import flax.linen as fnn2

    class Net(fnn2.Module):
        @fnn2.compact
        def __call__(self, x, train=False):
            h = Conv2d(64, 3, 1, 1, name="c1")(x)
            h = fnn2.relu(h)
            return Conv2d(32, 3, 1, 1, name="c2")(h)

    m = Net()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 16, 32, 48)).astype(np.float32))
    v = m.init(jax.random.key(0), x)
    ref = np.asarray(m.apply(v, x))
    qv = quantize_variables_for_int8_conv(v)
    # kernels actually became int8
    assert qv["params"]["c1"]["w"].dtype == jnp.int8
    assert "w_scale" in qv["params"]["c1"]
    out = np.asarray(m.apply(qv, x))
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.05, rel


@pytest.mark.heavy
def test_int8_conv_skips_small_and_transposed():
    from autoware_vision_pilot_tpu.nn.layers import Conv2d, ConvTranspose2d
    from autoware_vision_pilot_tpu.export.quantize import (
        quantize_variables_for_int8_conv)
    import flax.linen as fnn2

    class Net(fnn2.Module):
        @fnn2.compact
        def __call__(self, x):
            h = Conv2d(8, 3, 1, 1, name="small")(x)   # cin=3 < 32: stays f32
            return ConvTranspose2d(4, 2, 2, name="up")(h)

    m = Net()
    v = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    qv = quantize_variables_for_int8_conv(v)
    assert qv["params"]["small"]["w"].dtype != jnp.int8
    assert qv["params"]["up"]["wt"].dtype != jnp.int8


def test_int8_static_calibration():
    from autoware_vision_pilot_tpu.nn.layers import Conv2d
    from autoware_vision_pilot_tpu.export.quantize import (
        quantize_variables_for_int8_conv, calibrate_int8_activation_scales)
    import flax.linen as fnn2

    class Net(fnn2.Module):
        @fnn2.compact
        def __call__(self, x, train=False):
            h = Conv2d(64, 3, 1, 1, name="c1")(x)
            h = fnn2.relu(h)
            return Conv2d(32, 3, 1, 1, name="c2")(h)

    m = Net()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 48)).astype(np.float32))
    v = m.init(jax.random.key(0), x)
    ref = np.asarray(m.apply(v, x))
    qv = quantize_variables_for_int8_conv(v)
    sv = calibrate_int8_activation_scales(m, qv, [x])
    assert "x_scale" in sv["params"]["c1"]
    out = np.asarray(m.apply(sv, x))
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.06, rel
    # out-of-calibration input still works (clipping handles overflow)
    out2 = m.apply(sv, x * 2)
    assert np.isfinite(np.asarray(out2)).all()


def test_int8_conv_transpose_path():
    """ConvTranspose int8 MXU path (quantize_transpose=True): decoder
    up-blocks run int8 with per-output-channel scales; accuracy within
    PTQ bounds."""
    import flax.linen as fnn
    from autoware_vision_pilot_tpu.nn.layers import ConvTranspose2d, Conv2d
    from autoware_vision_pilot_tpu.export.quantize import (
        quantize_variables_for_int8_conv)

    class Up(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            h = Conv2d(64, 3, padding=1, name="c")(x)
            return ConvTranspose2d(32, 2, 2, name="up")(h)

    m = Up()
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.5, (1, 8, 16, 48)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    ref = m.apply(v, x)

    v8 = quantize_variables_for_int8_conv(v, min_channels=32,
                                          quantize_transpose=True)
    assert v8["params"]["c"]["w"].dtype == jnp.int8
    assert v8["params"]["up"]["wt"].dtype == jnp.int8
    assert v8["params"]["up"]["wt_scale"].shape == (32,)
    out = m.apply(v8, x)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel


def test_int8_per_channel_act_scales_fold_exactly():
    """Per-input-channel activation scales: the export folds s_c into
    the quantized weights (quantize_variables_for_int8_conv act_scales),
    the deployed Conv2d consumes the vector x_scale, and on activations
    with wildly disparate channel amplitudes the per-channel config
    beats per-tensor int8 accuracy."""
    from autoware_vision_pilot_tpu.nn.layers import Conv2d
    from autoware_vision_pilot_tpu.export.quantize import (
        quantize_variables_for_int8_conv)
    import flax.linen as fnn2

    class Net(fnn2.Module):
        @fnn2.compact
        def __call__(self, x, train=False):
            return Conv2d(32, 3, 1, 1, name="c1")(x)

    m = Net()
    rng = np.random.default_rng(1)
    # channel amplitudes spanning 3 orders of magnitude: per-tensor int8
    # crushes the quiet channels to zero
    amp = np.logspace(-2, 1, 48).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 48)).astype(np.float32)
                    * amp)
    v = m.init(jax.random.key(0), x)
    ref = np.asarray(m.apply(v, x))

    per_tensor = quantize_variables_for_int8_conv(
        v, act_scales={("c1",): float(np.abs(np.asarray(x)).max() / 127)})
    vec = np.abs(np.asarray(x)).max(axis=(0, 1, 2)) / 127.0
    per_chan = quantize_variables_for_int8_conv(
        v, act_scales={("c1",): vec.astype(np.float32)})

    assert per_chan["params"]["c1"]["x_scale"].ndim == 1
    out_pt = np.asarray(m.apply(per_tensor, x))
    out_pc = np.asarray(m.apply(per_chan, x))
    err_pt = np.abs(out_pt - ref).max()
    err_pc = np.abs(out_pc - ref).max()
    assert err_pc < err_pt, (err_pc, err_pt)
    rel = err_pc / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.05, rel


def test_qat_per_channel_observers_roundtrip():
    """Per-channel QAT observers sow (C,) amax vectors; collect ->
    int8_variables_from_qat produces a deployable tree whose forward
    tracks the QAT fake-quant forward."""
    from autoware_vision_pilot_tpu.nn.layers import Conv2d
    from autoware_vision_pilot_tpu.train.qat import (
        qat_apply, collect_act_scales, int8_variables_from_qat)
    import flax.linen as fnn2

    class Net(fnn2.Module):
        @fnn2.compact
        def __call__(self, x, train=False):
            h = Conv2d(64, 3, 1, 1, name="c1")(x)
            h = fnn2.relu(h)
            return Conv2d(32, 3, 1, 1, name="c2")(h)

    m = Net()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 48)).astype(np.float32))
    v = m.init(jax.random.key(0), x)
    _, mut = qat_apply(m, v, x, mutable=["intermediates"],
                       min_channels=32, per_channel_act=True)
    scales = collect_act_scales(mut["intermediates"])
    assert all(np.asarray(s).ndim == 1 for s in scales.values())
    int8_v = int8_variables_from_qat(v, scales, min_channels=32)
    assert int8_v["params"]["c1"]["w"].dtype == jnp.int8
    assert int8_v["params"]["c1"]["x_scale"].ndim == 1
    ref = np.asarray(m.apply(v, x))
    out = np.asarray(m.apply(int8_v, x))
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.06, rel
