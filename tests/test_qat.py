"""QAT for the model zoo (Quanty parity: Models/exports/README.md:19-55,
exports/quantization/). Verifies the training-time fake-quant numerics,
the observer collection, the export to the int8 MXU inference format, and
that the legacy trainer learns under QAT."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autoware_vision_pilot_tpu.train.qat import (
    fake_quant_ste, fake_quant_params, qat_apply, collect_act_scales,
    int8_variables_from_qat)


def test_fake_quant_ste_values_and_gradients():
    w = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 4)),
                    jnp.float32)
    q = fake_quant_ste(w)
    # values land on the int8 grid of the per-tensor scale
    scale = float(jnp.max(jnp.abs(w))) / 127.0
    assert np.allclose(np.asarray(q) / scale,
                       np.round(np.asarray(q) / scale), atol=1e-4)
    assert float(jnp.max(jnp.abs(q - w))) <= scale / 2 + 1e-6
    # straight-through: gradient of sum(fq(w)) is all-ones
    g = jax.grad(lambda w: jnp.sum(fake_quant_ste(w)))(w)
    assert np.allclose(np.asarray(g), 1.0)


def test_fake_quant_params_selects_conv_kernels():
    params = {
        "conv": {"w": jnp.ones((3, 3, 64, 64)), "b": jnp.zeros((64,))},
        "small": {"w": jnp.ones((3, 3, 3, 16))},   # cin < min_channels
        "lin": {"wl": jnp.ones((64, 64))},
    }
    out = fake_quant_params(params, min_channels=32)
    assert out["conv"]["w"].shape == (3, 3, 64, 64)
    # ones quantize exactly; grid check is in the STE test — here we only
    # assert selection: small conv and linear kernels pass through object-
    # identically
    assert out["small"]["w"] is params["small"]["w"]
    assert out["lin"]["wl"] is params["lin"]["wl"]


@pytest.fixture(scope="module")
def tiny_model():
    import flax.linen as fnn
    from autoware_vision_pilot_tpu.nn.layers import Conv2d

    class Tiny(fnn.Module):
        @fnn.compact
        def __call__(self, x, train: bool = False):
            h = Conv2d(64, 3, padding=1, name="c1")(x)
            h = jax.nn.relu(h)
            h = Conv2d(64, 3, padding=1, name="c2")(h)
            return Conv2d(3, 1, name="head")(h)

    m = Tiny()
    v = m.init(jax.random.key(0), jnp.zeros((1, 16, 32, 3)))
    return m, v


def test_qat_apply_runs_and_sows_observers(tiny_model):
    m, v = tiny_model
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (2, 16, 32, 3)),
                    jnp.float32)
    out, mut = qat_apply(m, v, x, mutable=["intermediates"])
    assert out.shape == (2, 16, 32, 3)
    scales = collect_act_scales(mut["intermediates"])
    # c2 and head see >=32-channel inputs -> observed; c1 input is 3ch
    names = {p[0] for p in scales}
    assert "c2" in names and "head" in names and "c1" not in names
    assert all(s > 0 for s in scales.values())
    # QAT output stays close to the float forward
    ref = m.apply(v, x)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.15


def test_int8_export_from_qat_matches_qat_numerics(tiny_model):
    m, v = tiny_model
    x = jnp.asarray(np.random.default_rng(2).normal(0, 1, (2, 16, 32, 3)),
                    jnp.float32)
    qat_out, mut = qat_apply(m, v, x, mutable=["intermediates"])
    scales = collect_act_scales(mut["intermediates"])
    v8 = int8_variables_from_qat(v, scales)
    # exported tree has int8 kernels + static x_scale where observed
    assert v8["params"]["c2"]["w"].dtype == jnp.int8
    assert "x_scale" in v8["params"]["c2"]
    assert "x_scale" in v8["params"]["head"]
    int8_out = m.apply(v8, x)
    rel = float(jnp.max(jnp.abs(int8_out - qat_out)) /
                jnp.max(jnp.abs(qat_out)))
    assert rel < 0.1, rel


@pytest.mark.heavy
def test_legacy_trainer_learns_under_qat(tmp_path):
    """QAT=True in the legacy trainer: loss decreases on the synthetic
    dataset — Quanty-QAT available for the SceneSeg model family, not
    only AutoDrive."""
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                           / "tools"))
    from gen_synthetic_dataset import main as gen_main
    gen_main([str(tmp_path / "ds"), "--n", "24", "--hw", "64", "128"])

    import flax.linen as fnn
    from autoware_vision_pilot_tpu.nn.layers import Conv2d, BatchNorm2d
    from autoware_vision_pilot_tpu.train import (
        SceneSegDataset, LegacySegTrainer, LegacyTrainerConfig)

    class SmallSeg(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            h = Conv2d(48, 5, padding=2, name="c1")(x)
            h = jax.nn.relu(BatchNorm2d(name="bn")(h, train=train))
            h = Conv2d(48, 3, padding=1, name="c2")(h)
            h = jax.nn.relu(h)
            return Conv2d(3, 3, padding=1, name="head")(h)

    ds = SceneSegDataset(str(tmp_path / "ds" / "images"),
                         str(tmp_path / "ds" / "labels"), dataset="OTHER")
    cfg = LegacyTrainerConfig(num_epochs=2, lr=5e-3, val_every=0,
                              hw=(64, 128), batch_schedule=(8, 8),
                              ckpt_dir=str(tmp_path / "runs"),
                              log_every=8, qat=True)
    tr = LegacySegTrainer(SmallSeg(), [ds], cfg)
    losses = []
    tr.train(max_samples=48, callbacks=lambda t, l: losses.append(l))
    assert len(losses) >= 2
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_frozen_observers_match_deployed_int8_exactly(tiny_model):
    """With FROZEN observers (static_scales), the QAT forward applies
    byte-identical activation quantization to the deployed int8 conv
    path: same x_scale, same clip/round grid. The residual difference is
    only the weight dequant order (int8 matmul then scale vs fake-quant
    then float matmul) — bounded well below the dynamic-scale gap."""
    m, v = tiny_model
    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (2, 16, 32, 3)),
                    jnp.float32)
    # observer pass -> scales; frozen pass uses them
    _, mut = qat_apply(m, v, x, mutable=["intermediates"])
    scales = collect_act_scales(mut["intermediates"])
    frozen_out, _ = qat_apply(m, v, x, mutable=["intermediates"],
                              static_scales=scales)
    v8 = int8_variables_from_qat(v, scales)
    int8_out = m.apply(v8, x)
    rel = float(jnp.max(jnp.abs(int8_out - frozen_out)) /
                jnp.max(jnp.abs(frozen_out)))
    assert rel < 0.02, rel
    # and the frozen path keys by module path: unknown paths pass through
    frozen_out2, _ = qat_apply(m, v, x, mutable=["intermediates"],
                               static_scales={("nope",): 1.0})
    # weights still fake-quanted, so compare against weight-only QAT
    w_only = qat_apply(m, v, x, quant_acts=False)
    assert np.allclose(np.asarray(frozen_out2), np.asarray(w_only),
                       atol=1e-5)
