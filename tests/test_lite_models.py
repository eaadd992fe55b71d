"""Lite model family: shapes, output strides, dilation behavior."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.models.lite import DeepLabV3Plus, UnetPlusPlus
from autoware_vision_pilot_tpu.models.efficientnet import (
    EfficientNetEncoder, B0_STAGES, B1_STAGES)


@pytest.mark.heavy
def test_encoder_output_strides():
    x = jnp.zeros((1, 64, 128, 3))
    for os_, want in [(32, 2), (16, 4), (8, 8)]:
        enc = EfficientNetEncoder(B0_STAGES, output_stride=os_)
        feats, _ = enc.init_with_output(jax.random.key(0), x)
        assert feats[-1].shape[1] == 64 // os_, (os_, feats[-1].shape)
        assert feats[-1].shape[-1] == 320
        assert [f.shape[-1] for f in feats] == [32, 24, 40, 112, 320]


@pytest.mark.heavy
def test_b1_encoder_deeper():
    enc0 = EfficientNetEncoder(B0_STAGES)
    enc1 = EfficientNetEncoder(B1_STAGES)
    x = jnp.zeros((1, 32, 64, 3))
    v0 = enc0.init(jax.random.key(0), x)
    v1 = enc1.init(jax.random.key(0), x)
    n0 = sum(p.size for p in jax.tree.leaves(v0["params"]))
    n1 = sum(p.size for p in jax.tree.leaves(v1["params"]))
    assert n1 > n0


def test_deeplabv3plus_shapes():
    m = DeepLabV3Plus(output_channels=3, output_stride=16)
    x = jnp.zeros((1, 64, 128, 3))
    out, _ = m.init_with_output(jax.random.key(0), x)
    assert out.shape == (1, 64, 128, 3)  # stride4 decoder + 4x head upsample


def test_deeplabv3plus_head_activation():
    m = DeepLabV3Plus(output_channels=1, head_activation="sigmoid")
    x = jnp.zeros((1, 32, 64, 3))
    out, _ = m.init_with_output(jax.random.key(0), x)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()


@pytest.mark.heavy
def test_unetplusplus_shapes():
    m = UnetPlusPlus(output_channels=3, decoder_channels=(64, 48, 32, 16))
    x = jnp.zeros((1, 64, 128, 3))
    out, _ = m.init_with_output(jax.random.key(0), x)
    assert out.shape == (1, 64, 128, 3)


import pytest as _pytest


@_pytest.mark.slow
def test_autospeed_variants_construct():
    """'n'/'s'/'m' width/depth/csp variants build and run
    (auto_speed_network.py:60-66 dynamic_weighting)."""
    from autoware_vision_pilot_tpu.models.auto_speed import AutoSpeedNetwork
    x = jnp.zeros((1, 128, 256, 3))
    for variant in ("n", "s", "m"):
        m = AutoSpeedNetwork(variant=variant, num_classes=4,
                             img_h=128, img_w=256)
        out, _ = m.init_with_output(jax.random.key(0), x)
        assert out.shape[0] == 1 and out.shape[2] == 8  # (B, A, 4+nc)
