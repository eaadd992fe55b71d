"""Numeric parity of the layer library vs PyTorch (<=1e-5 in f32)."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from jax import lax

from autoware_vision_pilot_tpu.nn.layers import (
    Conv2d, ConvTranspose2d, Linear, max_pool2d, gelu, upsample2x_nearest,
)
from autoware_vision_pilot_tpu.convert import import_state_dict

P = lax.Precision.HIGHEST


def to_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def from_nhwc(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("stride,pad,groups", [(1, 1, 1), (2, 1, 1), (1, 2, 8)])
def test_conv2d(stride, pad, groups):
    torch.manual_seed(0)
    x = torch.randn(2, 8, 16, 20)
    k = 3 if pad == 1 else 5
    tc = torch.nn.Conv2d(8, 8 if groups > 1 else 12, k, stride, pad, groups=groups)
    mod = Conv2d(tc.out_channels, k, stride, pad, groups=groups, precision=P)
    var = mod.init(jax.random.key(0), to_nhwc(x))
    var = import_state_dict(var, {k_: v.numpy() for k_, v in tc.state_dict().items()})
    y = mod.apply(var, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(y), tc(x).detach().numpy(),
                               atol=1e-5, rtol=1e-5)


def test_conv_transpose2d():
    torch.manual_seed(1)
    x = torch.randn(2, 8, 10, 12)
    tc = torch.nn.ConvTranspose2d(8, 12, 2, 2)
    mod = ConvTranspose2d(12, 2, 2, precision=P)
    var = mod.init(jax.random.key(0), to_nhwc(x))
    var = import_state_dict(var, {k: v.numpy() for k, v in tc.state_dict().items()})
    y = mod.apply(var, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(y), tc(x).detach().numpy(),
                               atol=1e-5, rtol=1e-5)


def test_conv_transpose2d_einsum_equals_lax(monkeypatch):
    """The k==s einsum+depth-to-space lowering must match
    lax.conv_transpose to float summation-order tolerance (1 ulp f32;
    AVP_CT_EINSUM toggles it — the env var is read at trace time)."""
    import os
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 10, 12, 8)), jnp.float32)
    mod = ConvTranspose2d(12, 2, 2, precision=P)
    var = mod.init(jax.random.key(0), x)
    monkeypatch.setitem(os.environ, "AVP_CT_EINSUM", "1")
    y_e = mod.apply(var, x)
    monkeypatch.setitem(os.environ, "AVP_CT_EINSUM", "0")
    y_l = mod.apply(var, x)
    np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_l),
                               atol=3e-7, rtol=1e-6)


def test_linear():
    torch.manual_seed(2)
    x = torch.randn(4, 40)
    tl = torch.nn.Linear(40, 30)
    mod = Linear(30, precision=P)
    var = mod.init(jax.random.key(0), jnp.asarray(x.numpy()))
    var = import_state_dict(var, {k: v.numpy() for k, v in tl.state_dict().items()})
    y = mod.apply(var, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), tl(x).detach().numpy(),
                               atol=1e-5, rtol=1e-5)


def test_batchnorm_eval():
    import flax.linen as fnn
    torch.manual_seed(3)
    bn = torch.nn.BatchNorm2d(8, eps=0.001, momentum=0.03)
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_()
        bn.bias.normal_()
    bn.eval()
    x = torch.randn(2, 8, 6, 6)
    mod = fnn.BatchNorm(use_running_average=True, epsilon=0.001, momentum=0.97)
    var = mod.init(jax.random.key(0), to_nhwc(x))
    var = import_state_dict(var, {k: v.numpy() for k, v in bn.state_dict().items()})
    y = mod.apply(var, to_nhwc(x))
    np.testing.assert_allclose(from_nhwc(y), bn(x).detach().numpy(),
                               atol=1e-5, rtol=1e-5)


def test_maxpool_gelu_upsample():
    torch.manual_seed(4)
    x = torch.randn(2, 8, 12, 16)
    np.testing.assert_allclose(
        from_nhwc(max_pool2d(to_nhwc(x), 2, 2)),
        torch.nn.MaxPool2d(2, 2)(x).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        from_nhwc(max_pool2d(to_nhwc(x), 5, 1, 2)),
        torch.nn.MaxPool2d(5, 1, 2)(x).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        from_nhwc(gelu(to_nhwc(x))),
        torch.nn.GELU()(x).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        from_nhwc(upsample2x_nearest(to_nhwc(x))),
        torch.nn.Upsample(scale_factor=2)(x).numpy(), atol=1e-6)
