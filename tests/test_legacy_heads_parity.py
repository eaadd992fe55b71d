"""Parity of the legacy EgoPath/AutoSteer-1.0 modules (BEVPathContext,
AutoSteerHead) vs the reference torch files."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from jax import lax

from autoware_vision_pilot_tpu.convert import import_state_dict
from autoware_vision_pilot_tpu.models.ego_path import (
    BEVPathContext, AutoSteerHead)

from support.reference import load_standalone

P = lax.Precision.HIGHEST


def nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


@pytest.mark.ref_parity
def test_bev_path_context_parity():
    torch.manual_seed(0)
    ref = load_standalone("bev_path_context")
    tm = ref.BEVPathContext()
    tm.eval()
    x = torch.randn(1, 1456, 10, 20)
    with torch.no_grad():
        y_t = tm(x)
    jm = BEVPathContext(precision=P)
    var = jm.init(jax.random.key(0), nhwc(x))
    # strict=False: the reference declares an `upsample_layer` it never
    # calls in forward — a dead parameter we do not materialize
    var = import_state_dict(var, {k: v.numpy()
                                  for k, v in tm.state_dict().items()},
                            strict=False)
    y_j = jm.apply(var, nhwc(x))
    np.testing.assert_allclose(nchw(y_j), y_t.numpy(), atol=2e-4, rtol=1e-3)


@pytest.mark.heavy
def test_auto_steer_head_functional():
    """The reference AutoSteerHead cannot execute under any input size
    (torch.flatten of its 64-channel map can never match the hard-coded
    Linear(800) — dead code upstream; its ego_path_network module does not
    exist, SURVEY §2.2 P16 note). We keep a working analog: same layer
    stack, steering vector sized by the actual flattened features."""
    ctx = jnp.zeros((1, 10, 20, 256))
    neck = jnp.zeros((1, 40, 80, 256))
    prev = jnp.zeros((1, 10, 20, 64))
    jm = AutoSteerHead(precision=P)
    (angle, feat), _ = jm.init_with_output(jax.random.key(0), ctx, neck,
                                           prev)
    assert angle.shape == (1, 1)
    assert feat.shape == (1, 10, 20, 64)
