"""Parity of the YOLO family (AutoSpeed / AutoSteer / AutoDrive) vs the
reference torch graphs imported from /root/reference (PEP 420 namespace
package imports). Full native 512x1024 input — marked slow."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from jax import lax

from autoware_vision_pilot_tpu.convert import import_state_dict
from autoware_vision_pilot_tpu.models.auto_speed import AutoSpeedNetwork
from autoware_vision_pilot_tpu.models.auto_steer import AutoSteerNetwork
from autoware_vision_pilot_tpu.models.auto_drive import AutoDriveNetwork

from support.reference import load_packaged, state_dict_numpy
from support.torch_b0 import randomize_bn_stats

P = lax.Precision.HIGHEST
H, W = 512, 1024


def nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


@pytest.mark.ref_parity
@pytest.mark.slow
def test_auto_speed_parity():
    torch.manual_seed(0)
    ref = load_packaged(
        "Models.model_components.auto_speed.auto_speed_network")
    tm = ref.AutoSpeedNetwork().build_model(version="n", num_classes=4)
    randomize_bn_stats(tm, seed=1)
    tm.eval()

    x = torch.randn(1, 3, H, W)
    with torch.no_grad():
        y_t = tm(x)  # (1, 4+nc, A)

    jm = AutoSpeedNetwork(variant="n", num_classes=4, img_h=H, img_w=W,
                          precision=P)
    var = jm.init(jax.random.key(0), nhwc(x))
    var = import_state_dict(var, state_dict_numpy(tm), strict=False)
    y_j = jm.apply(var, nhwc(x))  # (1, A, 4+nc)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 2, 1),
                               y_t.numpy(), atol=5e-4, rtol=1e-3)


@pytest.mark.ref_parity
@pytest.mark.slow
def test_auto_steer_parity():
    torch.manual_seed(1)
    ref = load_packaged(
        "Models.model_components.auto_steer.auto_steer_network")
    tm = ref.AutoSteerNetwork().build_model(version="n")
    randomize_bn_stats(tm, seed=2)
    tm.eval()

    x = torch.randn(1, 3, H, W)
    with torch.no_grad():
        lane_t, height_t = tm(x)

    jm = AutoSteerNetwork(variant="n", img_h=H, img_w=W, precision=P)
    var = jm.init(jax.random.key(0), nhwc(x))
    var = import_state_dict(var, state_dict_numpy(tm))
    lane_j, height_j = jm.apply(var, nhwc(x))
    np.testing.assert_allclose(np.asarray(lane_j).transpose(0, 3, 1, 2),
                               lane_t.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(height_j).transpose(0, 3, 1, 2),
                               height_t.numpy(), atol=2e-4, rtol=1e-3)


@pytest.mark.ref_parity
@pytest.mark.slow
def test_auto_drive_parity():
    torch.manual_seed(2)
    adn = load_packaged(
        "Models.model_components.autodrive.autodrive_network")
    tm = adn.AutoDrive()
    randomize_bn_stats(tm, seed=3)
    tm.eval()

    xp = torch.randn(1, 3, H, W)
    xc = torch.randn(1, 3, H, W)
    with torch.no_grad():
        d_t, c_t, f_t = tm(xp, xc)

    jm = AutoDriveNetwork(img_h=H, img_w=W, precision=P)
    var = jm.init(jax.random.key(0), nhwc(xp), nhwc(xc))
    var = import_state_dict(var, state_dict_numpy(tm))
    d_j, c_j, f_j = jm.apply(var, nhwc(xp), nhwc(xc))
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(f_j), f_t.numpy(), atol=2e-4, rtol=1e-3)
