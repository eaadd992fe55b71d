"""AutoDrive trainer: loss math, QAT fake-quant STE, backbone warm-start."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.train.autodrive_trainer import (
    autodrive_loss, fake_quant_int8)


def test_autodrive_loss_components():
    d = jnp.asarray([[0.5]])
    c = jnp.asarray([[0.1]])
    f = jnp.asarray([[2.0]])
    total, parts = autodrive_loss(d, c, f, jnp.asarray([0.7]),
                                  jnp.asarray([0.1]), jnp.asarray([1.0]))
    assert abs(float(parts["distance"]) - 0.2) < 1e-6
    assert float(parts["curvature"]) < 1e-6
    # BCE with logit 2 target 1 = softplus(-2)
    assert abs(float(parts["flag"]) - np.log1p(np.exp(-2.0))) < 1e-6


def test_fake_quant_ste():
    w = jnp.linspace(-1, 1, 64)
    q = fake_quant_int8(w)
    # quantized values close to original, on the int8 grid
    assert float(jnp.max(jnp.abs(q - w))) < 1.0 / 127
    # straight-through: gradient of sum(fq(w)) == ones
    g = jax.grad(lambda w: jnp.sum(fake_quant_int8(w)))(w)
    np.testing.assert_allclose(np.asarray(g), 1.0)


@pytest.mark.slow
def test_autodrive_trainer_step_and_warmstart():
    from autoware_vision_pilot_tpu.train.autodrive_trainer import (
        AutoDriveTrainer, AutoDriveTrainerConfig)
    from autoware_vision_pilot_tpu.models.auto_speed import AutoSpeedNetwork

    hw = (128, 256)
    tr = AutoDriveTrainer(AutoDriveTrainerConfig(input_hw=hw, qat=False))
    # warm start from an AutoSpeed init
    asn = AutoSpeedNetwork(variant="n", num_classes=4, img_h=hw[0],
                           img_w=hw[1])
    asv = asn.init(jax.random.key(1), jnp.zeros((1, *hw, 3)))
    n = tr.warm_start_from_autospeed(asv["params"])
    assert n > 50  # the whole backbone transfers

    rng = np.random.default_rng(0)
    prev = rng.integers(0, 256, (2, *hw, 3), dtype=np.uint8)
    curr = rng.integers(0, 256, (2, *hw, 3), dtype=np.uint8)
    losses = [tr.fit_step(prev, curr, np.array([0.4, 0.6]),
                          np.array([0.0, 0.1]), np.array([0.0, 1.0]))
              for _ in range(6)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
