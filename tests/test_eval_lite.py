"""Lite config family + eval CLI (reference exports/lite_models/eval_*.py
and Models/config/{SceneSegLite,EgoLanesLite,Scene3DLite}.yaml analogs)."""
import json
import pathlib

import numpy as np
import pytest

from autoware_vision_pilot_tpu.models.lite import (
    DeepLabV3Plus, build_lite_model)
from autoware_vision_pilot_tpu.train.lite_trainer import (
    load_experiment_config)
from autoware_vision_pilot_tpu.export import eval_lite

REPO = pathlib.Path(__file__).resolve().parents[1]
CONFIGS = REPO / "configs"


def test_build_lite_model_from_configs():
    ego = load_experiment_config(CONFIGS / "EgoLanesLite.yaml")
    m = build_lite_model(ego)
    assert isinstance(m, DeepLabV3Plus)
    assert m.output_channels == 3
    assert m.head_upsampling == 1       # OS=1/4 lane-mask contract
    assert m.decoder_channels == 64
    assert m.atrous_rates == (12, 24, 36)

    s3d = load_experiment_config(CONFIGS / "Scene3DLite.yaml")
    m = build_lite_model(s3d)
    assert m.output_channels == 1
    assert m.head_activation == "sigmoid"
    assert m.head_upsampling == 4

    seg = load_experiment_config(CONFIGS / "SceneSegLite.yaml")
    m = build_lite_model(seg, output_stride=16)
    assert m.encoder_name == "efficientnet_b0"


def test_build_lite_model_unetplusplus():
    m = build_lite_model({"network": {
        "model": "unetplusplus",
        "backbone": {"type": "efficientnet_b0"},
        "head": {"head_upsampling": 2},
        "output_channels": 3}})
    assert type(m).__name__ == "UnetPlusPlus"
    with pytest.raises(ValueError):
        build_lite_model({"network": {"model": "fcn"}})


@pytest.mark.parametrize("config,task,metric", [
    ("SceneSegLite.yaml", "seg", "miou"),
    ("EgoLanesLite.yaml", "lanes", "mean_lane_iou"),
    ("Scene3DLite.yaml", "depth", "absrel"),
])
@pytest.mark.heavy
def test_eval_lite_synthetic(tmp_path, config, task, metric):
    out = tmp_path / "summary.json"
    summary = eval_lite.main([
        "--config", str(CONFIGS / config),
        "--synthetic", "2", "--height", "64", "--width", "128",
        "--out", str(out)])
    assert summary["task"] == task
    assert summary["samples"] == 2
    assert metric in summary and np.isfinite(summary[metric])
    assert json.loads(out.read_text())[metric] == summary[metric]


@pytest.mark.heavy
def test_eval_lite_onnx_weights(tmp_path):
    """--onnx path: weights written as a .onnx artifact load through
    convert/onnx_import and produce identical metrics to the random-init
    run they came from."""
    import jax
    import jax.numpy as jnp
    from autoware_vision_pilot_tpu.convert import (
        save_state_dict_as_onnx)
    from autoware_vision_pilot_tpu.convert.torch_import import (
        flatten_params)

    cfg = load_experiment_config(CONFIGS / "SceneSegLite.yaml")
    model = build_lite_model(cfg)
    var = model.init(jax.random.key(7), jnp.zeros((1, 64, 128, 3)))

    # Serialize the flax tree as a torch-layout state_dict in ONNX:
    # reverse the importer's transposes so import_onnx reconstructs it.
    sd = {}
    for path, v in flatten_params(var["params"]).items():
        mod, leaf = path.rsplit(".", 1)
        a = np.asarray(v)
        if leaf == "w":
            sd[f"{mod}.weight"] = a.transpose(3, 2, 0, 1)
        elif leaf == "wt":
            sd[f"{mod}.weight"] = a.transpose(3, 2, 0, 1)
        elif leaf == "wl":
            sd[f"{mod}.weight"] = a.transpose(1, 0)
        elif leaf == "b":
            sd[f"{mod}.bias"] = a
        elif leaf == "scale":
            tmod = mod[:-3] if mod.endswith(".bn") else mod
            sd[f"{tmod}.weight"] = a
        elif leaf == "bias":
            tmod = mod[:-3] if mod.endswith(".bn") else mod
            sd[f"{tmod}.bias"] = a
    for path, v in flatten_params(var.get("batch_stats", {})).items():
        mod, leaf = path.rsplit(".", 1)
        tmod = mod[:-3] if mod.endswith(".bn") else mod
        sd[f"{tmod}.running_mean" if leaf == "mean"
           else f"{tmod}.running_var"] = np.asarray(v)

    onnx_path = tmp_path / "lite.onnx"
    save_state_dict_as_onnx(sd, onnx_path, "SceneSegLite")

    # Round-trip: import into a DIFFERENT init and require bit-equal
    # forwards vs the source weights.
    from autoware_vision_pilot_tpu.convert import import_onnx
    var2 = import_onnx(
        model.init(jax.random.key(0), jnp.zeros((1, 64, 128, 3))),
        onnx_path)
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, 64, 128, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(model.apply(var, x)),
                                  np.asarray(model.apply(var2, x)))

    got = eval_lite.main([
        "--config", str(CONFIGS / "SceneSegLite.yaml"),
        "--onnx", str(onnx_path),
        "--synthetic", "2", "--height", "64", "--width", "128"])
    assert got["task"] == "seg"
    assert np.isfinite(got["miou"])
