"""N36 parity: the exported StableHLO artifact is consumable from native
C++ (reference ships Models/exports/onnx_rt/main.cpp and
Models/exports/libtorch/main.cpp as proof of its export contract).

The full-SceneSeg artifact is exercised by
tools/export_native_consumable.py + host/tools/stablehlo_tf_runner.cpp in
CI. This test proves the same chain end-to-end on a small network so it
stays in the regular suite: jax.export -> XlaCallModule GraphDef ->
C++ TF-C-API runner (no Python in that process) -> output parity.
"""
from __future__ import annotations

import pathlib
import shutil
import subprocess

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
TF_DIR = pathlib.Path(
    "/opt/venv/lib/python3.12/site-packages/tensorflow")

pytestmark = pytest.mark.slow


def _have_toolchain():
    return (shutil.which("cmake") and shutil.which("ninja")
            and (TF_DIR / "libtensorflow_cc.so.2").exists())


@pytest.fixture(scope="module")
def runners(tmp_path_factory):
    if not _have_toolchain():
        pytest.skip("cmake/ninja/libtensorflow_cc not available")
    build = tmp_path_factory.mktemp("host_build")
    subprocess.run(
        ["cmake", "-S", str(REPO / "host"), "-B", str(build), "-G",
         "Ninja", f"-DTF_DIR={TF_DIR}"],
        check=True, capture_output=True)
    subprocess.run(
        ["ninja", "-C", str(build), "stablehlo_tf_runner",
         "pjrt_stablehlo_runner"],
        check=True, capture_output=True)
    return build


def _export_artifacts(out_dir: pathlib.Path):
    """Small net through the exact export path of
    tools/export_native_consumable.py."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export
    from tensorflow.core.framework import graph_pb2, types_pb2
    from tensorflow.python.framework import versions as tf_versions
    from autoware_vision_pilot_tpu.models.lite import DeepLabV3Plus

    model = DeepLabV3Plus(output_channels=3)
    x0 = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0)

    def fwd(x):
        return model.apply(variables, x)

    exported = jax_export.export(jax.jit(fwd), platforms=["cpu"])(x0)
    x = np.random.default_rng(1).normal(0, 1, x0.shape).astype(np.float32)
    golden = np.asarray(fwd(jnp.asarray(x)))

    gd = graph_pb2.GraphDef()
    gd.versions.producer = tf_versions.GRAPH_DEF_VERSION
    n_in = gd.node.add()
    n_in.name, n_in.op = "input", "Placeholder"
    n_in.attr["dtype"].type = types_pb2.DT_FLOAT
    for d in x0.shape:
        n_in.attr["shape"].shape.dim.add().size = d
    n = gd.node.add()
    n.name, n.op = "stablehlo_call", "XlaCallModule"
    n.input.append("input")
    n.attr["version"].i = exported.calling_convention_version
    n.attr["module"].s = exported.mlir_module_serialized
    n.attr["Tin"].list.type.append(types_pb2.DT_FLOAT)
    n.attr["Tout"].list.type.append(types_pb2.DT_FLOAT)
    sout = n.attr["Sout"].list.shape.add()
    for d in golden.shape:
        sout.dim.add().size = d
    n.attr["platforms"].list.s.append(b"CPU")
    n_out = gd.node.add()
    n_out.name, n_out.op = "output", "Identity"
    n_out.input.append("stablehlo_call:0")
    n_out.attr["T"].type = types_pb2.DT_FLOAT

    (out_dir / "net_tf_graph.pb").write_bytes(gd.SerializeToString())
    (out_dir / "net_io.txt").write_text("input\noutput\n")
    (out_dir / "net_stablehlo.mlirbc").write_bytes(
        exported.mlir_module_serialized)
    np.save(out_dir / "net_input.npy", x)
    np.save(out_dir / "net_golden.npy", golden)


def test_cpp_tf_runner_executes_stablehlo_with_parity(runners, tmp_path):
    _export_artifacts(tmp_path)
    r = subprocess.run(
        [str(runners / "stablehlo_tf_runner"),
         str(tmp_path / "net_tf_graph.pb"), str(tmp_path / "net_io.txt"),
         str(tmp_path / "net_input.npy"),
         str(tmp_path / "net_golden.npy"), "2e-4"],
        capture_output=True, text=True)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "max|diff|" in r.stdout


def test_pjrt_runner_builds_and_reports_usage(runners):
    """The PjRt C API harness needs a local PjRt plugin (libtpu.so on a
    real TPU host) to execute; here we assert the binary is healthy:
    it parses arguments and reports the missing-plugin path cleanly."""
    r = subprocess.run([str(runners / "pjrt_stablehlo_runner")],
                       capture_output=True, text=True)
    assert r.returncode == 2
    assert "usage:" in r.stderr
    r = subprocess.run(
        [str(runners / "pjrt_stablehlo_runner"), "/nonexistent/plugin.so",
         "m", "i", "g"], capture_output=True, text=True)
    assert r.returncode == 2
    assert "dlopen" in r.stderr
