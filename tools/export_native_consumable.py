"""Export a model as a native-consumable artifact for the C++ runners.

The reference ships two native deploy examples that prove its export
contract: Models/exports/onnx_rt/main.cpp (ONNX-Runtime C++) and
Models/exports/libtorch/main.cpp (TorchScript C++). The TPU-native
equivalents produced here:

1. ``<name>_tf_graph.pb`` — a TensorFlow GraphDef whose single compute
   node is ``XlaCallModule`` carrying the jax.export StableHLO bytecode.
   Consumed Python-free by ``host/tools/stablehlo_tf_runner.cpp`` through
   the TF C API (libtensorflow_cc), which JIT-compiles the embedded
   StableHLO with XLA:CPU — the same execution path jax2tf native
   serialization uses.
2. ``<name>_stablehlo.mlirbc`` — the raw StableHLO module bytecode for
   ``host/tools/pjrt_stablehlo_runner.cpp`` (PjRt C API; dlopens a PjRt
   plugin such as libtpu.so on real TPU hosts).
3. ``<name>_input.npy`` / ``<name>_golden.npy`` — a deterministic input
   and the JAX forward's output, the parity contract both runners assert.

Run: JAX_PLATFORMS=cpu python tools/export_native_consumable.py [outdir]
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    out_dir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                           else "exports/native")
    out_dir.mkdir(parents=True, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export
    from autoware_vision_pilot_tpu.models import SceneSegNetwork

    name = "scene_seg"
    model = SceneSegNetwork()  # f32: the cross-runtime parity dtype
    rng = jax.random.key(0)
    x0 = jnp.zeros((1, 320, 640, 3), jnp.float32)
    variables = model.init(rng, x0)

    def fwd(x):
        return model.apply(variables, x)

    # CPU-only lowering: a single-platform module needs no platform-index
    # argument, which keeps the C++ call sites trivial.
    exported = jax_export.export(jax.jit(fwd), platforms=["cpu"])(x0)
    module_bytes = exported.mlir_module_serialized
    version = exported.calling_convention_version
    (out_dir / f"{name}_stablehlo.mlirbc").write_bytes(module_bytes)

    # deterministic input + golden output (the parity contract)
    x = np.random.default_rng(42).normal(
        0.0, 1.0, x0.shape).astype(np.float32)
    golden = np.asarray(fwd(jnp.asarray(x)))
    np.save(out_dir / f"{name}_input.npy", x)
    np.save(out_dir / f"{name}_golden.npy", golden)

    # Wrap in a TF GraphDef: Placeholder -> XlaCallModule -> Identity.
    # TF 2.21 registers the XlaCallModule op (kernel included) but ships
    # no python wrapper for it, so the NodeDef is assembled directly.
    import tensorflow as tf
    from tensorflow.core.framework import (
        graph_pb2, types_pb2)
    from tensorflow.python.framework import versions as tf_versions

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
    n.attr["version"].i = version
    n.attr["module"].s = module_bytes
    n.attr["Tin"].list.type.append(types_pb2.DT_FLOAT)
    n.attr["Tout"].list.type.append(types_pb2.DT_FLOAT)
    sout = n.attr["Sout"].list.shape.add()
    for d in golden.shape:
        sout.dim.add().size = d
    n.attr["platforms"].list.s.append(b"CPU")
    n.attr["dim_args_spec"].list.SetInParent()
    n.attr["function_list"].list.SetInParent()
    n.attr["disabled_checks"].list.SetInParent()
    n.attr["has_token_input_output"].b = False

    n_out = gd.node.add()
    n_out.name, n_out.op = "output", "Identity"
    n_out.input.append("stablehlo_call:0")
    n_out.attr["T"].type = types_pb2.DT_FLOAT

    # self-check through the same TF runtime the C API uses
    with tf.Graph().as_default() as g:
        tf.graph_util.import_graph_def(gd, name="")
        with tf.compat.v1.Session(graph=g) as sess:
            y = sess.run("output:0", feed_dict={"input:0": x})
    err = float(np.abs(y - golden).max())
    assert err <= 2e-4, f"TF runtime parity check failed: {err}"

    pb_path = out_dir / f"{name}_tf_graph.pb"
    pb_path.write_bytes(gd.SerializeToString())
    (out_dir / f"{name}_io.txt").write_text("input\noutput\n")
    print(f"wrote {pb_path} (module {len(module_bytes)} bytes, "
          f"convention v{version}, TF self-check max|diff|={err:.2e}, "
          f"golden {golden.shape})")


if __name__ == "__main__":
    main()
