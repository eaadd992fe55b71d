"""Export a stateful per-frame step as a native-app artifact bundle.

The reference's deployable unit is a Python-free native binary
(VisionPilot/production_release/main.cpp:1543-1959: capture -> engines ->
SHM publisher). The TPU-native equivalent: the per-frame step — a pure
jittable ``step(frame_u8, state) -> (outputs, new_state)`` with a pytree
carried state (runtime/pipeline.build_lateral_step) — is exported ONCE as
StableHLO and executed in a loop by ``host/tools/visionpilot_app.cpp``
with zero Python in the deployed process. The C++ loop feeds each
iteration's state outputs back into the next iteration's state inputs,
so the carried state never rests anywhere but the runtime's buffers.

Artifact bundle (all files in one directory):

- ``<name>_tf_graph.pb``   — GraphDef: Placeholders -> XlaCallModule
  (serialized StableHLO) -> per-output Identity nodes. Input naming
  convention: ``frame`` (uint8) then ``state_0..state_{n-1}`` (f32);
  outputs ``out_0..out_{m-1}`` then ``state_out_0..state_out_{n-1}``.
- ``<name>_state_<i>.npy``  — initial state tensors (f32 wire format).
- ``<name>_manifest.txt``   — line-oriented manifest the C++ app parses:
  ``graph <file>``, ``frame <H> <W> <C>``, ``n_state <n>``,
  ``n_out <m>``, ``out <i> <rank> <dims...>``.

State wire format: every leaf crosses the boundary as float32 —
f32 leaves pass through, bool casts (exact), int32 and PRNG key data
BITCAST to f32 (bit-exact through host memcpy; no arithmetic touches
them on the host side). The wrapper restores the exact pytree + dtypes
in-graph.
"""
from __future__ import annotations

import pathlib

import numpy as np
import jax
import jax.numpy as jnp


def _to_wire(leaf):
    """Encode one state leaf as an f32 array (see module docstring)."""
    if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
        raw = jax.random.key_data(leaf)  # uint32[..., 2]
        return jax.lax.bitcast_convert_type(raw, jnp.float32)
    if leaf.dtype == jnp.bool_:
        return leaf.astype(jnp.float32)
    if leaf.dtype == jnp.int32:
        return jax.lax.bitcast_convert_type(leaf, jnp.float32)
    if leaf.dtype == jnp.uint32:
        return jax.lax.bitcast_convert_type(leaf, jnp.float32)
    return leaf.astype(jnp.float32)


def _from_wire(wire, proto):
    """Decode an f32 wire array back to proto's dtype (+ key type)."""
    if jnp.issubdtype(proto.dtype, jax.dtypes.prng_key):
        raw = jax.lax.bitcast_convert_type(wire, jnp.uint32)
        impl = jax.random.key_impl(proto)
        return jax.random.wrap_key_data(raw, impl=impl)
    if proto.dtype == jnp.bool_:
        return wire > 0.5
    if proto.dtype in (jnp.int32, jnp.uint32):
        return jax.lax.bitcast_convert_type(wire, proto.dtype)
    return wire.astype(proto.dtype)


def export_native_app(step, init_state, frame_shape, out_dir,
                      name: str = "lateral",
                      outputs_from=lambda out: [out["scalars"],
                                                out["coeffs"]]):
    """Export ``step(frame_u8, state) -> (outputs, new_state)`` for the
    C++ app loop (host/tools/visionpilot_app.cpp).

    ``outputs_from`` selects which per-frame arrays the host receives
    (order defines out_0..out_{m-1}; out_0 MUST be the packed scalar
    vector the app publishes to /visionpilot_state).

    Returns the manifest path.
    """
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    leaves, treedef = jax.tree.flatten(init_state)
    wire_init = [np.asarray(_to_wire(l)) for l in leaves]

    def wrapped(frame_u8, *wire_state):
        state = jax.tree.unflatten(
            treedef, [_from_wire(w, p) for w, p in zip(wire_state, leaves)])
        out, new_state = step(frame_u8, state)
        new_leaves = jax.tree.leaves(new_state)
        return tuple(a.astype(jnp.float32) for a in outputs_from(out)) + \
            tuple(_to_wire(l) for l in new_leaves)

    from jax import export as jax_export
    frame0 = jnp.zeros(frame_shape, jnp.uint8)
    wire0 = [jnp.asarray(w) for w in wire_init]
    # keep_unused: a state leaf the step writes but never reads must STILL
    # be a module parameter — the C++ loop feeds every state slot back.
    exported = jax_export.export(jax.jit(wrapped, keep_unused=True),
                                 platforms=["cpu"])(frame0, *wire0)
    module_bytes = exported.mlir_module_serialized

    # golden probe: one deterministic frame through the EXPORTED module
    # (exported.call replays the serialized StableHLO), so the C++
    # binary's first iteration is checked against the exact program it
    # runs. An eager wrapped() here would differ: unfused op-by-op
    # arithmetic drifts from the jitted program by ULPs, and the lane
    # RANSAC/threshold path amplifies that past any fixed tolerance.
    rng = np.random.default_rng(7)
    probe = jnp.asarray(rng.integers(0, 256, frame_shape, dtype=np.uint8))
    probe_out = exported.call(probe, *wire0)
    n_state = len(leaves)
    n_out = len(probe_out) - n_state

    from tensorflow.core.framework import graph_pb2, types_pb2
    from tensorflow.python.framework import versions as tf_versions

    gd = graph_pb2.GraphDef()
    gd.versions.producer = tf_versions.GRAPH_DEF_VERSION

    def placeholder(pname, dtype, shape):
        n = gd.node.add()
        n.name, n.op = pname, "Placeholder"
        n.attr["dtype"].type = dtype
        for d in shape:
            n.attr["shape"].shape.dim.add().size = d

    placeholder("frame", types_pb2.DT_UINT8, frame_shape)
    for i, w in enumerate(wire_init):
        placeholder(f"state_{i}", types_pb2.DT_FLOAT, w.shape)

    call = gd.node.add()
    call.name, call.op = "stablehlo_call", "XlaCallModule"
    call.input.append("frame")
    for i in range(n_state):
        call.input.append(f"state_{i}")
    call.attr["version"].i = exported.calling_convention_version
    call.attr["module"].s = module_bytes
    call.attr["Tin"].list.type.append(types_pb2.DT_UINT8)
    for _ in range(n_state):
        call.attr["Tin"].list.type.append(types_pb2.DT_FLOAT)
    for o in probe_out:
        call.attr["Tout"].list.type.append(types_pb2.DT_FLOAT)
        sh = call.attr["Sout"].list.shape.add()
        for d in np.asarray(o).shape:
            sh.dim.add().size = d
    call.attr["platforms"].list.s.append(b"CPU")
    call.attr["dim_args_spec"].list.SetInParent()
    call.attr["function_list"].list.SetInParent()
    call.attr["disabled_checks"].list.SetInParent()
    call.attr["has_token_input_output"].b = False

    for j in range(n_out):
        n = gd.node.add()
        n.name, n.op = f"out_{j}", "Identity"
        n.input.append(f"stablehlo_call:{j}")
        n.attr["T"].type = types_pb2.DT_FLOAT
    for i in range(n_state):
        n = gd.node.add()
        n.name, n.op = f"state_out_{i}", "Identity"
        n.input.append(f"stablehlo_call:{n_out + i}")
        n.attr["T"].type = types_pb2.DT_FLOAT

    pb_path = out_dir / f"{name}_tf_graph.pb"
    pb_path.write_bytes(gd.SerializeToString())

    # np.save's v1 '<f4' C-order format is exactly what the C++ side's
    # npy_io.hpp read_npy_f32 parses.
    for i, w in enumerate(wire_init):
        np.save(out_dir / f"{name}_state_{i}.npy",
                np.asarray(w, np.float32))
    np.save(out_dir / f"{name}_probe_frame.npy", np.asarray(probe))
    np.save(out_dir / f"{name}_probe_scalars.npy",
            np.asarray(probe_out[0], np.float32))

    lines = [f"graph {pb_path.name}",
             "frame " + " ".join(str(d) for d in frame_shape),
             f"n_state {n_state}", f"n_out {n_out}"]
    for j in range(n_out):
        o = np.asarray(probe_out[j])
        lines.append(f"out {j} {o.ndim} " +
                     " ".join(str(d) for d in o.shape))
    man = out_dir / f"{name}_manifest.txt"
    man.write_text("\n".join(lines) + "\n")
    return man
