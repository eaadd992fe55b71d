"""Import reference ONNX artifacts into flax parameter trees.

Released VisionPilot weights ship as ``.onnx`` graphs produced by
``Models/exports/convert_pytorch_to_onnx.py`` (torch.onnx.export,
export_params=True, opset 18).  In those files every learned parameter is
a graph *initializer*; the TorchScript exporter names initializers after
the originating ``state_dict`` keys (e.g. ``Backbone.features.0.0.weight``)
unless constant folding rewrote them.

Two import paths:

1. **Named path** (exports whose initializer names survive): rebuild a
   torch-style state_dict from the initializers and hand it to
   ``torch_import.import_state_dict`` — the same converter the ``.pth``
   path uses, so all layout transposes (OIHW->HWIO etc.) are shared.
2. **Folded path** (``do_constant_folding=True`` exports where BatchNorm
   was fused into the preceding Conv): the BN initializers are gone and
   the conv weights carry the fused values.  ``fold_missing_bn`` fills
   every unmatched BN leaf with identity (scale=1, bias=0, mean=0,
   var=1-eps) so the imported network computes the *folded* function —
   numerically identical to the reference's eval-mode graph.

No ``onnx`` / ``onnxruntime`` dependency: parsing is done by
``onnx_proto`` (pure-Python wire codec).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np
import jax.numpy as jnp

from . import onnx_proto
from .torch_import import (
    flatten_params, unflatten_params, import_state_dict)


def load_onnx_state_dict(path) -> Dict[str, np.ndarray]:
    """Read a .onnx file and return {initializer_name: numpy array}.

    Shape/value constants that torch.onnx.export materialises for Resize /
    Reshape nodes (int64 scalars, 'onnx::' mangled names with no dot) are
    kept too — callers filter by matching against the flax tree.
    """
    model = onnx_proto.load_model(path)
    return {name: t.to_numpy() for name, t in model.graph.initializers.items()}


def _strip_wrapper_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torch.onnx.export on a wrapped module can prefix every initializer
    with the wrapper attribute (e.g. 'model.'); strip a uniform prefix."""
    keys = [k for k in sd if "." in k]
    if not keys:
        return dict(sd)
    first = keys[0].split(".", 1)[0]
    if all(k.split(".", 1)[0] == first for k in keys) and len(keys) > 1:
        # Only strip when the single shared root is a wrapper, i.e. the
        # remainder still contains dots (real module paths).
        if all("." in k.split(".", 1)[1] for k in keys):
            return {k.split(".", 1)[1] if "." in k else k: v
                    for k, v in sd.items()}
    return dict(sd)


def _drop_constants(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop exporter-materialised constants (Resize scales, Reshape shapes):
    anything integer-typed or with an 'onnx::'/'/'-mangled name."""
    out = {}
    for k, v in sd.items():
        if k.startswith("onnx::") or k.startswith("/") or "." not in k:
            continue
        if v.dtype.kind in "iub" and not k.endswith(
                ("running_mean", "running_var", "num_batches_tracked")):
            continue
        out[k] = v
    return out


def fold_missing_bn(variables: Mapping, imported: Mapping,
                    eps: float = 1e-5) -> Dict:
    """For every BN leaf still holding its random init (i.e. the ONNX file
    had no matching initializer because BN was folded), set identity values
    so apply() computes the folded graph's function."""
    params = flatten_params(imported.get("params", {}))
    stats = flatten_params(imported.get("batch_stats", {}))
    ref_params = flatten_params(variables.get("params", {}))
    ref_stats = flatten_params(variables.get("batch_stats", {}))

    for path in list(stats.keys()):
        if stats[path] is ref_stats.get(path):  # untouched by the import
            leaf = path.rsplit(".", 1)[-1]
            if leaf == "mean":
                stats[path] = jnp.zeros_like(stats[path])
            elif leaf == "var":
                stats[path] = jnp.full_like(stats[path], 1.0 - eps)
    for path in list(params.keys()):
        leaf = path.rsplit(".", 1)[-1]
        if leaf in ("scale", "bias") and params[path] is ref_params.get(path):
            mod = path.rsplit(".", 1)[0]
            if f"{mod}.mean" in stats or f"{mod}.var" in stats:
                params[path] = (jnp.ones_like(params[path]) if leaf == "scale"
                                else jnp.zeros_like(params[path]))
    out = {"params": unflatten_params(params)}
    if stats:
        out["batch_stats"] = unflatten_params(stats)
    return out


def import_onnx(variables: Mapping, path, prefix_map: Mapping[str, str] | None = None,
                strict: bool = True, dtype: Any = jnp.float32) -> Dict:
    """Fill flax ``variables`` from an ONNX file.

    Tries the named path strictly; if BN initializers are missing (a
    constant-folded export), retries non-strict and fills identity BN.
    Raises if conv/linear weights themselves cannot be matched.
    """
    sd = _drop_constants(_strip_wrapper_prefix(load_onnx_state_dict(path)))
    try:
        return import_state_dict(variables, sd, prefix_map=prefix_map,
                                  strict=strict, dtype=dtype)
    except KeyError as e:
        if "missing torch weights" not in str(e):
            raise
        imported = import_state_dict(variables, sd, prefix_map=prefix_map,
                                     strict=False, dtype=dtype)
        imported = fold_missing_bn(variables, imported)
        # Re-verify: after identity-BN fill, only BN leaves may differ from
        # the strict result; conv/linear leaves must all have been matched.
        missing_core = _unmatched_core_leaves(variables, imported)
        if strict and missing_core:
            raise KeyError(
                f"ONNX import could not match core weights: {missing_core[:10]}"
                f"{' ...' if len(missing_core) > 10 else ''}") from e
        return imported


def _unmatched_core_leaves(variables: Mapping, imported: Mapping) -> list:
    ref = flatten_params(variables.get("params", {}))
    got = flatten_params(imported.get("params", {}))
    out = []
    for path, v in ref.items():
        leaf = path.rsplit(".", 1)[-1]
        if leaf in ("w", "wt", "wl", "w1", "b") and got.get(path) is v:
            out.append(path)
    return out


# ---------------------------------------------------------------------------
# Export direction: write a parameter set as a real .onnx artifact (the
# interchange format the reference's C++ runtime consumes).  The graph
# carries named initializers exactly like torch.onnx.export(export_params=
# True, do_constant_folding=False) does, plus the reference exporter's
# graph I/O contract (input 'input' [batch,3,H,W] -> named outputs,
# convert_pytorch_to_onnx.py:144-155).
# ---------------------------------------------------------------------------

REFERENCE_IO = {
    # model name -> (input names/shapes, output names/shapes); 'batch_size'
    # is the symbolic batch dim the reference exporter declares.
    "SceneSeg": ((("input", ("batch_size", 3, 320, 640)),),
                 (("output", ("batch_size", 3, 320, 640)),)),
    "Scene3D": ((("input", ("batch_size", 3, 320, 640)),),
                (("output", ("batch_size", 1, 320, 640)),)),
    "DomainSeg": ((("input", ("batch_size", 3, 320, 640)),),
                  (("output", ("batch_size", 1, 320, 640)),)),
    "EgoLanes": ((("input", ("batch_size", 3, 320, 640)),),
                 (("output", ("batch_size", 3, 80, 160)),)),
}


def save_state_dict_as_onnx(state_dict: Mapping[str, np.ndarray], path,
                            model_name: str = "SceneSeg",
                            io: Tuple | None = None,
                            producer: str = "autoware_vision_pilot_tpu") -> None:
    """Serialize a torch-layout state_dict as an ONNX model file.

    Weights become graph initializers under their state_dict names (the
    same contract torch.onnx.export uses); graph I/O matches the reference
    exporter's shapes so downstream tooling sees the expected signature.
    """
    ins, outs = io if io is not None else REFERENCE_IO.get(
        model_name, ((("input", ("batch_size", 3, 320, 640)),),
                     (("output", ("batch_size", 3, 320, 640)),)))
    g = onnx_proto.Graph(name=f"{model_name}_graph")
    for k, v in state_dict.items():
        g.initializers[k] = onnx_proto.Tensor.from_numpy(k, np.asarray(v))
    for name, shape in ins:
        g.inputs.append(onnx_proto.ValueInfo(name=name, shape=list(shape)))
    for name, shape in outs:
        g.outputs.append(onnx_proto.ValueInfo(name=name, shape=list(shape)))
    # A structural node so every graph output is produced by a node (the
    # onnx checker's invariant); real execution happens via StableHLO on
    # TPU — this artifact is the *weights* interchange.
    g.nodes.append(onnx_proto.Node(
        op_type="Identity", name="weights_carrier",
        inputs=[ins[0][0]], outputs=[outs[0][0]]))
    m = onnx_proto.Model(producer_name=producer, producer_version="1.0",
                         graph=g)
    onnx_proto.save_model(m, path)
