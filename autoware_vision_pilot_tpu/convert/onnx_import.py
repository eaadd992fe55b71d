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


def load_onnx_state_dict(path, recover: bool = False) -> Dict[str, np.ndarray]:
    """Read a .onnx file and return {initializer_name: numpy array}.

    Shape/value constants that torch.onnx.export materialises for Resize /
    Reshape nodes (int64 scalars, 'onnx::' mangled names with no dot) are
    kept too — callers filter by matching against the flax tree.

    With ``recover=True``, mangled initializer names (the eval-peephole
    Conv+BN fusion renames fused weights to ``onnx::Conv_<idx>``) are
    rewritten back to state_dict-style keys via graph topology — see
    :func:`recover_mangled_names`.
    """
    model = onnx_proto.load_model(path)
    sd = {name: t.to_numpy() for name, t in model.graph.initializers.items()}
    return recover_mangled_names(model, sd) if recover else sd


# Ops whose inputs carry learned parameters: input index -> state_dict leaf.
_WEIGHTED_OPS = {
    "Conv": {1: "weight", 2: "bias"},
    "ConvTranspose": {1: "weight", 2: "bias"},
    "Gemm": {1: "weight", 2: "bias"},
    "MatMul": {1: "weight"},
    "BatchNormalization": {1: "weight", 2: "bias", 3: "running_mean",
                           4: "running_var"},
}


def _is_mangled(name: str) -> bool:
    """True for exporter-generated initializer names that no longer look
    like torch state_dict keys ('onnx::Conv_347', '/head/conv/Conv_output_0',
    bare value-index numbers)."""
    if name.startswith("onnx::") or name.startswith("/"):
        return True
    return "." not in name and name not in ("weight", "bias")


def _qual_from_node_name(name: str) -> "str | None":
    """Derive the torch module path from a TS-exporter node name.

    Node names carry the module scope chain, one component per level,
    where Sequential/ModuleList scopes repeat their parent-qualified form:
    '/Backbone/encoder/encoder.0/encoder.0.0/Conv' -> 'Backbone.encoder.0.0'.
    Returns None when the name has no scope structure to use.
    """
    if not name or not name.startswith("/"):
        return None
    comps = [c for c in name.split("/") if c]
    if not comps:
        return None
    comps = comps[:-1]  # the last component is the op label ('Conv', 'Gemm_3')
    qual = ""
    prev = ""
    for c in comps:
        if prev and c.startswith(prev + "."):
            # nested Sequential scope: 'encoder' -> 'encoder.0' replaces it
            qual = qual[: len(qual) - len(prev)] + c
        else:
            qual = f"{qual}.{c}" if qual else c
        prev = c
    return qual


def recover_mangled_names(model, sd: Mapping[str, np.ndarray]
                          ) -> Dict[str, np.ndarray]:
    """Rename constant-folded initializers back to state_dict-style keys.

    torch.onnx.export with do_constant_folding=True runs the eval peephole
    pass that fuses BatchNorm into the preceding Conv and names the fused
    weight/bias 'onnx::Conv_<value idx>' (the failure mode of the
    reference's own exports, Models/exports/convert_pytorch_to_onnx.py:45-97
    with do_constant_folding=True).  The Conv NODES keep their module-scope
    names, so walking the weighted ops in graph order recovers the torch
    key for every mangled parameter: node '/Backbone/encoder/encoder.0/
    encoder.0.0/Conv' input[1] 'onnx::Conv_347' -> 'Backbone.encoder.0.0.weight'.
    """
    out = dict(sd)
    for node in model.graph.nodes:
        leaves = _WEIGHTED_OPS.get(node.op_type)
        if leaves is None:
            continue
        qual = _qual_from_node_name(node.name)
        if qual is None:
            continue
        for idx, leaf in leaves.items():
            if idx >= len(node.inputs):
                continue
            iname = node.inputs[idx]
            if iname not in out or not _is_mangled(iname):
                continue
            key = f"{qual}.{leaf}" if qual else leaf
            if key in out:
                continue
            v = out.pop(iname)
            if leaf == "weight":
                if node.op_type == "MatMul" and v.ndim == 2:
                    v = v.T  # MatMul B is (in,out); state_dict is (out,in)
                elif (node.op_type == "Gemm" and v.ndim == 2
                      and not node.attr("transB", 0)):
                    v = v.T  # pre-transposed Gemm B
            out[key] = v
    return out


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


def _route_folded_biases(variables: Mapping, imported: Mapping,
                         sd: Mapping[str, np.ndarray],
                         dtype: Any = jnp.float32) -> Dict:
    """Give folded conv biases a home when the flax conv has none.

    Conv+BN fusion grafts a bias onto convs that were bias-free in the
    original module; our flax mirrors keep those convs bias-free too (the
    BN sibling holds the affine).  Identity-BN fill makes BN(x) = x + bias,
    so the folded bias lands exactly in the sibling BN's bias leaf
    (torch Sequential convention: BN index = conv index + 1)."""
    from .torch_import import _merge_digit_components
    params = flatten_params(imported.get("params", {}))
    ref = flatten_params(variables.get("params", {}))
    for k, v in sd.items():
        if not k.endswith(".bias"):
            continue
        mod = k[: -len(".bias")]
        fmod = _merge_digit_components(mod)
        if f"{fmod}.b" in ref or f"{fmod}.bias" in ref:
            continue  # the named path already placed it
        parts = mod.split(".")
        if not parts[-1].isdigit():
            continue
        sib = ".".join(parts[:-1] + [str(int(parts[-1]) + 1)])
        fsib = _merge_digit_components(sib)
        for tgt in (f"{fsib}.bias", f"{fsib}.bn.bias"):
            if tgt in ref and ref[tgt].shape == np.asarray(v).shape:
                params[tgt] = jnp.asarray(v, dtype=dtype)
                break
    out = {"params": unflatten_params(params)}
    if "batch_stats" in imported:
        out["batch_stats"] = imported["batch_stats"]
    return out


def import_onnx(variables: Mapping, path, prefix_map: Mapping[str, str] | None = None,
                strict: bool = True, dtype: Any = jnp.float32) -> Dict:
    """Fill flax ``variables`` from an ONNX file.

    Tries the named path strictly; if BN initializers are missing (a
    constant-folded export), retries non-strict, routes folded conv biases
    into their sibling BN, and fills identity BN.
    Raises if conv/linear weights themselves cannot be matched.

    The initializer names are tried as-is first; stripping a uniform root
    component (torch.onnx.export on a wrapped module prefixes everything
    with the wrapper attribute) is a FALLBACK, never a default — a genuine
    shared module root like 'features.' must not be stripped.
    """
    sd_raw = _drop_constants(load_onnx_state_dict(path, recover=True))
    candidates = [sd_raw]
    stripped = _strip_wrapper_prefix(sd_raw)
    if set(stripped) != set(sd_raw):
        candidates.append(stripped)

    def _attempt(sd):
        try:
            return import_state_dict(variables, sd, prefix_map=prefix_map,
                                     strict=strict, dtype=dtype)
        except KeyError as e:
            if "missing torch weights" not in str(e):
                raise
            imported = import_state_dict(variables, sd, prefix_map=prefix_map,
                                         strict=False, dtype=dtype)
            imported = _route_folded_biases(variables, imported, sd,
                                            dtype=dtype)
            imported = fold_missing_bn(variables, imported)
            # Re-verify: after identity-BN fill, only BN leaves may differ
            # from the strict result; conv/linear weights must all match.
            missing_core = _unmatched_core_leaves(variables, imported)
            if strict and missing_core:
                raise KeyError(
                    f"ONNX import could not match core weights: "
                    f"{missing_core[:10]}"
                    f"{' ...' if len(missing_core) > 10 else ''}") from e
            return imported

    last_err = None
    for sd in candidates:
        try:
            return _attempt(sd)
        except (KeyError, ValueError) as e:
            last_err = e
    raise last_err


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
