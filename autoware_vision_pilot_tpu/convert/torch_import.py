"""Generic PyTorch state_dict -> flax variables importer.

The reference ships PyTorch checkpoints (Models/exports/convert_pytorch_to_onnx.py
loads `state_dict` blobs); this module maps them onto our flax parameter
trees without any per-model table. Conventions that make this possible:

1. Our flax modules mirror the reference's torch attribute names, so the
   torch key path equals the flax path after one rewrite: an all-digit path
   component (torch Sequential/ModuleList index) merges into its parent,
   e.g. ``res_m.0.conv1`` -> ``res_m_0.conv1``.
2. Leaf transforms are keyed by the *flax* leaf name:
   - ``w``  (conv kernel):            torch OIHW -> HWIO  (2,3,1,0)
   - ``wt`` (conv-transpose kernel):  torch IOHW -> HWOI  (2,3,1,0)
   - ``wl`` (linear kernel):          torch (out,in) -> (in,out)
   - BatchNorm: weight->scale, bias->bias, running_mean->mean,
     running_var->var (batch_stats collection); num_batches_tracked dropped.

Weights arrive as numpy arrays (callers do `{k: v.numpy() for ...}` on a
torch state_dict) so this module has no torch dependency.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def flatten_params(tree: Mapping, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten_params(v, path))
        else:
            out[path] = v
    return out


def unflatten_params(flat: Mapping[str, Any]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _merge_digit_components(key: str) -> str:
    """torch 'res_m.0.conv1.weight' -> 'res_m_0.conv1.weight'."""
    parts = key.split(".")
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return ".".join(merged)


# torch leaf name -> (flax leaf name, is_batch_stat)
_BN_MAP = {
    "running_mean": ("mean", True),
    "running_var": ("var", True),
}


def import_state_dict(
    variables: Mapping,
    state_dict: Mapping[str, np.ndarray],
    prefix_map: Mapping[str, str] | None = None,
    strict: bool = True,
    dtype: Any = jnp.float32,
) -> Dict:
    """Fill a flax variables dict ({'params': ..., 'batch_stats': ...})
    from a torch state_dict (values must be numpy arrays).

    prefix_map: optional torch-prefix -> flax-prefix rewrites applied first
    (longest match wins), e.g. {'net.': 'backbone.'}.
    """
    params_flat = flatten_params(variables.get("params", {}))
    stats_flat = flatten_params(variables.get("batch_stats", {}))

    new_params = dict(params_flat)
    new_stats = dict(stats_flat)
    used = set()
    missing = []

    def rewrite(key: str) -> str:
        if prefix_map:
            for src in sorted(prefix_map, key=len, reverse=True):
                if key.startswith(src):
                    key = prefix_map[src] + key[len(src):]
                    break
        return _merge_digit_components(key)

    # Build an index of torch keys after rewriting.
    torch_by_path = {rewrite(k): k for k in state_dict}

    def take(torch_path: str):
        tk = torch_by_path.get(torch_path)
        if tk is None:
            return None
        used.add(tk)
        return np.asarray(state_dict[tk])

    for fpath in params_flat:
        mod_path, leaf = fpath.rsplit(".", 1) if "." in fpath else ("", fpath)
        target_shape = params_flat[fpath].shape

        if leaf in ("w", "wt"):
            v = take(f"{mod_path}.weight" if mod_path else "weight")
            if v is None:
                missing.append(fpath)
                continue
            v = v.transpose(2, 3, 1, 0)
        elif leaf == "wl":
            v = take(f"{mod_path}.weight" if mod_path else "weight")
            if v is None:
                missing.append(fpath)
                continue
            v = v.transpose(1, 0)
        elif leaf == "w1":  # Conv1d kernel: torch (O,I,K) -> (K,I,O)
            v = take(f"{mod_path}.weight" if mod_path else "weight")
            if v is None:
                missing.append(fpath)
                continue
            v = v.transpose(2, 1, 0)
        elif leaf == "b":
            v = take(f"{mod_path}.bias" if mod_path else "bias")
            if v is None:
                missing.append(fpath)
                continue
        elif leaf == "scale":  # BatchNorm weight (module may be wrapped as '.bn')
            tmod = mod_path[:-3] if mod_path.endswith(".bn") else mod_path
            v = take(f"{tmod}.weight" if tmod else "weight")
            if v is None:
                missing.append(fpath)
                continue
        elif leaf == "bias":
            tmod = mod_path[:-3] if mod_path.endswith(".bn") else mod_path
            v = take(f"{tmod}.bias" if tmod else "bias")
            if v is None:
                missing.append(fpath)
                continue
        else:
            missing.append(fpath)
            continue

        if v.shape != target_shape:
            raise ValueError(
                f"shape mismatch at {fpath}: torch {v.shape} vs flax {target_shape}")
        new_params[fpath] = jnp.asarray(v, dtype=dtype)

    for fpath in stats_flat:
        mod_path, leaf = fpath.rsplit(".", 1) if "." in fpath else ("", fpath)
        tmod = mod_path[:-3] if mod_path.endswith(".bn") else mod_path
        torch_leaf = "running_mean" if leaf == "mean" else "running_var"
        v = take(f"{tmod}.{torch_leaf}" if tmod else torch_leaf)
        if v is None:
            missing.append(fpath)
            continue
        if v.shape != stats_flat[fpath].shape:
            raise ValueError(
                f"shape mismatch at {fpath}: torch {v.shape} vs flax "
                f"{stats_flat[fpath].shape}")
        new_stats[fpath] = jnp.asarray(v, dtype=dtype)

    if strict:
        if missing:
            raise KeyError(f"missing torch weights for: {missing[:10]}"
                           f"{' ...' if len(missing) > 10 else ''}")
        unused = [k for k in state_dict
                  if k not in used and not k.endswith("num_batches_tracked")
                  and "anchors" not in k and "strides" not in k]
        if unused:
            raise KeyError(f"unused torch weights: {unused[:10]}"
                           f"{' ...' if len(unused) > 10 else ''}")

    out = {"params": unflatten_params(new_params)}
    if new_stats:
        out["batch_stats"] = unflatten_params(new_stats)
    return out
