"""Load reference PyTorch modules from /root/reference for parity testing.

The parity suite never copies reference code: it imports the reference's
own torch modules at test time, runs them with seeded random weights, and
compares against our JAX implementations through the weight converter.
"""
from __future__ import annotations

import importlib.util
import pathlib
import sys

REF = pathlib.Path("/root/reference")
MC = REF / "Models" / "model_components"

_cache = {}


def load_standalone(name: str):
    """Import a reference file that has no package-relative imports."""
    if name in _cache:
        return _cache[name]
    path = MC / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _cache[name] = mod
    return mod


def enable_package_imports():
    """Make `import Models.model_components.x` resolve into /root/reference
    via implicit namespace packages (PEP 420)."""
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))


def load_packaged(dotted: str):
    """Import e.g. 'Models.model_components.auto_speed.auto_speed_network'."""
    enable_package_imports()
    import importlib
    return importlib.import_module(dotted)


def state_dict_numpy(torch_module):
    return {k: v.detach().cpu().numpy()
            for k, v in torch_module.state_dict().items()}
