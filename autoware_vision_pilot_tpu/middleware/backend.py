"""Generic inference backend interface for middleware nodes.

Mirror of the reference's common layer
(middleware_recipes/common/include/inference_backend_base.hpp:14-27):
`do_inference(image) -> raw tensor`, `get_tensor_shape()`. The concrete
backend here wraps a jitted JAX forward; providers 'tpu'/'cpu' replace the
reference's onnxruntime/tensorrt switch (run_model_node.cpp:25-61).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.preprocess import preprocess_imagenet


class InferenceBackend:
    """Abstract: subclasses implement do_inference()."""

    def do_inference(self, image_bgr_u8: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def get_tensor_shape(self) -> Tuple[int, ...]:
        raise NotImplementedError


class JaxInferenceBackend(InferenceBackend):
    """Wraps a flax model apply into the backend interface.

    model_type: 'segmentation' | 'depth' | 'egolanes' (the run_model.cpp
    model_type switch) — selects pre/post conventions.
    """

    def __init__(self, model, variables, input_hw=(320, 640),
                 model_type: str = "segmentation", dtype=jnp.bfloat16):
        self.input_hw = input_hw
        self.model_type = model_type

        def fwd(frame):
            x = preprocess_imagenet(frame[None], input_hw, dtype=dtype)
            return model.apply(variables, x).astype(jnp.float32)[0]

        self._fwd = jax.jit(fwd)
        self._shape: Optional[Tuple[int, ...]] = None

    def do_inference(self, image_bgr_u8: np.ndarray) -> np.ndarray:
        out = np.asarray(self._fwd(jnp.asarray(image_bgr_u8)))
        self._shape = out.shape
        return out

    def get_tensor_shape(self) -> Tuple[int, ...]:
        if self._shape is None:
            raise RuntimeError("run do_inference first")
        return self._shape


def backend_from_params(p: dict) -> "JaxInferenceBackend":
    """Build a backend from an autoseg.yaml-style parameter dict
    (model_path / model_type / precision keys; run_model_node.cpp:29-61
    parameter contract). model_path points at a msgpack checkpoint whose
    stem selects the network family ('scene_seg', 'scene_3d',
    'domain_seg', 'ego_lanes'); a missing/empty path gives random init."""
    import pathlib
    from ..models import (SceneSegNetwork, Scene3DNetwork,
                          DomainSegNetwork, EgoLanesNetwork)

    families = {"scene_seg": SceneSegNetwork, "scene_3d": Scene3DNetwork,
                "domain_seg": DomainSegNetwork,
                "ego_lanes": EgoLanesNetwork}
    path = p.get("model_path", "")
    stem = pathlib.Path(path).stem.lower() if path else ""
    cls = next((c for k, c in families.items() if k in stem),
               None)
    if cls is None:
        cls = {"segmentation": SceneSegNetwork, "depth": Scene3DNetwork,
               "egolanes": EgoLanesNetwork}.get(
            p.get("model_type", "segmentation"), SceneSegNetwork)
    dtype = jnp.bfloat16 if p.get("precision", "fp16") in (
        "fp16", "bf16") else jnp.float32
    model = cls(dtype=dtype, param_dtype=dtype)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 320, 640, 3), dtype))
    if path and pathlib.Path(path).exists():
        from ..export.checkpoints import load_msgpack
        variables = load_msgpack(path, variables)
    return JaxInferenceBackend(model, variables,
                               model_type=p.get("model_type",
                                                "segmentation"),
                               dtype=dtype)
