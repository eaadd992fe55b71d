"""Thin inference wrappers per model — the Models/inference/*_infer.py
equivalents (scene_seg_infer.py:38-57 etc.): load checkpoint -> eval ->
normalize -> forward -> task-specific postprocess to numpy.

Each wrapper owns one jitted program; heavy postprocess (argmax, NMS)
stays inside the program.
"""
from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from ..ops.preprocess import preprocess_imagenet, letterbox
from ..ops.postprocess import (
    argmax_mask, threshold_channels, depth_minmax_scale, nms_fixed,
    decode_yolo_to_original)
from ..export.checkpoints import load_msgpack


class _Base:
    def __init__(self, model, variables=None, checkpoint: str = "",
                 input_hw=(320, 640), dtype=jnp.float32,
                 precision: str = "float", int8_min_channels: int = 128,
                 int8_calibration=None):
        """precision: 'float' keeps the weights as-is; 'int8' applies
        the selective int8 MXU path (convs with >= int8_min_channels
        input channels; +24% streaming FPS measured vs bf16 on v5e —
        BENCH_NOTES "Round 2: int8 end-to-end"). int8_calibration:
        optional iterable of preprocessed (1,H,W,3) batches for static
        activation scales (defaults to 4 random batches — pass real
        frames for deployment-grade scales, or use train/qat.py)."""
        self.model = model
        self.input_hw = input_hw
        self.dtype = dtype
        if variables is None:
            variables = model.init(
                jax.random.key(0), jnp.zeros((1, *input_hw, 3), dtype))
            if checkpoint:
                variables = load_msgpack(checkpoint, variables)
        if precision == "int8":
            from ..export.quantize import (
                quantize_variables_for_int8_conv,
                calibrate_int8_activation_scales)
            variables = quantize_variables_for_int8_conv(
                variables, min_channels=int8_min_channels)
            if int8_calibration is None:
                rng = np.random.default_rng(7)
                int8_calibration = [
                    jnp.asarray(rng.normal(0, 1, (1, *input_hw, 3)), dtype)
                    for _ in range(4)]
            variables = calibrate_int8_activation_scales(
                model, variables, int8_calibration)
        self.variables = variables


class SceneSegInfer(_Base):
    def __init__(self, **kw):
        from ..models.scene_seg import SceneSegNetwork
        kw.setdefault("model", SceneSegNetwork(
            dtype=kw.get("dtype", jnp.float32),
            param_dtype=kw.get("dtype", jnp.float32)))
        super().__init__(**kw)

        def fwd(frame):
            x = preprocess_imagenet(frame[None], self.input_hw,
                                    dtype=self.dtype)
            logits = self.model.apply(self.variables, x)
            return argmax_mask(logits.astype(jnp.float32))[0]

        self._fwd = jax.jit(fwd)

    def inference(self, frame_bgr_u8: np.ndarray) -> np.ndarray:
        """-> (H, W) int32 class ids (0 bg / 1 fg / 2 road)."""
        return np.asarray(self._fwd(jnp.asarray(frame_bgr_u8)))


class Scene3DInfer(_Base):
    def __init__(self, **kw):
        from ..models.scene_3d import Scene3DNetwork
        kw.setdefault("model", Scene3DNetwork(
            dtype=kw.get("dtype", jnp.float32),
            param_dtype=kw.get("dtype", jnp.float32)))
        super().__init__(**kw)

        def fwd(frame):
            x = preprocess_imagenet(frame[None], self.input_hw,
                                    dtype=self.dtype)
            d = self.model.apply(self.variables, x).astype(jnp.float32)
            return depth_minmax_scale(d)[0, ..., 0]

        self._fwd = jax.jit(fwd)

    def inference(self, frame_bgr_u8: np.ndarray) -> np.ndarray:
        """-> (H, W) float32 relative depth in [0, 1]."""
        return np.asarray(self._fwd(jnp.asarray(frame_bgr_u8)))


class DomainSegInfer(_Base):
    def __init__(self, threshold: float = 0.0, **kw):
        from ..models.domain_seg import DomainSegNetwork
        kw.setdefault("model", DomainSegNetwork(
            dtype=kw.get("dtype", jnp.float32),
            param_dtype=kw.get("dtype", jnp.float32)))
        super().__init__(**kw)
        self.threshold = threshold

        def fwd(frame):
            x = preprocess_imagenet(frame[None], self.input_hw,
                                    dtype=self.dtype)
            logits = self.model.apply(self.variables, x).astype(jnp.float32)
            return (logits[0, ..., 0] > self.threshold)

        self._fwd = jax.jit(fwd)

    def inference(self, frame_bgr_u8: np.ndarray) -> np.ndarray:
        """-> (H, W) bool roadwork mask."""
        return np.asarray(self._fwd(jnp.asarray(frame_bgr_u8)))


class EgoLanesInfer(_Base):
    def __init__(self, threshold: float = 0.0, **kw):
        from ..models.ego_lanes import EgoLanesNetwork
        kw.setdefault("model", EgoLanesNetwork(
            dtype=kw.get("dtype", jnp.float32),
            param_dtype=kw.get("dtype", jnp.float32)))
        super().__init__(**kw)
        self.threshold = threshold

        def fwd(frame):
            x = preprocess_imagenet(frame[None], self.input_hw,
                                    dtype=self.dtype)
            logits = self.model.apply(self.variables, x).astype(jnp.float32)
            return logits[0], threshold_channels(logits, self.threshold)[0]

        self._fwd = jax.jit(fwd)

    def inference(self, frame_bgr_u8: np.ndarray) -> np.ndarray:
        """-> (H/4, W/4, 3) float binary masks [ego_left, ego_right, other]."""
        return np.asarray(self._fwd(jnp.asarray(frame_bgr_u8))[1])

    def inference_raw(self, frame_bgr_u8: np.ndarray) -> np.ndarray:
        """-> (H/4, W/4, 3) RAW pre-threshold logits — the tensor the
        temporal AutoSteer consumes (main.cpp:516-524 copies
        getRawTensorData(), NOT the thresholded masks)."""
        return np.asarray(self._fwd(jnp.asarray(frame_bgr_u8))[0])


class AutoSpeedInfer:
    def __init__(self, variables=None, checkpoint: str = "",
                 frame_hw=(720, 1280), input_hw=(640, 640),
                 conf_thresh: float = 0.25, iou_thresh: float = 0.45,
                 dtype=jnp.float32):
        from ..models.auto_speed import AutoSpeedNetwork
        self.model = AutoSpeedNetwork(variant="n", num_classes=4,
                                      img_h=input_hw[0], img_w=input_hw[1],
                                      dtype=dtype, param_dtype=dtype)
        if variables is None:
            variables = self.model.init(
                jax.random.key(0), jnp.zeros((1, *input_hw, 3), dtype))
            if checkpoint:
                variables = load_msgpack(checkpoint, variables)
        self.variables = variables

        def fwd(frame):
            x, scale, pad = letterbox(frame[None], input_hw, frame_hw,
                                      dtype=dtype)
            pred = self.model.apply(self.variables, x)[0].astype(jnp.float32)
            boxes, scores, cls = decode_yolo_to_original(
                pred, scale, pad, frame_hw)
            return nms_fixed(boxes, scores, cls, conf_thresh=conf_thresh,
                             iou_thresh=iou_thresh)

        self._fwd = jax.jit(fwd)

    def inference(self, frame_bgr_u8: np.ndarray) -> np.ndarray:
        """-> (N, 6) [x1, y1, x2, y2, score, class] in original pixels."""
        boxes, scores, cls, valid = self._fwd(jnp.asarray(frame_bgr_u8))
        v = np.asarray(valid)
        return np.concatenate([
            np.asarray(boxes)[v], np.asarray(scores)[v, None],
            np.asarray(cls)[v, None].astype(np.float32)], axis=1)


class AutoSteerInfer:
    """Temporal steering classifier over two RAW EgoLanes logit tensors.

    The reference feeds the raw pre-threshold EgoLanes output tensors of
    frames t-1 and t (main.cpp:516-524 copies `getRawTensorData()`, NOT the
    thresholded masks) — pass logits here, never binarized masks.
    """

    def __init__(self, variables=None, checkpoint: str = "",
                 dtype=jnp.float32):
        from ..models.auto_steer_temporal import (
            AutoSteerTemporalNet, steering_from_logits)
        self.model = AutoSteerTemporalNet(dtype=dtype, param_dtype=dtype)
        if variables is None:
            variables = self.model.init(
                jax.random.key(0), jnp.zeros((1, 80, 160, 6), dtype))
            if checkpoint:
                variables = load_msgpack(checkpoint, variables)
        self.variables = variables

        def fwd(stacked):
            _, curr = self.model.apply(self.variables, stacked[None])
            return steering_from_logits(curr.astype(jnp.float32))[0]

        self._fwd = jax.jit(fwd)

    def inference(self, prev_logits: np.ndarray,
                  curr_logits: np.ndarray) -> float:
        """logits: (80, 160, 3) raw EgoLanes tensors (pre-threshold),
        frames t-1 and t -> steering angle in degrees."""
        stacked = jnp.asarray(
            np.concatenate([prev_logits, curr_logits], axis=-1),
            jnp.float32)
        return float(self._fwd(stacked))
