"""Middleware nodes over pluggable transports.

Node/topic contract mirrors the ROS2 recipe
(middleware_recipes/ROS2/models/src/run_model_node.cpp:25-190,
run_autospeed_node.cpp:16-110, video_publisher_node, visualize_masks_node;
launch wiring run_pipeline.launch.py:11-80):

  VideoPublisherNode   -> publishes frames on `image_topic`
  RunModelNode         -> subscribes image_topic, runs a backend, publishes
                          seg mask (uint8 ids) or depth (float32) on
                          `output_topic`
  RunAutoSpeedNode     -> publishes detections (N,6 array) on output_topic
  MasksVisualizationNode -> subscribes image+mask, publishes blended overlay

Messages are plain numpy arrays over InProcTransport; byte codecs wrap
them for network transports.
"""
from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .backend import InferenceBackend
from .transport import Transport
from ..ops.postprocess import nms_fixed, decode_yolo_to_original
from ..ops.preprocess import letterbox
from ..runtime.timers import FpsTimer


class RunModelNode:
    """Generic model node (segmentation / depth / egolanes)."""

    def __init__(self, transport: Transport, backend: InferenceBackend,
                 image_topic: str = "/image_raw",
                 output_topic: str = "/model/output",
                 model_type: str = "segmentation",
                 benchmark: bool = False):
        self.transport = transport
        self.backend = backend
        self.output_topic = output_topic
        self.model_type = model_type
        self.timer = FpsTimer(name=output_topic) if benchmark else None
        transport.subscribe(image_topic, self.on_image)

    def on_image(self, frame_bgr_u8: np.ndarray):
        if self.timer:
            self.timer.start_new_frame()
            self.timer.record_preprocess_end()
        out = self.backend.do_inference(frame_bgr_u8)
        if self.timer:
            self.timer.record_inference_end()
        if self.model_type == "depth":
            msg = out[..., 0].astype(np.float32)       # 32FC1 analog
        elif self.model_type == "egolanes":
            msg = (out > 0.0).astype(np.uint8)          # 3ch binary masks
        else:
            msg = np.argmax(out, -1).astype(np.uint8)   # MONO8 class ids
        self.transport.publish(self.output_topic, msg)
        if self.timer:
            self.timer.record_output_end()


class RunAutoSpeedNode:
    """Detection node: letterbox -> AutoSpeed -> on-device NMS ->
    (N,6) [x1,y1,x2,y2,score,class] float array (the Detection2DArray
    analog)."""

    def __init__(self, transport: Transport, model, variables,
                 image_topic: str = "/image_raw",
                 output_topic: str = "/autospeed/detections",
                 frame_hw: Tuple[int, int] = (720, 1280),
                 input_hw: Tuple[int, int] = (640, 640),
                 conf_thresh: float = 0.5, iou_thresh: float = 0.5,
                 dtype=jnp.bfloat16):
        self.transport = transport
        self.output_topic = output_topic

        def step(frame):
            x, scale, pad = letterbox(frame[None], input_hw, frame_hw,
                                      dtype=dtype)
            pred = model.apply(variables, x)[0].astype(jnp.float32)
            boxes, scores, cls = decode_yolo_to_original(
                pred, scale, pad, frame_hw)
            return nms_fixed(boxes, scores, cls, conf_thresh=conf_thresh,
                             iou_thresh=iou_thresh)

        self._step = jax.jit(step)
        transport.subscribe(image_topic, self.on_image)

    def on_image(self, frame_bgr_u8: np.ndarray):
        boxes, scores, cls, valid = self._step(jnp.asarray(frame_bgr_u8))
        v = np.asarray(valid)
        dets = np.concatenate([
            np.asarray(boxes)[v],
            np.asarray(scores)[v, None],
            np.asarray(cls)[v, None].astype(np.float32)], axis=1)
        self.transport.publish(self.output_topic, dets)


class VideoPublisherNode:
    """Source node: video file / camera -> image topic at a target rate
    (video_publisher_node + GStreamerEngine role)."""

    def __init__(self, transport: Transport, capture,
                 image_topic: str = "/image_raw", fps: float = 0.0):
        self.transport = transport
        self.capture = capture
        self.image_topic = image_topic
        self.dt = 1.0 / fps if fps else 0.0

    def spin(self, max_frames: Optional[int] = None) -> int:
        n = 0
        while max_frames is None or n < max_frames:
            t0 = time.perf_counter()
            ok, frame = self.capture.read()
            if not ok:
                break
            self.transport.publish(self.image_topic, frame)
            n += 1
            if self.dt:
                sleep = self.dt - (time.perf_counter() - t0)
                if sleep > 0:
                    time.sleep(sleep)
        return n


class MasksVisualizationNode:
    """Colorize + 50/50 blend (masks_visualization_engine.cpp:11-58)."""

    PALETTES = {
        "scene": np.array([[0, 0, 0], [0, 0, 255], [0, 0, 0]], np.uint8),
        "domain": np.array([[0, 0, 0], [0, 165, 255]], np.uint8),
        "egolanes": np.array([[0, 0, 0], [255, 0, 0], [0, 0, 255],
                              [0, 255, 0]], np.uint8),
    }

    def __init__(self, transport: Transport,
                 image_topic: str = "/image_raw",
                 mask_topic: str = "/model/output",
                 output_topic: str = "/viz/overlay",
                 palette: str = "scene"):
        import cv2
        self.cv2 = cv2
        self.transport = transport
        self.output_topic = output_topic
        self.palette = self.PALETTES[palette]
        self._last_image = None
        transport.subscribe(image_topic, self._on_image)
        transport.subscribe(mask_topic, self._on_mask)

    def _on_image(self, frame):
        self._last_image = frame

    def _on_mask(self, mask):
        if self._last_image is None:
            return
        img = self._last_image
        if mask.ndim == 3:  # egolanes channels -> single id map
            ids = np.zeros(mask.shape[:2], np.uint8)
            for c in range(mask.shape[-1]):
                ids[mask[..., c] > 0] = c + 1
            mask = ids
        color = self.palette[np.clip(mask, 0, len(self.palette) - 1)]
        color = self.cv2.resize(color, (img.shape[1], img.shape[0]),
                                interpolation=self.cv2.INTER_NEAREST)
        overlay = self.cv2.addWeighted(img, 0.5, color, 0.5, 0)
        self.transport.publish(self.output_topic, overlay)
