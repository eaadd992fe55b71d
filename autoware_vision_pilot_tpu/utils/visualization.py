"""Visualization: mask overlays, lane polynomial draws, detection boxes,
depth colormaps, HUD text.

Host-side cv2 equivalents of production_release/src/visualization/
{visualize.cpp,visualize_long.cpp} and middleware_recipes/common/
visualizers/*: per-task colormaps (scene FG red, egolanes 3 colors,
domain orange), 50/50 blends, tracked-object boxes with CIPO highlight,
FCW/AEB banners. Heavy per-pixel colorize runs on device via
ops.postprocess.colorize_mask; these helpers handle the final BGR frame
composition.
"""
from __future__ import annotations


import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# scene seg: class 0 background (transparent-ish), 1 foreground red,
# 2 road (reference uses red FG only in masks_visualization_engine.cpp:40-58)
SCENE_SEG_PALETTE = np.array([
    [0, 0, 0],        # background
    [0, 0, 255],      # foreground objects (BGR red)
    [220, 255, 0],    # road (BGR cyan-ish as the unified GT road color)
], np.uint8)

EGO_LANES_COLORS = (
    (255, 0, 0),      # ego left — blue (BGR)
    (0, 0, 255),      # ego right — red
    (0, 255, 0),      # other lanes — green
)

DOMAIN_COLOR = (0, 165, 255)  # roadwork orange


def blend(image_bgr: np.ndarray, overlay_bgr: np.ndarray,
          alpha: float = 0.5) -> np.ndarray:
    return cv2.addWeighted(image_bgr, 1 - alpha, overlay_bgr, alpha, 0)


def draw_lane_masks(frame_bgr: np.ndarray, lane_masks: np.ndarray,
                    crop_y: int = 0) -> np.ndarray:
    """Overlay thresholded EgoLanes masks (h, w, 3 float 0/1) onto the
    frame (resized to the cropped region)."""
    out = frame_bgr.copy()
    region = out[crop_y:]
    h, w = region.shape[:2]
    for c, color in enumerate(EGO_LANES_COLORS):
        m = cv2.resize(lane_masks[..., c], (w, h),
                       interpolation=cv2.INTER_NEAREST) > 0.5
        region[m] = (np.asarray(color) * 0.5 +
                     region[m] * 0.5).astype(np.uint8)
    return out


def draw_polyfit_lanes(frame_bgr: np.ndarray, coeffs6, color=(255, 200, 0),
                       crop_y: int = 0, model_hw=(80, 160),
                       thickness: int = 3) -> np.ndarray:
    """Draw a model-space quadratic x=f(y) onto the full frame."""
    c = np.asarray(coeffs6, np.float64)
    h, w = frame_bgr.shape[:2]
    sx = w / model_hw[1]
    sy = (h - crop_y) / model_hw[0]
    pts = []
    y0, y1 = c[4], c[5]
    if y1 <= y0:
        return frame_bgr
    for y in np.linspace(y0, y1, 24):
        x = c[1] * y * y + c[2] * y + c[3]
        pts.append((int(x * sx), int(y * sy) + crop_y))
    for a, b in zip(pts[:-1], pts[1:]):
        cv2.line(frame_bgr, a, b, color, thickness)
    return frame_bgr


def draw_detections(frame_bgr: np.ndarray, tracked_objects,
                    cipo_track_id: int = -1) -> np.ndarray:
    """Tracked-object boxes with CIPO highlight (visualize_long.cpp)."""
    for obj in tracked_objects:
        x, y, w, h = obj.bbox
        is_cipo = obj.track_id == cipo_track_id
        color = (0, 0, 255) if is_cipo else (0, 255, 0)
        cv2.rectangle(frame_bgr, (x, y), (x + w, y + h), color,
                      3 if is_cipo else 2)
        label = (f"#{obj.track_id} L{obj.class_id} "
                 f"{obj.distance_m:.1f}m {obj.velocity_ms:+.1f}m/s")
        cv2.putText(frame_bgr, label, (x, max(y - 6, 12)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return frame_bgr


def draw_hud(frame_bgr: np.ndarray, steering_deg: float = 0.0,
             set_speed: float = 0.0, fps: float = 0.0,
             fcw: bool = False, aeb: bool = False,
             cut_in: bool = False,
             lane_departure: bool = False) -> np.ndarray:
    """Status text + FCW/AEB banners (main.cpp:905-974)."""
    h, w = frame_bgr.shape[:2]
    cv2.putText(frame_bgr,
                f"steer {steering_deg:+.1f}deg  v_set {set_speed:.1f}m/s  "
                f"{fps:.1f} FPS",
                (12, 28), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
    banner_y = 64
    if aeb:
        cv2.rectangle(frame_bgr, (0, banner_y - 28), (w, banner_y + 8),
                      (0, 0, 255), -1)
        cv2.putText(frame_bgr, "AUTOMATIC EMERGENCY BRAKING",
                    (w // 2 - 220, banner_y), cv2.FONT_HERSHEY_SIMPLEX,
                    0.8, (255, 255, 255), 2)
    elif fcw:
        cv2.rectangle(frame_bgr, (0, banner_y - 28), (w, banner_y + 8),
                      (0, 120, 255), -1)
        cv2.putText(frame_bgr, "FORWARD COLLISION WARNING",
                    (w // 2 - 200, banner_y), cv2.FONT_HERSHEY_SIMPLEX,
                    0.8, (255, 255, 255), 2)
    if cut_in:
        cv2.putText(frame_bgr, "CUT-IN", (12, 96),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 255, 255), 2)
    if lane_departure:
        cv2.putText(frame_bgr, "LANE DEPARTURE", (12, 128),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 0, 255), 2)
    return frame_bgr


def depth_to_colormap(depth01: np.ndarray) -> np.ndarray:
    """Relative depth in [0,1] -> BGR colormap image."""
    d = np.clip(np.asarray(depth01) * 255, 0, 255).astype(np.uint8)
    return cv2.applyColorMap(d, cv2.COLORMAP_PLASMA)
