"""Camera / video source utilities (production_release/src/camera/
camera_utils.cpp: v4l2 enumeration, verification, open)."""
from __future__ import annotations

import glob
import re
from typing import List, Optional, Tuple

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def list_cameras(max_devices: int = 10) -> List[int]:
    """Enumerate /dev/video* nodes that open and deliver a frame."""
    found = []
    for path in sorted(glob.glob("/dev/video*")):
        m = re.search(r"(\d+)$", path)
        if not m:
            continue
        idx = int(m.group(1))
        if idx >= max_devices:
            continue
        cap = cv2.VideoCapture(idx)
        if cap.isOpened():
            ok, _ = cap.read()
            if ok:
                found.append(idx)
        cap.release()
    return found


def open_camera(device_id: Optional[int] = None,
                resolution: Tuple[int, int] = (1280, 720)):
    """Open and verify a camera; auto-select the first working one when
    device_id is None."""
    if device_id is None:
        cams = list_cameras()
        if not cams:
            raise RuntimeError("no working cameras found")
        device_id = cams[0]
    cap = cv2.VideoCapture(device_id)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open camera {device_id}")
    cap.set(cv2.CAP_PROP_FRAME_WIDTH, resolution[0])
    cap.set(cv2.CAP_PROP_FRAME_HEIGHT, resolution[1])
    ok, _ = cap.read()
    if not ok:
        cap.release()
        raise RuntimeError(f"camera {device_id} opened but delivers no frames")
    return cap


def open_video(path: str):
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open video {path}")
    return cap
