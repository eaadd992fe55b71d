"""Python ctypes binding to the C++ host shim (host/libavp_host.so).

The pipeline publishes its per-frame outputs into the /visionpilot_state
POSIX shm segment with the same POD layout as the reference runtime
(visionpilot_shared_state.hpp:34-85), so external consumers are unchanged.

Build the native library first:
    cmake -S host -B host/build -G Ninja && cmake --build host/build
"""
from __future__ import annotations

import ctypes
import pathlib
from typing import Optional

_LIB_PATHS = [
    pathlib.Path(__file__).resolve().parents[2] / "host" / "build" /
    "libavp_host.so",
]


class VisionPilotStateStruct(ctypes.Structure):
    """ctypes mirror of avp::host::VisionPilotState (natural alignment)."""
    _fields_ = [
        ("seq", ctypes.c_uint64),
        ("frame_number", ctypes.c_uint64),
        ("steering_pid_deg", ctypes.c_double),
        ("steering_pid_raw_deg", ctypes.c_double),
        ("steering_autosteer_deg", ctypes.c_double),
        ("autosteer_valid", ctypes.c_bool),
        ("cte_m", ctypes.c_double),
        ("yaw_error_rad", ctypes.c_double),
        ("curvature_inv_m", ctypes.c_double),
        ("path_valid", ctypes.c_bool),
        ("lane_departure_warning", ctypes.c_bool),
        ("cipo_exists", ctypes.c_bool),
        ("cipo_track_id", ctypes.c_int),
        ("cipo_class_id", ctypes.c_int),
        ("cipo_distance_m", ctypes.c_double),
        ("cipo_velocity_ms", ctypes.c_double),
        ("cut_in_detected", ctypes.c_bool),
        ("kalman_reset", ctypes.c_bool),
        ("ideal_speed_ms", ctypes.c_double),
        ("safe_distance_m", ctypes.c_double),
        ("fcw_active", ctypes.c_bool),
        ("aeb_active", ctypes.c_bool),
        ("control_effort_ms2", ctypes.c_double),
        ("ego_speed_ms", ctypes.c_double),
        ("ego_steering_angle_deg", ctypes.c_double),
        ("can_valid", ctypes.c_bool),
    ]


def _load_lib() -> Optional[ctypes.CDLL]:
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.avp_shm_create.restype = ctypes.c_void_p
            lib.avp_shm_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.avp_shm_destroy.argtypes = [ctypes.c_void_p]
            lib.avp_shm_publish.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(VisionPilotStateStruct)]
            lib.avp_shm_read.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(VisionPilotStateStruct)]
            lib.avp_shm_state_size.restype = ctypes.c_ulonglong
            return lib
    return None


class _Base:
    def __init__(self, name: str, owner: bool):
        self._lib = _load_lib()
        if self._lib is None:
            raise RuntimeError(
                "libavp_host.so not built; run: cmake -S host -B host/build "
                "-G Ninja && cmake --build host/build")
        native = int(self._lib.avp_shm_state_size())
        ours = ctypes.sizeof(VisionPilotStateStruct)
        if native != ours:
            raise RuntimeError(
                f"ABI mismatch: C++ struct {native} bytes vs ctypes {ours}")
        self._h = self._lib.avp_shm_create(name.encode(), 1 if owner else 0)
        if not self._h:
            raise RuntimeError(f"cannot open shm segment {name}")

    def close(self):
        if getattr(self, "_h", None):
            self._lib.avp_shm_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class SharedStatePublisher(_Base):
    def __init__(self, name: str = "/visionpilot_state"):
        super().__init__(name, owner=True)

    def publish(self, state: VisionPilotStateStruct):
        self._lib.avp_shm_publish(self._h, ctypes.byref(state))


class SharedStateReader(_Base):
    def __init__(self, name: str = "/visionpilot_state"):
        super().__init__(name, owner=False)

    def read(self) -> VisionPilotStateStruct:
        out = VisionPilotStateStruct()
        self._lib.avp_shm_read(self._h, ctypes.byref(out))
        return out
