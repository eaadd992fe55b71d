"""Pluggable pub/sub transports for the middleware nodes.

The reference ships three recipes over one common inference layer: ROS2
DDS nodes (middleware_recipes/ROS2/), Zenoh pub/sub (Zenoh/models/
run_model.cpp), and iceoryx2 zero-copy services (IceOryx2/). Here the node
logic is transport-agnostic; each transport implements publish/subscribe
on string topics. ROS2 (rclpy) and Zenoh bind when their client libraries
are installed; InProcTransport is the dependency-free fallback used by
tests and single-process deployments.
"""
from __future__ import annotations

import threading
from collections import defaultdict
from typing import Any, Callable, Dict, List


class Transport:
    def publish(self, topic: str, msg: Any) -> None:
        raise NotImplementedError

    def subscribe(self, topic: str, callback: Callable[[Any], None]) -> None:
        raise NotImplementedError

    def spin_once(self, timeout: float = 0.0) -> None:
        pass

    def close(self) -> None:
        pass


class InProcTransport(Transport):
    """Synchronous in-process pub/sub (zero-copy by reference)."""

    def __init__(self):
        self._subs: Dict[str, List[Callable]] = defaultdict(list)
        self._lock = threading.Lock()

    def publish(self, topic, msg):
        with self._lock:
            subs = list(self._subs.get(topic, ()))
        for cb in subs:
            cb(msg)

    def subscribe(self, topic, callback):
        with self._lock:
            self._subs[topic].append(callback)


class Ros2Transport(Transport):
    """rclpy-backed transport (requires a ROS2 installation).

    Topic contract matches middleware_recipes/ROS2: sensor_msgs/Image in,
    MONO8 mask / 32FC1 depth out, vision_msgs/Detection2DArray for
    AutoSpeed.
    """

    def __init__(self, node_name: str = "avp_tpu"):
        import rclpy  # noqa: F401 — hard dependency by design
        from rclpy.node import Node
        rclpy.init()
        self._rclpy = rclpy
        self._node = Node(node_name)
        self._pubs = {}

    def publish(self, topic, msg):
        raise NotImplementedError(
            "ROS2 message conversion requires cv_bridge; wire via "
            "nodes.RunModelNode with a Ros2Transport subclass")

    def subscribe(self, topic, callback):
        raise NotImplementedError

    def spin_once(self, timeout: float = 0.0):
        self._rclpy.spin_once(self._node, timeout_sec=timeout)

    def close(self):
        self._node.destroy_node()
        self._rclpy.shutdown()


class ZenohTransport(Transport):
    """zenoh-python-backed transport (requires `zenoh`). Frames/results are
    published as raw bytes on string key expressions — the same contract as
    Zenoh/models/run_model.cpp:40-120."""

    def __init__(self, config=None):
        import zenoh  # hard dependency by design
        self._session = zenoh.open(config or zenoh.Config())
        self._subs = []

    def publish(self, topic, msg: bytes):
        self._session.put(topic, msg)

    def subscribe(self, topic, callback):
        self._subs.append(self._session.declare_subscriber(
            topic, lambda sample: callback(bytes(sample.payload))))

    def close(self):
        self._session.close()


def make_transport(kind: str = "inproc", **kw) -> Transport:
    if kind == "inproc":
        return InProcTransport()
    if kind == "ros2":
        return Ros2Transport(**kw)
    if kind == "zenoh":
        return ZenohTransport(**kw)
    raise ValueError(f"unknown transport {kind}")
