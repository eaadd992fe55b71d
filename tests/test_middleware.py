"""Middleware: in-proc pub/sub wiring of video -> model -> viz nodes, the
same topology as ROS2/models/launch/run_pipeline.launch.py."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as fnn

from autoware_vision_pilot_tpu.middleware import (
    InProcTransport, JaxInferenceBackend, RunModelNode, VideoPublisherNode,
    MasksVisualizationNode, make_transport,
)


class TinySeg(fnn.Module):
    @fnn.compact
    def __call__(self, x, train=False):
        return fnn.Conv(3, (3, 3), padding=1)(x)


class FakeCapture:
    def __init__(self, frames):
        self.frames = list(frames)

    def read(self):
        if self.frames:
            return True, self.frames.pop(0)
        return False, None


def test_inproc_pipeline_topology():
    t = InProcTransport()
    model = TinySeg()
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 128, 3), jnp.float32))
    backend = JaxInferenceBackend(model, variables, input_hw=(64, 128),
                                  dtype=jnp.float32)
    # viz subscribes to /image_raw first so the synchronous in-proc
    # transport delivers it the frame before the model's mask arrives
    viz_out = []
    MasksVisualizationNode(t, palette="scene")
    t.subscribe("/viz/overlay", viz_out.append)
    RunModelNode(t, backend, model_type="segmentation")

    frames = [np.random.default_rng(i).integers(
        0, 256, (120, 160, 3), dtype=np.uint8) for i in range(3)]
    pub = VideoPublisherNode(t, FakeCapture(frames))
    n = pub.spin()
    assert n == 3
    assert len(viz_out) == 3
    assert viz_out[0].shape == (120, 160, 3)


def test_run_model_node_depth_and_egolanes():
    t = InProcTransport()
    model = TinySeg()
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 32, 64, 3), jnp.float32))
    got = {}
    backend = JaxInferenceBackend(model, variables, input_hw=(32, 64),
                                  dtype=jnp.float32)
    RunModelNode(t, backend, output_topic="/depth", model_type="depth")
    RunModelNode(t, JaxInferenceBackend(model, variables, input_hw=(32, 64),
                                        dtype=jnp.float32),
                 output_topic="/lanes", model_type="egolanes")
    t.subscribe("/depth", lambda m: got.setdefault("depth", m))
    t.subscribe("/lanes", lambda m: got.setdefault("lanes", m))
    frame = np.zeros((64, 128, 3), np.uint8)
    t.publish("/image_raw", frame)
    assert got["depth"].dtype == np.float32
    assert got["lanes"].dtype == np.uint8 and got["lanes"].shape[-1] == 3


def test_make_transport_unknown():
    with pytest.raises(ValueError):
        make_transport("carrier_pigeon")


# ---------------------------------------------------------------------------
# ROS2 transport: exercised against a faithful fake rclpy/sensor_msgs/
# vision_msgs (the real stack is not installed here). The fake routes
# publisher.publish() straight to matching subscriptions, so the full
# numpy -> Image/Detection2DArray -> numpy codec path runs.
# ---------------------------------------------------------------------------

def _install_fake_ros2(monkeypatch):
    import sys
    import types

    class _Header:
        def __init__(self):
            self.frame_id = ""
            self.stamp = None

    class _Image:
        def __init__(self):
            self.header = _Header()
            self.height = 0
            self.width = 0
            self.encoding = ""
            self.is_bigendian = False
            self.step = 0
            self.data = b""

    class _Position:
        x = 0.0
        y = 0.0

    class _Center:
        def __init__(self):
            self.position = _Position()
            self.theta = 0.0

    class _BBox:
        def __init__(self):
            self.center = _Center()
            self.size_x = 0.0
            self.size_y = 0.0

    class _Hypothesis:
        def __init__(self):
            self.class_id = ""
            self.score = 0.0

    class _ObjectHypothesisWithPose:
        def __init__(self):
            self.hypothesis = _Hypothesis()

    class _Detection2D:
        def __init__(self):
            self.bbox = _BBox()
            self.results = []

    class _Detection2DArray:
        def __init__(self):
            self.header = _Header()
            self.detections = []

    bus = {}  # topic -> list[callback]

    class _Pub:
        def __init__(self, topic):
            self.topic = topic

        def publish(self, msg):
            for cb in bus.get(self.topic, ()):
                cb(msg)

    class _Node:
        def __init__(self, name):
            self.name = name

        def create_publisher(self, msg_cls, topic, qos):
            return _Pub(topic)

        def create_subscription(self, msg_cls, topic, cb, qos):
            bus.setdefault(topic, []).append(cb)

        def destroy_node(self):
            pass

    rclpy = types.ModuleType("rclpy")
    rclpy._ok = False

    def _init():
        rclpy._ok = True

    rclpy.init = _init
    rclpy.ok = lambda: rclpy._ok
    rclpy.shutdown = lambda: setattr(rclpy, "_ok", False)
    rclpy.spin_once = lambda node, timeout_sec=0.0: None
    rclpy_node = types.ModuleType("rclpy.node")
    rclpy_node.Node = _Node
    rclpy.node = rclpy_node

    sensor_msgs = types.ModuleType("sensor_msgs")
    sensor_msgs_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msgs_msg.Image = _Image
    sensor_msgs.msg = sensor_msgs_msg

    vision_msgs = types.ModuleType("vision_msgs")
    vision_msgs_msg = types.ModuleType("vision_msgs.msg")
    vision_msgs_msg.Detection2D = _Detection2D
    vision_msgs_msg.Detection2DArray = _Detection2DArray
    vision_msgs_msg.ObjectHypothesisWithPose = _ObjectHypothesisWithPose
    vision_msgs.msg = vision_msgs_msg

    for name, mod in [("rclpy", rclpy), ("rclpy.node", rclpy_node),
                      ("sensor_msgs", sensor_msgs),
                      ("sensor_msgs.msg", sensor_msgs_msg),
                      ("vision_msgs", vision_msgs),
                      ("vision_msgs.msg", vision_msgs_msg)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return bus


def test_ros2_codec_image_roundtrip(monkeypatch):
    _install_fake_ros2(monkeypatch)
    from autoware_vision_pilot_tpu.middleware import ros2_codec as codec

    rng = np.random.default_rng(0)
    for arr, enc in [
        (rng.integers(0, 255, (12, 16, 3), dtype=np.uint8), "bgr8"),
        (rng.integers(0, 2, (12, 16), dtype=np.uint8) * 255, "mono8"),
        (rng.normal(size=(12, 16)).astype(np.float32), "32FC1"),
        (rng.integers(0, 2, (8, 16, 3), dtype=np.uint8), "8UC3"),
    ]:
        msg = codec.np_to_image_msg(arr, enc)
        assert msg.encoding == enc
        assert msg.step == arr.shape[1] * (arr.size // (
            arr.shape[0] * arr.shape[1])) * arr.itemsize
        back = codec.image_msg_to_np(msg)
        np.testing.assert_array_equal(back.reshape(arr.shape), arr)


def test_ros2_codec_detections_roundtrip(monkeypatch):
    _install_fake_ros2(monkeypatch)
    from autoware_vision_pilot_tpu.middleware import ros2_codec as codec

    dets = np.array([[10, 20, 110, 220, 0.9, 2],
                     [5, 5, 50, 60, 0.4, 0]], np.float32)
    msg = codec.dets_to_detection2d_array(dets)
    assert len(msg.detections) == 2
    assert msg.detections[0].results[0].hypothesis.class_id == "2"
    back = codec.detection2d_array_to_dets(msg)
    np.testing.assert_allclose(back, dets, atol=1e-5)


def test_ros2_transport_run_model_node(monkeypatch):
    """RunModelNode over Ros2Transport: bgr8 Image in -> mono8 mask out,
    over the (fake) DDS boundary — the run_model_node.cpp contract."""
    _install_fake_ros2(monkeypatch)
    from autoware_vision_pilot_tpu.middleware.transport import Ros2Transport
    from autoware_vision_pilot_tpu.middleware.nodes import RunModelNode

    class Backend:
        def do_inference(self, frame):
            h, w = frame.shape[:2]
            out = np.zeros((h, w, 3), np.float32)
            out[..., 1] = 1.0  # everything class 1
            return out

    t = Ros2Transport(node_name="test_node")
    got = []
    t.subscribe("/model/output", got.append)
    RunModelNode(t, Backend(), image_topic="/image_raw",
                 output_topic="/model/output", model_type="segmentation")

    frame = np.random.default_rng(1).integers(
        0, 255, (10, 14, 3), dtype=np.uint8)
    t.publish("/image_raw", frame)
    assert len(got) == 1
    assert got[0].dtype == np.uint8 and got[0].shape == (10, 14)
    assert (got[0] == 1).all()
    t.close()


def test_ros2_transport_detections_topic(monkeypatch):
    _install_fake_ros2(monkeypatch)
    from autoware_vision_pilot_tpu.middleware.transport import Ros2Transport

    t = Ros2Transport(topic_types={"/autospeed/detections": "detections"})
    got = []
    t.subscribe("/autospeed/detections", got.append)
    dets = np.array([[0, 0, 10, 10, 0.8, 1]], np.float32)
    t.publish("/autospeed/detections", dets)
    assert len(got) == 1
    np.testing.assert_allclose(got[0], dets, atol=1e-5)
    t.close()


def test_ros2_transport_requires_rclpy():
    """Without rclpy installed, construction raises ImportError (the
    reference hard-fails on a missing backend the same way)."""
    import importlib
    if importlib.util.find_spec("rclpy") is not None:
        pytest.skip("real rclpy present")
    from autoware_vision_pilot_tpu.middleware.transport import Ros2Transport
    with pytest.raises(ImportError):
        Ros2Transport()


def test_pathfinder_node_tracked_states_contract():
    """PATHFINDER node (pathfinder_node.cpp:22-35): lane paths in ->
    tracked_states out with the Float32MultiArray layout consumers index
    ([3]=cte, [7]=yaw, [11]=curvature)."""
    from autoware_vision_pilot_tpu.middleware.nodes import PathFinderNode

    t = InProcTransport()
    got = []
    t.subscribe("/pathfinder/tracked_states", got.append)
    node = PathFinderNode(t)
    # straight lane 2 m either side of the vehicle, 20 m ahead
    # (x positive toward the left lane: width = r_cte - l_cte = 4)
    ys = np.linspace(0.0, 20.0, 10)
    t.publish("/egoLaneL", [(2.0, y) for y in ys])
    t.publish("/egoLaneR", [(-2.0, y) for y in ys])
    for _ in range(25):
        t.publish("/egoPath", [(0.0, y) for y in ys])
    assert len(got) == 25
    states = got[-1]
    assert states.shape == (14,)
    assert abs(states[3]) < 0.25          # centered -> fused cte ~ 0
    assert abs(states[7]) < 0.05          # straight -> yaw ~ 0
    assert abs(states[12] - 4.0) < 0.5    # lane width ~ 4 m


def test_steering_controller_node():
    """steering_controller_node.cpp: tracked_states + odom -> steering
    command with the exact hybrid formula."""
    from autoware_vision_pilot_tpu.middleware.nodes import (
        SteeringControllerNode)
    import math

    t = InProcTransport()
    cmds = []
    t.subscribe("/vehicle/steering_cmd", cmds.append)
    node = SteeringControllerNode(t, K_p=0.33, K_i=0.11, K_d=-0.40,
                                  K_S=1.0)
    t.publish("/hero/odom", {"twist": {"linear": {"x": 8.0}}})
    states = np.zeros(14, np.float32)
    states[3], states[7], states[11] = 0.5, 0.1, 0.02
    t.publish("/pathfinder/tracked_states", states)
    expected = (-0.40 * (0.1 - 0.0) + math.atan(0.11 * 0.5)
                + 0.33 * 0.1 + 0.02 * 1.0)
    assert cmds and abs(cmds[0] - expected) < 1e-6
    # short message ignored (:25-28)
    t.publish("/pathfinder/tracked_states", np.zeros(5, np.float32))
    assert len(cmds) == 1


def test_longitudinal_controller_node():
    """longitudinal_controller_node.cpp: curvature-capped target speed,
    log-model feed-forward throttle, brake only on hard decel demand."""
    from autoware_vision_pilot_tpu.middleware.nodes import (
        LongitudinalControllerNode)

    t = InProcTransport()
    throttle, brake = [], []
    t.subscribe("/vehicle/throttle_cmd", throttle.append)
    t.subscribe("/vehicle/brake_cmd", brake.append)
    node = LongitudinalControllerNode(t, target_vel=10.0)

    # vel_to_throttle matches the fitted log model (:68-82)
    assert LongitudinalControllerNode.vel_to_throttle(0.0) == 0.0
    v5 = LongitudinalControllerNode.vel_to_throttle(5.0)
    assert 0.0 < v5 < 1.0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        LongitudinalControllerNode.vel_to_throttle(-1.0)

    # straight road, slow -> feed-forward throttle, no brake
    states = np.zeros(14, np.float32)
    t.publish("/pathfinder/tracked_states", states)
    t.publish("/hero/odom", {"twist": {"linear": {"x": 2.0}}})
    assert throttle and throttle[-1] > 0 and brake[-1] == 0.0

    # tight curve caps the target speed; overspeed -> zero feed-forward
    states[11] = 0.5   # curvature 0.5 -> cap = sqrt(2/0.5) = 2 m/s
    t.publish("/pathfinder/tracked_states", states)
    t.publish("/hero/odom", {"twist": {"linear": {"x": 9.0}}})
    assert throttle[-1] == 0.0 and brake[-1] > 0.0


def test_depth_visualization_node():
    from autoware_vision_pilot_tpu.middleware.nodes import (
        DepthVisualizationNode)

    t = InProcTransport()
    out = []
    t.subscribe("/viz/depth", out.append)
    DepthVisualizationNode(t)
    t.publish("/image_raw", np.zeros((64, 128, 3), np.uint8))
    t.publish("/model/depth", np.linspace(0, 1, 32 * 64
                                          ).reshape(32, 64).astype(
                                              np.float32))
    assert out and out[0].shape == (64, 128, 3)
    assert out[0].dtype == np.uint8


def test_launch_pipeline_from_yaml_params():
    """run_pipeline.launch.py + autoseg.yaml contract: two models share
    the input topic, each publishes its own mask topic."""
    from autoware_vision_pilot_tpu.middleware.nodes import launch_pipeline

    params = {
        "scene_seg_model": {"ros__parameters": {
            "model_type": "segmentation",
            "input_topic": "/sensors/video/image_raw",
            "output_topic": "/autoseg/scene_seg/mask"}},
        "domain_seg_model": {"ros__parameters": {
            "model_type": "segmentation",
            "input_topic": "/sensors/video/image_raw",
            "output_topic": "/autoseg/domain_seg/mask"}},
    }

    class FakeBackend:
        def do_inference(self, img):
            return np.zeros((80, 160, 3), np.float32)

        def get_tensor_shape(self):
            return (80, 160, 3)

    t = InProcTransport()
    masks, masks2 = [], []
    t.subscribe("/autoseg/scene_seg/mask", masks.append)
    t.subscribe("/autoseg/domain_seg/mask", masks2.append)
    nodes = launch_pipeline(t, params, make_backend=lambda p: FakeBackend())
    assert set(nodes) == {"scene_seg_model", "domain_seg_model"}
    t.publish("/sensors/video/image_raw",
              np.zeros((720, 1280, 3), np.uint8))
    assert len(masks) == 1 and len(masks2) == 1


# Zenoh transport: exercised against a fake zenoh module (the real client
# is not installed here) — same pattern as the fake-rclpy tests above.
def test_zenoh_transport_pub_sub(monkeypatch):
    import sys
    import types

    zenoh = types.ModuleType("zenoh")

    class _Sample:
        def __init__(self, payload):
            self.payload = payload

    class _Session:
        def __init__(self):
            self.subs = {}
            self.closed = False

        def put(self, key, value):
            for cb in self.subs.get(key, []):
                cb(_Sample(value))

        def declare_subscriber(self, key, cb):
            self.subs.setdefault(key, []).append(cb)
            return ("sub", key)

        def close(self):
            self.closed = True

    zenoh.Config = lambda: {}
    zenoh.open = lambda cfg: _Session()
    monkeypatch.setitem(sys.modules, "zenoh", zenoh)

    from autoware_vision_pilot_tpu.middleware.transport import (
        ZenohTransport, make_transport)

    t = make_transport("zenoh")
    assert isinstance(t, ZenohTransport)
    got = []
    t.subscribe("vp/frames", got.append)
    t.publish("vp/frames", b"\x01\x02\x03")
    t.publish("vp/other", b"zzz")          # different key: not delivered
    assert got == [b"\x01\x02\x03"]
    t.close()
    assert t._session.closed


def test_zenoh_transport_missing_module(monkeypatch):
    import builtins
    import sys

    monkeypatch.delitem(sys.modules, "zenoh", raising=False)
    real_import = builtins.__import__

    def no_zenoh(name, *a, **kw):
        if name == "zenoh":
            raise ImportError("no zenoh")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_zenoh)
    from autoware_vision_pilot_tpu.middleware.transport import make_transport
    import pytest as _pytest
    with _pytest.raises(ImportError):
        make_transport("zenoh")
