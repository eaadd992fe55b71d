"""CARLA publisher node family (N34: simulation/CARLA/ROS2/src/*), tested
against a fake CARLA world so the coordinate math and node behavior are
verified without a simulator (the reference's nodes cannot be tested at
all without one)."""
from __future__ import annotations

import math
import types

import numpy as np
import pytest

from autoware_vision_pilot_tpu.middleware import InProcTransport
from autoware_vision_pilot_tpu.simulation.carla_publishers import (
    yaw_to_quaternion, quaternion_from_euler, rpy_to_matrix,
    carla_transform_to_pose, body_frame_velocity, find_ego_vehicle,
    CarlaOdomPublisher, CarlaWaypointsPublisher, CarlaRoadShapePublisher,
    CarlaControlSubscriber)


# ----------------------------------------------------------- fake carla

def V(x=0.0, y=0.0, z=0.0):
    return types.SimpleNamespace(x=x, y=y, z=z)


def R(roll=0.0, pitch=0.0, yaw=0.0):
    return types.SimpleNamespace(roll=roll, pitch=pitch, yaw=yaw)


class FakeActor:
    def __init__(self, role="hero", loc=None, rot=None):
        self.attributes = {"role_name": role}
        self._tf = types.SimpleNamespace(location=loc or V(10, 5, 0.2),
                                         rotation=rot or R(yaw=90.0))
        self.controls = []

    def get_transform(self):
        return self._tf

    def get_velocity(self):
        return V(3.0, 4.0, 0.0)

    def get_angular_velocity(self):
        return V(0.0, 0.0, 10.0)

    def apply_control(self, c):
        self.controls.append(c)


class FakeWaypoint:
    def __init__(self, x, step=2.0, lane_width=3.6, n_left=100):
        self.transform = types.SimpleNamespace(
            location=V(x, 0.0, 0.0), rotation=R(yaw=0.0))
        self.lane_width = lane_width
        self._step = step
        self._n_left = n_left

    def next(self, d):
        if self._n_left <= 0:
            return []
        return [FakeWaypoint(self.transform.location.x + d, self._step,
                             self.lane_width, self._n_left - 1)]


class FakeWorld:
    def __init__(self, actors):
        self._actors = actors

    def get_actors(self):
        actors = self._actors

        class _F:
            def filter(self, pat):
                return actors
        return _F()

    def get_map(self):
        class _M:
            def get_waypoint(self, loc):
                return FakeWaypoint(loc.x)
        return _M()


# ----------------------------------------------------------- geometry

def test_lh_to_rh_pose_conversion():
    pose = carla_transform_to_pose(V(1.0, 2.0, 3.0), R(0.0, 0.0, 90.0))
    assert pose["position"] == {"x": 1.0, "y": -2.0, "z": 3.0}
    # yaw +90deg LH -> -90deg RH: quaternion z = sin(-45deg)
    assert pose["orientation"]["z"] == pytest.approx(-math.sqrt(0.5))
    assert pose["orientation"]["w"] == pytest.approx(math.sqrt(0.5))


def test_yaw_quaternion_and_rpy_matrix():
    q = yaw_to_quaternion(180.0)
    assert q["z"] == pytest.approx(1.0) and q["w"] == pytest.approx(0.0)
    Rm = rpy_to_matrix(0.0, 0.0, math.pi / 2)
    np.testing.assert_allclose(Rm @ np.array([1, 0, 0]),
                               [0, 1, 0], atol=1e-12)
    # matches quaternion_from_euler for a pure yaw
    qx, qy, qz, qw = quaternion_from_euler(0, 0, math.pi / 2)
    assert (qz, qw) == (pytest.approx(math.sin(math.pi / 4)),
                        pytest.approx(math.cos(math.pi / 4)))


def test_body_frame_velocity():
    # ego heading +90deg (LH): world velocity (3,4) -> body frame
    v = body_frame_velocity(V(3.0, 4.0, 0.0), 90.0)
    # flip y: (3,-4); rotate by +90: (4, 3)... verified against the
    # reference formula R(yaw) @ [vx, -vy]
    c, s = math.cos(math.radians(90)), math.sin(math.radians(90))
    exp = np.array([[c, -s], [s, c]]) @ np.array([3.0, -4.0])
    np.testing.assert_allclose(v, exp)


# ----------------------------------------------------------- nodes

def test_odom_publisher_publishes_rh_odometry():
    world = FakeWorld([FakeActor()])
    t = InProcTransport()
    got = []
    t.subscribe("/hero/odom", got.append)
    node = CarlaOdomPublisher(world, t)
    odom = node.tick()
    assert got and got[0] is odom
    assert odom["pose"]["position"]["y"] == -5.0
    assert odom["child_frame_id"] == "base_link"
    # angular velocity yaw flipped (LH->RH) and in rad/s
    assert odom["twist"]["angular"]["z"] == pytest.approx(
        -math.radians(10.0))


def test_waypoints_publisher_walks_lookahead():
    world = FakeWorld([FakeActor()])
    t = InProcTransport()
    got = []
    t.subscribe("/planning/trajectory", got.append)
    traj = CarlaWaypointsPublisher(world, t).tick()
    assert got
    # 100 m lookahead at 2 m steps -> 50 points, constant 10 m/s
    assert len(traj["points"]) == 50
    assert all(p["longitudinal_velocity_mps"] == 10.0
               for p in traj["points"])
    xs = [p["pose"]["position"]["x"] for p in traj["points"]]
    assert xs == sorted(xs) and xs[1] - xs[0] == pytest.approx(2.0)


def test_road_shape_publisher_boundaries():
    world = FakeWorld([FakeActor()])
    t = InProcTransport()
    shape = CarlaRoadShapePublisher(world, t).tick()
    assert len(shape["left_boundary"]) == len(shape["right_boundary"]) == 30
    # straight lane along +x with width 3.6: boundaries at y = -/+1.8
    ly = shape["left_boundary"][0]["y"]
    ry = shape["right_boundary"][0]["y"]
    assert abs(ly - ry) == pytest.approx(3.6)


def test_control_subscriber_maps_outputs():
    world = FakeWorld([FakeActor()])
    t = InProcTransport()
    sub = CarlaControlSubscriber(world, t)
    sub.ego = None  # avoid the carla.VehicleControl import in _apply
    t.publish("/control/steering_deg", 20.0)
    t.publish("/control/accel_effort", 1.5)
    c = sub.control_dict()
    assert c["steer"] == pytest.approx(0.5)      # 20/40
    assert c["throttle"] == pytest.approx(0.5)   # 1.5/3
    assert c["brake"] == 0.0
    t.publish("/control/accel_effort", -5.0)
    assert sub.control_dict()["brake"] == pytest.approx(1.0)


def test_find_ego_requires_hero_role():
    world = FakeWorld([FakeActor(role="npc"), FakeActor(role="hero")])
    ego = find_ego_vehicle(world)
    assert ego is not None and ego.attributes["role_name"] == "hero"
    assert find_ego_vehicle(FakeWorld([FakeActor(role="npc")])) is None

# ----------------------------------------------------------- SODA.Sim

def test_sodasim_pipeline_strings_and_caps():
    from autoware_vision_pilot_tpu.simulation.soda_sim import (
        build_pipeline_description, caps_string, fps_to_int)
    rtp = build_pipeline_description("rtp", port=5700, bitrate=2000)
    assert "appsrc name=ros_appsrc" in rtp and "udpsink" in rtp
    assert "port=5700" in rtp and "bitrate=2000" in rtp
    v4l2 = build_pipeline_description("v4l2", device="/dev/video10")
    assert "v4l2sink device=/dev/video10" in v4l2
    with pytest.raises(ValueError):
        build_pipeline_description("bogus")
    assert fps_to_int(29.7) == 30 and fps_to_int(0.0) == 0
    assert caps_string(1280, 720, 30.0) == (
        "video/x-raw,format=BGR,width=1280,height=720,framerate=30/1")
    assert caps_string(640, 320, 0.0).endswith("framerate=0/1")
