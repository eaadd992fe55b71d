"""Graceful-degradation contracts (SURVEY §5.3): the pipeline continues
without SHM / CAN / tracking; domain-level recovery hooks behave."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_can_interface_missing_bus_degrades():
    from autoware_vision_pilot_tpu.drivers.can_interface import CanInterface
    can = CanInterface("definitely_not_a_bus_7")
    assert not can.ok
    can.update()  # no-throw
    st = can.get_state()
    assert not st.valid


def test_can_asc_replay_decodes():
    import textwrap, tempfile, os, time
    from autoware_vision_pilot_tpu.drivers.can_interface import CanInterface
    asc = textwrap.dedent("""\
        0.000000 1 A1 Rx d 2 E8 03
        0.000000 1 A4 Rx d 2 64 00
    """)
    with tempfile.NamedTemporaryFile("w", suffix=".asc", delete=False) as f:
        f.write(asc)
        path = f.name
    try:
        can = CanInterface(replay_file=path)
        assert can.ok
        time.sleep(0.01)
        can.update()
        st = can.get_state()
        assert abs(st.speed_ms - 10.0) < 1e-9       # 0x03E8 * 0.01
        assert abs(st.steering_angle_deg - 10.0) < 1e-9  # 0x0064 * 0.1
        assert st.valid
    finally:
        os.unlink(path)


def test_speed_planner_no_cipo_accelerates():
    from autoware_vision_pilot_tpu.control import SpeedPlanner
    p = SpeedPlanner(ego_speed=10.0, is_cipo_present=False)
    assert p.calc_ideal_driving_speed() == 10.5
    assert not p.get_fcw_state() and not p.get_aeb_state()


def test_lane_tracker_survives_total_loss():
    """Both lanes lost: no recovery possible, output flagged invalid, state
    preserved (lane_tracking.cpp 'both lost' path)."""
    from autoware_vision_pilot_tpu.perception.lane_tracker import (
        LaneTrackerState, lane_tracker_update)
    st = LaneTrackerState.init()
    z = jnp.zeros(6)
    out, st2 = lane_tracker_update(z, jnp.asarray(False), z,
                                   jnp.asarray(False), st)
    assert not bool(out.path_valid)
    assert float(st2.bev_width) == float(st.bev_width)


def test_bayes_filter_total_nan_measurement():
    """All-NaN measurement: variances inflate, means hold
    (estimator.cpp:33-37)."""
    from autoware_vision_pilot_tpu.perception.path_finder import (
        BayesState, path_finder_update)
    st = BayesState.init()
    pts = jnp.zeros((8, 2))
    mask = jnp.zeros(8, bool)
    out, st2 = path_finder_update(st, pts, mask, pts, mask,
                                  jnp.float32(0.0), jax.random.key(0))
    assert not bool(out.left_valid) and not bool(out.right_valid)
    assert np.isfinite(float(out.lane_width))
