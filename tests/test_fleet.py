"""Fleet serving mode: N vmapped streams == N independent pipelines.

The fleet lateral pipeline (runtime/fleet.py) vmaps the exact step that
the single-stream LateralPipeline jits, so per-stream results must match
running each stream through its own pipeline — including the temporal
state carried across frames (EgoLanes ring, LaneFilter, Bayes, steering).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

# full-size lateral stack: XLA:CPU compile-heavy (~13 min total on a 1-CPU
# host). The dryrun-depth siblings in test_fleet_fast.py run in the fast tier.
pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def lateral_vars():
    from autoware_vision_pilot_tpu.models.ego_lanes import EgoLanesNetwork
    from autoware_vision_pilot_tpu.models.auto_steer_temporal import (
        AutoSteerTemporalNet)
    key = jax.random.key(0)
    dtype = jnp.float32
    lanes_vars = EgoLanesNetwork(dtype=dtype, param_dtype=dtype).init(
        key, jnp.zeros((1, 320, 640, 3), dtype))
    steer_vars = AutoSteerTemporalNet(dtype=dtype, param_dtype=dtype).init(
        key, jnp.zeros((1, 80, 160, 6), dtype))
    return lanes_vars, steer_vars


def _frames(n_streams, n_frames, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n_frames, n_streams, 720, 1280, 3),
                        dtype=np.uint8)


def test_fleet_matches_independent_streams(lateral_vars):
    from autoware_vision_pilot_tpu.runtime import (
        Config, FleetLateralPipeline, build_lateral_step,
        init_lateral_state)

    lanes_vars, steer_vars = lateral_vars
    cfg = Config()
    N, T = 2, 3
    frames = _frames(N, T)

    fleet = FleetLateralPipeline(lanes_vars, steer_vars, cfg,
                                 n_streams=N, dtype=jnp.float32)
    fl_states = fleet.init_states(seed=0)
    # reference: the same per-stream states through the unbatched step
    step = jax.jit(build_lateral_step(lanes_vars, steer_vars, cfg,
                                      dtype=jnp.float32))
    ind_states = [jax.tree.map(lambda x: x[i], fl_states)
                  for i in range(N)]

    # Vmapped and unbatched programs are equivalent up to float
    # reassociation (XLA schedules batched convs/reductions differently),
    # which the lateral stack amplifies through near-tie argmax selection
    # (RANSAC hypothesis choice on these synthetic noise frames) — the
    # observed divergence is ~0.5% rel from frame 0. Bit-exactness across
    # executions of the SAME program is separately guaranteed by
    # test_fleet_streams_are_independent.
    tol = dict(rtol=2e-2, atol=5e-2)
    for t in range(T):
        fl_out, fl_states = fleet(jnp.asarray(frames[t]), fl_states)
        for i in range(N):
            out_i, ind_states[i] = step(jnp.asarray(frames[t, i]),
                                        ind_states[i])
            np.testing.assert_allclose(
                np.asarray(fl_out["scalars"])[i],
                np.asarray(out_i["scalars"]), **tol,
                err_msg=f"stream {i} frame {t} scalars diverge")
            np.testing.assert_allclose(
                np.asarray(fl_out["coeffs"])[i],
                np.asarray(out_i["coeffs"]), rtol=2e-2, atol=5e-2)


def test_fleet_streams_are_independent(lateral_vars):
    """Stream i's results are BIT-identical regardless of what the other
    streams carry — the per-stream isolation guarantee of the vmapped
    design (no cross-stream reduction anywhere in the lateral stack)."""
    from autoware_vision_pilot_tpu.runtime import (
        Config, FleetLateralPipeline)

    lanes_vars, steer_vars = lateral_vars
    cfg = Config()
    N, T = 2, 2
    fleet = FleetLateralPipeline(lanes_vars, steer_vars, cfg,
                                 n_streams=N, dtype=jnp.float32)
    shared = _frames(1, T, seed=7)[:, 0]          # stream-0 frames
    other_a = _frames(1, T, seed=8)[:, 0]
    other_b = _frames(1, T, seed=9)[:, 0]

    outs = []
    for other in (other_a, other_b):
        states = fleet.init_states(seed=0)
        got = []
        for t in range(T):
            tick = jnp.stack([jnp.asarray(shared[t]),
                              jnp.asarray(other[t])])
            out, states = fleet(tick, states)
            got.append(np.asarray(out["scalars"])[0])
        outs.append(np.stack(got))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_fleet_sharded_over_mesh(lateral_vars):
    """8 streams sharded over the 8-device virtual mesh execute and stay
    finite; stream axis is pure DP (no collectives)."""
    from autoware_vision_pilot_tpu.core.mesh import make_mesh
    from autoware_vision_pilot_tpu.runtime import (
        Config, FleetLateralPipeline)

    lanes_vars, steer_vars = lateral_vars
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh((8,))
    cfg = Config()
    fleet = FleetLateralPipeline(lanes_vars, steer_vars, cfg,
                                 n_streams=8, dtype=jnp.float32,
                                 mesh=mesh)
    states = fleet.init_states(seed=1)
    frames = _frames(8, 1, seed=3)
    out, states = fleet(jnp.asarray(frames[0]), states)
    sc = np.asarray(out["scalars"])
    assert sc.shape == (8, 8)
    assert np.isfinite(sc).all()


def test_fleet_engine_runs(lateral_vars):
    """FleetEngine: 2 streams x 3 ticks through the full fleet loop with
    per-stream host tracking, software-pipelined harvest."""
    from autoware_vision_pilot_tpu.runtime import (
        Config, FleetEngine, FleetLateralPipeline,
        FleetLongitudinalPipeline)
    from autoware_vision_pilot_tpu.models.auto_speed import AutoSpeedNetwork
    from autoware_vision_pilot_tpu.perception.tracking import ObjectFinder

    lanes_vars, steer_vars = lateral_vars
    cfg = Config()
    key = jax.random.key(2)
    speed_vars = AutoSpeedNetwork(
        variant="n", num_classes=4, img_h=256, img_w=256,
        dtype=jnp.float32, param_dtype=jnp.float32).init(
        key, jnp.zeros((1, 256, 256, 3), jnp.float32))

    N, T = 2, 3
    fleet_lat = FleetLateralPipeline(lanes_vars, steer_vars, cfg,
                                     n_streams=N, dtype=jnp.float32)
    fleet_lon = FleetLongitudinalPipeline(speed_vars, cfg, n_streams=N,
                                          input_hw=(256, 256),
                                          dtype=jnp.float32)
    ticks = iter([_frames(N, 1, seed=20 + t)[0] for t in range(T)])
    finders = [ObjectFinder(np.eye(3), 1280, 720) for _ in range(N)]
    engine = FleetEngine(cfg, fleet_lat, fleet_lon,
                         object_finders=finders,
                         frame_source=lambda: next(ticks, None))
    out = engine.run(pipeline_depth=2)
    assert len(out) == T and all(len(r) == N for r in out)
    for per_tick in out:
        for r in per_tick:
            assert np.isfinite(r.steering_deg)
            assert np.isfinite(r.set_speed)
            # safety signals populated (same contract as PipelineEngine)
            assert isinstance(r.cut_in, (bool, np.bool_))
            assert isinstance(r.kalman_reset, (bool, np.bool_))
            assert isinstance(r.lane_departure, (bool, np.bool_))
            if r.n_tracks > 0 and r.cipo_distance >= 0:
                assert np.isfinite(r.cipo_velocity)


def test_fleet_longitudinal_matches_single(lateral_vars):
    from autoware_vision_pilot_tpu.runtime import (
        Config, FleetLongitudinalPipeline, LongitudinalPipeline)
    from autoware_vision_pilot_tpu.models.auto_speed import AutoSpeedNetwork

    cfg = Config()
    key = jax.random.key(1)
    dtype = jnp.float32
    speed_vars = AutoSpeedNetwork(
        variant="n", num_classes=4, img_h=256, img_w=256,
        dtype=dtype, param_dtype=dtype).init(
        key, jnp.zeros((1, 256, 256, 3), dtype))

    single = LongitudinalPipeline(speed_vars, cfg, input_hw=(256, 256),
                                  dtype=dtype)
    fleet = FleetLongitudinalPipeline(speed_vars, cfg, n_streams=2,
                                      input_hw=(256, 256), dtype=dtype)
    frames = _frames(2, 1, seed=5)[0]
    tables = np.asarray(fleet(jnp.asarray(frames)))
    for i in range(2):
        t_i = np.asarray(single(jnp.asarray(frames[i])))
        np.testing.assert_allclose(tables[i], t_i, rtol=1e-4, atol=1e-4)


def test_fleet_pad_to_matches_unpadded(lateral_vars):
    """pad_to runs a larger physical batch; the real streams' outputs
    must equal the unpadded fleet's (same tolerance rationale as
    test_fleet_matches_independent_streams: vmapped programs at
    different physical batch sizes reassociate floats)."""
    from autoware_vision_pilot_tpu.runtime import (
        Config, FleetLateralPipeline)

    lanes_vars, steer_vars = lateral_vars
    cfg = Config()
    N, T = 2, 2
    frames = _frames(N, T, seed=3)

    plain = FleetLateralPipeline(lanes_vars, steer_vars, cfg,
                                 n_streams=N, dtype=jnp.float32)
    padded = FleetLateralPipeline(lanes_vars, steer_vars, cfg,
                                  n_streams=N, dtype=jnp.float32,
                                  pad_to=4)
    assert padded.pad_to == 4
    s_plain = plain.init_states(seed=0)
    s_pad = padded.init_states(seed=0)
    for t in range(T):
        out_p, s_plain = plain(jnp.asarray(frames[t]), s_plain)
        out_q, s_pad = padded(jnp.asarray(frames[t]), s_pad)
        assert np.asarray(out_q["scalars"]).shape[0] == N
        np.testing.assert_allclose(np.asarray(out_p["scalars"]),
                                   np.asarray(out_q["scalars"]),
                                   rtol=2e-2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(out_p["lane_masks"]),
                                   np.asarray(out_q["lane_masks"]),
                                   rtol=2e-2, atol=5e-2)
