"""Fleet serving invariants at the compile-cheap tier (VERDICT r3 item 9).

Runs the identical runtime/fleet.py code path as tests/test_fleet.py
(marked heavy there: full-size EgoLanes compiles ~13 min on a 1-CPU
host) with the dryrun-depth EgoLanes at 96x192 and abstractly-sampled
params (jax.eval_shape: no forward executions at fixture time), so the
fast tier keeps fleet coverage at one small XLA compile.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


NET_HW = (96, 192)
FRAME_HW = (120, 200)
CROP_Y = 20
MASK_HW = (24, 48)


def _random_like(tree, seed):
    """Sample params from shapes only — init without running the model
    (flax init would execute every conv op-by-op on CPU)."""
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(jax.random.key(seed), len(leaves))
    out = [np.asarray(jax.random.normal(k, l.shape, jnp.float32)) * 0.1
           for k, l in zip(keys, leaves)]
    return jax.tree.unflatten(treedef, [jnp.asarray(o) for o in out])


@pytest.fixture(scope="module")
def tiny_lateral():
    from autoware_vision_pilot_tpu.models.ego_lanes import EgoLanesNetwork
    from autoware_vision_pilot_tpu.models.efficientnet import (
        B0_DRYRUN_STAGES)
    from autoware_vision_pilot_tpu.models.auto_steer_temporal import (
        AutoSteerTemporalNet)
    dtype = jnp.float32
    lanes_net = EgoLanesNetwork(dtype=dtype, param_dtype=dtype,
                                ctx_hw=(3, 6),
                                backbone_stages=B0_DRYRUN_STAGES)
    lanes_shapes = jax.eval_shape(
        lanes_net.init, jax.random.key(0),
        jax.ShapeDtypeStruct((1,) + NET_HW + (3,), dtype))
    steer_net = AutoSteerTemporalNet(dtype=dtype, param_dtype=dtype)
    steer_shapes = jax.eval_shape(
        steer_net.init, jax.random.key(0),
        jax.ShapeDtypeStruct((1,) + MASK_HW + (6,), dtype))
    return (lanes_net, _random_like(lanes_shapes, 1),
            _random_like(steer_shapes, 2))


def _fleet(tiny_lateral, n_streams, **kw):
    from autoware_vision_pilot_tpu.runtime.fleet import FleetLateralPipeline
    from autoware_vision_pilot_tpu.runtime.config import Config
    lanes_net, lanes_vars, steer_vars = tiny_lateral
    return FleetLateralPipeline(
        lanes_vars, steer_vars, Config(), n_streams,
        frame_hw=FRAME_HW, crop_y=CROP_Y, dtype=jnp.float32,
        net_hw=NET_HW, lanes_net=lanes_net, **kw)


def _frames(n_streams, n_frames, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n_frames,) + (n_streams,) + FRAME_HW + (3,),
                        dtype=np.uint8)


def test_fleet_mesh_sharded_streams_independent(tiny_lateral):
    """One compile certifies three invariants of the mesh-sharded fleet
    program: (a) it runs over the 8-virtual-device mesh and yields
    finite per-stream outputs; (b) permuting the streams (frames AND
    carried states) permutes the outputs bit-exactly and nothing else —
    any cross-stream coupling (shared RNG, state leakage, batch-coupled
    normalization) would break it; (c) temporal state carries per-stream
    across frames (the permuted run stays aligned at every t). The
    batched-vs-unbatched float-reassociation comparison (which needs
    loose tolerances through RANSAC near-tie argmax) stays in
    test_fleet.py."""
    from autoware_vision_pilot_tpu.core.mesh import make_mesh
    mesh = make_mesh()
    n = len(jax.devices())
    t = 3
    perm = np.roll(np.arange(n), 3)
    frames = _frames(n, t)
    fleet = _fleet(tiny_lateral, n, mesh=mesh)

    st_a = fleet.init_states(seed=0)
    st_b = jax.tree.map(lambda x: x[perm], fleet.init_states(seed=0))
    for i in range(t):
        out_a, st_a = fleet(jnp.asarray(frames[i]), st_a)
        out_b, st_b = fleet(jnp.asarray(frames[i][perm]), st_b)
        a = np.asarray(out_a["scalars"])
        assert a.shape == (n, 8)
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(np.asarray(out_b["scalars"]),
                                      a[perm], err_msg=f"frame {i}")
        np.testing.assert_array_equal(np.asarray(out_b["coeffs"]),
                                      np.asarray(out_a["coeffs"])[perm])


@pytest.mark.heavy
def test_fleet_pad_to_matches_unpadded_tiny(tiny_lateral):
    n, t = 3, 3
    frames = _frames(n, t, seed=7)
    plain = _fleet(tiny_lateral, n)
    padded = _fleet(tiny_lateral, n, pad_to=4)
    s_plain, s_pad = plain.init_states(0), padded.init_states(0)
    for i in range(t):
        o1, s_plain = plain(jnp.asarray(frames[i]), s_plain)
        o2, s_pad = padded(jnp.asarray(frames[i]), s_pad)
        np.testing.assert_allclose(np.asarray(o1["scalars"]),
                                   np.asarray(o2["scalars"]),
                                   rtol=1e-6, atol=1e-6)
        assert o2["scalars"].shape[0] == n
