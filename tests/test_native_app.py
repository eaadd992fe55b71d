"""Python-free deployment loop e2e (reference deployable unit:
VisionPilot/production_release/main.cpp:1543-1959 — capture -> engines ->
SHM publisher, no Python).

Chain proved here on a tiny stateful step (so it runs in seconds on CPU;
the full lateral bundle goes through the same exporter via
tools/export_native_app.py):

  export/native_app.export_native_app (state pytree -> f32 wire tensors,
  XlaCallModule GraphDef)  ->  host/tools/visionpilot_app.cpp loop
  (TF C API, state tensors fed back between iterations)  ->
  /­shm seqlock publisher advancing frame ids.

The tiny step's state deliberately mirrors the real LateralState's dtype
variety — f32 vector, int32 counter, bool flag, PRNG key — so the wire
encode/decode (bitcast for int/key, cast for bool) is covered, and the
trajectory check (final scalars after N state-carried frames) fails if
ANY leaf is not fed back bit-correctly.
"""
from __future__ import annotations

import pathlib
import shutil
import subprocess
import time

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
TF_DIR = pathlib.Path("/opt/venv/lib/python3.12/site-packages/tensorflow")

pytestmark = pytest.mark.slow

FRAME_SHAPE = (8, 16, 3)
N_FRAMES = 4


def _have_toolchain():
    return (shutil.which("cmake") and shutil.which("ninja")
            and (TF_DIR / "libtensorflow_cc.so.2").exists())


@pytest.fixture(scope="module")
def app_build(tmp_path_factory):
    if not _have_toolchain():
        pytest.skip("cmake/ninja/libtensorflow_cc not available")
    build = tmp_path_factory.mktemp("host_build")
    subprocess.run(
        ["cmake", "-S", str(REPO / "host"), "-B", str(build), "-G",
         "Ninja", f"-DTF_DIR={TF_DIR}"],
        check=True, capture_output=True)
    subprocess.run(["ninja", "-C", str(build), "visionpilot_app",
                    "avp_host"], check=True, capture_output=True)
    return build


def _tiny_step():
    """Stateful per-frame step with the LateralState dtype variety."""
    import jax
    import jax.numpy as jnp

    def step(frame_u8, state):
        m = frame_u8.astype(jnp.float32).mean() / 255.0
        feat = frame_u8.astype(jnp.float32).mean(axis=(0, 1)) / 255.0  # (3,)
        ema = 0.9 * state["ema"] + 0.1 * jnp.concatenate([feat, m[None]])
        count = state["count"] + 1
        valid = ema[0] > 0.05
        key, sub = jax.random.split(state["key"])
        noise = jax.random.normal(sub, ())
        scalars = jnp.concatenate([
            ema, count.astype(jnp.float32)[None], valid.astype(
                jnp.float32)[None], m[None], noise[None]])       # (8,)
        coeffs = ema[:3][:, None] * jnp.arange(6, dtype=jnp.float32)[None]
        return {"scalars": scalars, "coeffs": coeffs}, {
            "ema": ema, "count": count, "valid": valid, "key": key}

    import jax.numpy as jnp
    init = {"ema": jnp.zeros(4, jnp.float32),
            "count": jnp.int32(0),
            "valid": jnp.bool_(False),
            "key": __import__("jax").random.key(7)}
    return step, init


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    from autoware_vision_pilot_tpu.export.native_app import export_native_app
    out = tmp_path_factory.mktemp("bundle")
    step, init = _tiny_step()
    export_native_app(step, init, FRAME_SHAPE, out, name="tiny")
    export_native_app(_tiny_detector(), (), FRAME_SHAPE, out,
                      name="tinylon",
                      outputs_from=lambda o: [o["dets"]])

    rng = np.random.default_rng(3)
    stack = rng.integers(0, 256, (N_FRAMES, *FRAME_SHAPE), dtype=np.uint8)
    np.save(out / "stack.npy", stack)

    # Python-side golden trajectory: the C++ loop runs the probe frame as
    # iteration 0 (--golden), then the stack — same order here.
    import jax.numpy as jnp
    probe = np.load(out / "tiny_probe_frame.npy")
    state = init
    final = None
    for f in [probe, *stack]:
        outp, state = step(jnp.asarray(f), state)
        final = np.asarray(outp["scalars"])
    return out, final


def _tiny_detector():
    """Stateless per-frame detection step: one moving class-1 box whose
    geometry tracks the frame content, emitted in the device-NMS
    (max_det, 7) [x1,y1,x2,y2,score,class,valid] table layout."""
    import jax.numpy as jnp

    def step(frame_u8, state):
        m = frame_u8.astype(jnp.float32).mean() / 255.0   # varies per frame
        x1 = 2.0 + 4.0 * m
        y1 = 1.0 + 3.0 * m
        row = jnp.stack([x1, y1, x1 + 6.0, y1 + 4.0,
                         jnp.float32(0.9), jnp.float32(1.0),
                         jnp.float32(1.0)])
        table = jnp.zeros((4, 7), jnp.float32).at[0].set(row)
        return {"dets": table}, state

    return step


def test_native_app_golden_and_trajectory(app_build, bundle, tmp_path):
    """One process run: golden first-frame parity + N state-carried
    frames; the dumped final scalars must match the Python trajectory."""
    out, final_py = bundle
    dump = tmp_path / "final.npy"
    r = subprocess.run(
        [str(app_build / "visionpilot_app"), str(out), "tiny",
         "--frames", str(out / "stack.npy"), "--golden",
         "--max-frames", str(N_FRAMES),
         "--state-shm", "/avp_nativeapp_t1",
         "--dump", str(dump)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "golden probe: max|diff|" in r.stderr
    final_cpp = np.load(dump)
    # count (int32 bitcast round-trip) must be EXACT: probe + N frames
    assert final_cpp[4] == N_FRAMES + 1
    np.testing.assert_allclose(final_cpp, final_py, rtol=1e-4, atol=1e-4)


def test_native_app_publishes_advancing_frames(app_build, bundle):
    """While the binary loops over frames, the /shm segment shows
    monotonically advancing frame ids (the reference's shm_reader smoke,
    production_release/tools/)."""
    from autoware_vision_pilot_tpu.host.shm import SharedStateReader
    import autoware_vision_pilot_tpu.host.shm as shm_mod
    if app_build / "libavp_host.so" not in shm_mod._LIB_PATHS:
        shm_mod._LIB_PATHS.append(app_build / "libavp_host.so")
    if shm_mod._load_lib() is None:
        pytest.skip("libavp_host.so not built")

    out, _ = bundle
    seg = "/avp_nativeapp_t2"
    proc = subprocess.Popen(
        [str(app_build / "visionpilot_app"), str(out), "tiny",
         "--frames", str(out / "stack.npy"),
         "--max-frames", "2000000", "--state-shm", seg],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        reader = None
        deadline = time.time() + 120
        seen = []
        while time.time() < deadline and len(seen) < 3:
            if reader is None:
                try:
                    reader = SharedStateReader(seg)
                except RuntimeError:
                    time.sleep(0.2)
                    continue
            fn = reader.read().frame_number
            if fn and (not seen or fn > seen[-1]):
                seen.append(fn)
            time.sleep(0.05)
        assert len(seen) >= 3, f"frame ids did not advance: {seen}"
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_native_app_longitudinal_full_pod(app_build, bundle):
    """--lon mode: the detection bundle + native ObjectFinder/RSS/PID run
    in-process and the published POD's longitudinal fields advance —
    zero Python in the deployed process (VERDICT r4 item 4; reference
    main.cpp:662-785 + visionpilot_shared_state.hpp:34-85)."""
    from autoware_vision_pilot_tpu.host.shm import SharedStateReader
    import autoware_vision_pilot_tpu.host.shm as shm_mod
    if app_build / "libavp_host.so" not in shm_mod._LIB_PATHS:
        shm_mod._LIB_PATHS.append(app_build / "libavp_host.so")
    if shm_mod._load_lib() is None:
        pytest.skip("libavp_host.so not built")

    out, _ = bundle
    seg = "/avp_nativeapp_t3"
    proc = subprocess.Popen(
        [str(app_build / "visionpilot_app"), str(out), "tiny",
         "--lon", "tinylon", "--frames", str(out / "stack.npy"),
         "--ego-speed", "12.5",
         "--max-frames", "2000000", "--state-shm", seg],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        reader = None
        deadline = time.time() + 180
        snaps = []
        while time.time() < deadline and len(snaps) < 6:
            if reader is None:
                try:
                    reader = SharedStateReader(seg)
                except RuntimeError:
                    time.sleep(0.2)
                    continue
            st = reader.read()
            if st.frame_number and (not snaps or
                                    st.frame_number > snaps[-1][0]):
                snaps.append((st.frame_number, st.cipo_exists,
                              st.cipo_distance_m, st.ideal_speed_ms,
                              st.control_effort_ms2, st.ego_speed_ms,
                              st.safe_distance_m))
            time.sleep(0.02)
        assert len(snaps) >= 6, f"state did not advance: {snaps}"
        live = [s for s in snaps if s[1]]          # cipo_exists snapshots
        assert live, f"CIPO never appeared: {snaps}"
        assert all(s[2] > 0 for s in live)         # distance populated
        assert any(abs(s[4]) > 0 for s in live)    # PI effort nonzero
        assert all(abs(s[5] - 12.5) < 1e-9 for s in snaps)  # ego speed
        assert all(s[6] >= 5.0 for s in live)      # RSS floor respected
        # the moving box + Kalman must actually CHANGE the distance
        assert len({round(s[2], 6) for s in live}) >= 2, live
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_native_app_can_replay(app_build, bundle, tmp_path):
    """--can <log.asc>: the native CAN reader feeds ego speed/steering
    into the published POD (reference can_interface.cpp 0xA1/0xA4
    contract; same .asc format drivers/can_interface.py replays)."""
    from autoware_vision_pilot_tpu.host.shm import SharedStateReader
    import autoware_vision_pilot_tpu.host.shm as shm_mod
    if app_build / "libavp_host.so" not in shm_mod._LIB_PATHS:
        shm_mod._LIB_PATHS.append(app_build / "libavp_host.so")
    if shm_mod._load_lib() is None:
        pytest.skip("libavp_host.so not built")

    # speed 15.00 m/s = 1500 * 0.01 -> LE DC 05; steering -12.5 deg =
    # -125 * 0.1 -> LE 83 FF
    asc = tmp_path / "log.asc"
    asc.write_text(
        "0.000 1 A1 Rx d 8 DC 05 00 00 00 00 00 00\n"
        "0.001 1 A4 Rx d 8 83 FF 00 00 00 00 00 00\n")
    out, _ = bundle
    seg = "/avp_nativeapp_t4"
    proc = subprocess.Popen(
        [str(app_build / "visionpilot_app"), str(out), "tiny",
         "--lon", "tinylon", "--can", str(asc),
         "--frames", str(out / "stack.npy"),
         "--max-frames", "2000000", "--state-shm", seg],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        reader = None
        deadline = time.time() + 120
        got = None
        while time.time() < deadline:
            if reader is None:
                try:
                    reader = SharedStateReader(seg)
                except RuntimeError:
                    time.sleep(0.2)
                    continue
            st = reader.read()
            if st.can_valid and st.frame_number > 2:
                got = st
                break
            time.sleep(0.05)
        assert got is not None, "CAN state never became valid"
        assert abs(got.ego_speed_ms - 15.0) < 1e-9
        assert abs(got.ego_steering_angle_deg - (-12.5)) < 1e-9
        # planner must consume the CAN speed: cruise set-speed = v + 0.5
        assert got.ideal_speed_ms <= 15.5 + 1e-9
    finally:
        proc.terminate()
        proc.wait(timeout=30)
