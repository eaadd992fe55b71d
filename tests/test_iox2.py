"""iceoryx2-model zero-copy services (host/src/iox2.cpp + the three
middleware nodes): ABI sizes, in-process pub/sub semantics, the Python
Iox2Transport, and the full cross-process frame->inference->viz
pipeline with the reference's service contract
(VisionPilot/middleware_recipes/IceOryx2/README.md:6-12)."""
import ctypes
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture(scope="session")
def iox2_build(tmp_path_factory):
    if not (shutil.which("cmake") and shutil.which("ninja")):
        pytest.skip("cmake/ninja not available")
    build = tmp_path_factory.mktemp("iox2_build")
    subprocess.run(["cmake", "-S", str(REPO / "host"), "-B", str(build),
                    "-G", "Ninja"], check=True, capture_output=True)
    subprocess.run(["ninja", "-C", str(build), "avp_host",
                    "iox2_frame_node", "iox2_inference_node",
                    "iox2_viz_node"], check=True, capture_output=True)
    import autoware_vision_pilot_tpu.host.shm as shm_mod
    lib = build / "libavp_host.so"
    if lib not in shm_mod._LIB_PATHS:
        shm_mod._LIB_PATHS.insert(0, lib)
    return build


def test_abi_sizes(iox2_build, tmp_path):
    """ctypes mirrors must match the C++ PODs byte-for-byte (the wire
    contract external iceoryx2 subscribers compile against) — verified
    against the compiler, not a hand-computed layout."""
    from autoware_vision_pilot_tpu.host.iox2 import (
        CIPOMessageStruct, RawFrameStruct)
    probe = tmp_path / "probe.cpp"
    probe.write_text(
        '#include <cstdio>\n#include "transmission_data.hpp"\n'
        "int main() { std::printf(\"%zu %zu\\n\", "
        "sizeof(avp::iox2msg::RawFrame), "
        "sizeof(avp::iox2msg::CIPOMessage)); }\n")
    exe = tmp_path / "probe"
    subprocess.run(
        ["g++", "-std=c++20",
         f"-I{REPO / 'host' / 'middleware' / 'iox2'}",
         str(probe), "-o", str(exe)], check=True, capture_output=True)
    out = subprocess.run([str(exe)], check=True, capture_output=True,
                         text=True).stdout.split()
    assert ctypes.sizeof(RawFrameStruct) == int(out[0])
    assert ctypes.sizeof(CIPOMessageStruct) == int(out[1])


def test_pubsub_in_order_and_latest_wins(iox2_build):
    from autoware_vision_pilot_tpu.host.iox2 import (
        CIPOMessageStruct, Iox2Service)
    with Iox2Service("AVPTest/Cipo", CIPOMessageStruct, n_slots=4,
                     create=True) as pub:
        with Iox2Service("AVPTest/Cipo", CIPOMessageStruct,
                         create=False, timeout_ms=1000) as sub:
            # in-order delivery while the reader keeps up
            for i in range(3):
                m = pub.loan()
                m.frame_id = 100 + i
                m.exists = True
                m.distance_m = float(i)
                pub.publish()
            got = [sub.receive() for _ in range(4)]
            assert [g.frame_id for g in got[:3]] == [100, 101, 102]
            assert got[3] is None
            # overflow: publish 10 into 4 slots -> oldest dropped,
            # newest delivered, losses counted
            for i in range(10):
                m = pub.loan()
                m.frame_id = 200 + i
                pub.publish()
            seqs = []
            while (m := sub.receive()) is not None:
                seqs.append(m.frame_id)
            assert seqs[-1] == 209
            assert len(seqs) <= 4
            assert sub.samples_lost >= 6
            assert seqs == sorted(seqs)


def test_frame_roundtrip_numpy(iox2_build):
    from autoware_vision_pilot_tpu.host.iox2 import (
        Iox2Service, RawFrameStruct, publish_frame, receive_frame)
    img = np.random.default_rng(0).integers(
        0, 255, (48, 64, 3), dtype=np.uint8)
    with Iox2Service("AVPTest/Frames", RawFrameStruct, n_slots=2,
                     create=True) as pub:
        with Iox2Service("AVPTest/Frames", RawFrameStruct,
                         create=False, timeout_ms=1000) as sub:
            publish_frame(pub, img, frame_id=7)
            out, hdr = receive_frame(sub)
            assert hdr.frame_id == 7
            assert hdr.width == 64 and hdr.height == 48
            np.testing.assert_array_equal(out, img)


def test_iox2_transport(iox2_build):
    from autoware_vision_pilot_tpu.middleware.transport import (
        make_transport)
    tx = make_transport("iox2", publish_topics=["/cipo"])
    rx = make_transport("iox2")
    try:
        got = []
        rx.subscribe("/cipo", got.append)
        tx.publish("/cipo", {"frame_id": 5, "exists": True,
                             "distance_m": 12.5, "velocity_ms": -1.0,
                             "track_id": 3})
        rx.spin_once(timeout=1.0)
        assert got and got[0]["frame_id"] == 5
        assert got[0]["exists"] is True
        assert abs(got[0]["distance_m"] - 12.5) < 1e-6
    finally:
        tx.close()
        rx.close()


def test_three_node_pipeline(iox2_build, tmp_path):
    """frame_node -> inference_node -> viz_node cross-process: frame ids
    advance, CIPO distance closes as the synthetic vehicle approaches,
    steady-state IPC latency is microseconds (zero-copy)."""
    for seg in pathlib.Path("/dev/shm").glob("iox2.VisionPilot.*"):
        seg.unlink(missing_ok=True)
    csv = tmp_path / "viz.csv"
    fn = subprocess.Popen(
        [str(iox2_build / "iox2_frame_node"), "--frames", "80",
         "--fps", "60"], stdout=subprocess.DEVNULL)
    inf = subprocess.Popen(
        [str(iox2_build / "iox2_inference_node"), "--frames", "70",
         "--quiet"], stdout=subprocess.DEVNULL)
    viz = subprocess.run(
        [str(iox2_build / "iox2_viz_node"), "--frames", "40",
         "--csv", str(csv), "--quiet"], timeout=30,
        capture_output=True, text=True)
    fn.wait(timeout=10)
    inf.wait(timeout=10)
    assert viz.returncode == 0, viz.stderr
    rows = csv.read_text().strip().splitlines()
    header, body = rows[0].split(","), [r.split(",") for r in rows[1:]]
    assert len(body) >= 40
    fid = header.index("frame_id")
    dist = header.index("distance_m")
    ipc = header.index("ipc_us")
    joined = header.index("frame_seen")
    ids = [int(r[fid]) for r in body]
    assert ids == sorted(ids) and ids[-1] > ids[0]
    # the synthetic vehicle approaches: distance decreases
    assert float(body[-1][dist]) < float(body[0][dist])
    # steady-state zero-copy IPC latency is tiny (skip warm-up rows)
    steady = [float(r[ipc]) for r in body[5:]]
    assert min(steady) < 1000.0  # < 1 ms
    assert any(int(r[joined]) == 1 for r in body)


def test_second_creator_fails_loudly(iox2_build):
    """Single-writer contract: a second publisher on a live service must
    fail (O_CREAT|O_EXCL) instead of silently ftruncate+memset-wiping the
    segment under subscribers mid-copy."""
    from autoware_vision_pilot_tpu.host.iox2 import (
        CIPOMessageStruct, Iox2Service)
    with Iox2Service("AVPTest/Excl", CIPOMessageStruct, n_slots=4,
                     create=True) as pub:
        with pytest.raises(RuntimeError):
            Iox2Service("AVPTest/Excl", CIPOMessageStruct, n_slots=4,
                        create=True)
        # the failed creator must NOT have unlinked the live segment: a
        # brand-new subscriber still attaches and receives
        m = pub.loan()
        m.frame_id = 9
        pub.publish()
        sub = Iox2Service("AVPTest/Excl", CIPOMessageStruct, n_slots=4,
                          create=False, timeout_ms=2000)
        got = sub.receive()
        assert got is not None and got.frame_id == 9
        sub.close()


def test_loaned_slot_has_no_stale_bytes(iox2_build):
    """Ring slots are reused: a publish that omits fields must not leak
    the previous sample's bytes into them (transport memsets the loan)."""
    from autoware_vision_pilot_tpu.middleware.transport import (
        make_transport)
    tx = make_transport("iox2", publish_topics=["/cipo"], n_slots=1)
    rx = make_transport("iox2")
    try:
        got = []
        rx.subscribe("/cipo", got.append)
        tx.publish("/cipo", {"frame_id": 1, "exists": True,
                             "distance_m": 42.0, "track_id": 7})
        rx.spin_once(timeout=1.0)
        # second publish reuses the same slot but omits every field the
        # first one set — stale bytes would resurrect exists/distance
        tx.publish("/cipo", {"frame_id": 2})
        rx.spin_once(timeout=1.0)
        assert len(got) == 2
        assert got[1]["frame_id"] == 2
        assert got[1]["exists"] is False
        assert got[1]["distance_m"] == 0.0
        assert got[1]["track_id"] == 0
    finally:
        tx.close()
        rx.close()
