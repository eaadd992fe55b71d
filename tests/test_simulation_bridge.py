"""StatePublisherBridge: SHM -> transport republishing."""
import pathlib
import threading
import time

import pytest

LIB = pathlib.Path(__file__).resolve().parents[1] / "host" / "build" / \
    "libavp_host.so"

pytestmark = pytest.mark.skipif(not LIB.exists(),
                                reason="host shim not built")


def test_state_publisher_bridge():
    from autoware_vision_pilot_tpu.host import (
        SharedStatePublisher, VisionPilotStateStruct)
    from autoware_vision_pilot_tpu.middleware import InProcTransport
    from autoware_vision_pilot_tpu.simulation import StatePublisherBridge

    got = []
    t = InProcTransport()
    t.subscribe("/visionpilot/state", got.append)

    with SharedStatePublisher("/avp_test_bridge") as pub:
        bridge = StatePublisherBridge(t, rate_hz=200,
                                      shm_name="/avp_test_bridge")
        th = threading.Thread(target=bridge.spin, kwargs={"max_messages": 3})
        th.start()
        s = VisionPilotStateStruct()
        for i in range(1, 4):
            s.frame_number = i
            s.steering_pid_deg = i * 1.5
            s.fcw_active = i == 3
            pub.publish(s)
            time.sleep(0.05)
        th.join(timeout=5)
        bridge.stop()
        bridge.close()

    assert len(got) == 3
    assert got[0]["frame"] == 1 and got[0]["steering_deg"] == 1.5
    assert got[2]["fcw"] is True
