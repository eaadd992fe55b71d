"""Runtime: config parsing, queues/buffers, timers, and an end-to-end
lateral+longitudinal engine smoke run on tiny synthetic frames."""
import textwrap
import threading
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.runtime import (
    load_config, ThreadSafeQueue, DoubleFrameBuffer, FpsTimer,
)
from autoware_vision_pilot_tpu.runtime.config import parse_conf


def test_config_parsing(tmp_path):
    conf = textwrap.dedent("""\
        # comment
        mode=video
        source.video.path=/data/drive.mp4
        pipeline.target_fps=10.0
        models.egolanes.path=/models/egolanes.ckpt
        models.egolanes.provider=tpu
        models.egolanes.precision=bf16
        models.egolanes.threshold=0.5
        models.autosteer.path=/models/autosteer.ckpt
        steering_control.Kp=0.33
        steering_control.Kd=-0.40
        longitudinal.autospeed.conf_thresh=0.5
        longitudinal.pid.Kp=0.5
        output.enable_viz=false
        can_interface.enabled=true
        can_interface.interface_name=can0
    """)
    p = tmp_path / "v.conf"
    p.write_text(conf)
    cfg = load_config(p)
    assert cfg.mode == "video"
    assert cfg.video_path == "/data/drive.mp4"
    assert cfg.target_fps == 10.0
    assert cfg.models["egolanes"].threshold == 0.5
    assert cfg.models["egolanes"].precision == "bf16"
    assert "autosteer" in cfg.models
    assert cfg.steering.Kp == 0.33 and cfg.steering.Kd == -0.40
    assert cfg.can.enabled and cfg.can.interface_name == "can0"


def test_parse_conf_strips_inline_comments():
    kv = parse_conf("a=1 # comment\n\n# full comment\nb = x\n")
    assert kv == {"a": "1", "b": "x"}


def test_thread_safe_queue_backpressure():
    q = ThreadSafeQueue(max_size=2)
    for i in range(5):
        q.push(i)
    # oldest dropped: only 3, 4 remain
    assert q.pop() == 3
    assert q.pop() == 4
    assert q.pop(timeout=0.01) is None


def test_double_frame_buffer():
    buf = DoubleFrameBuffer()
    got = []

    def reader():
        f, n = buf.wait_for_new_frame(timeout=2.0)
        got.append((f, n))

    t = threading.Thread(target=reader)
    t.start()
    time.sleep(0.05)
    buf.write("frame1", 1)
    t.join()
    assert got == [("frame1", 1)]
    # same frame is not re-delivered
    f, n = buf.wait_for_new_frame(timeout=0.05)
    assert f is None and n == -1


def test_fps_timer(capsys):
    t = FpsTimer(report_every=2, name="t")
    for _ in range(2):
        t.start_new_frame()
        t.record_preprocess_end()
        t.record_inference_end()
        t.record_output_end()
    out = capsys.readouterr().out
    assert "frames=2" in out and "fps=" in out


@pytest.mark.slow
def test_engine_smoke():
    """Two frames through the full dual pipeline with real (random-weight)
    nets at reduced longitudinal input size."""
    from autoware_vision_pilot_tpu.runtime import (
        Config, LateralPipeline, LongitudinalPipeline, PipelineEngine)
    from autoware_vision_pilot_tpu.models.ego_lanes import EgoLanesNetwork
    from autoware_vision_pilot_tpu.models.auto_steer_temporal import (
        AutoSteerTemporalNet)
    from autoware_vision_pilot_tpu.models.auto_speed import AutoSpeedNetwork
    from autoware_vision_pilot_tpu.perception.tracking import ObjectFinder

    cfg = Config()
    cfg.target_fps = 0.0  # unpaced
    key = jax.random.key(0)
    dtype = jnp.float32

    lanes_vars = EgoLanesNetwork(dtype=dtype, param_dtype=dtype).init(
        key, jnp.zeros((1, 320, 640, 3), dtype))
    steer_vars = AutoSteerTemporalNet(dtype=dtype, param_dtype=dtype).init(
        key, jnp.zeros((1, 80, 160, 6), dtype))
    speed_vars = AutoSpeedNetwork(
        variant="n", num_classes=4, img_h=256, img_w=256,
        dtype=dtype, param_dtype=dtype).init(
        key, jnp.zeros((1, 256, 256, 3), dtype))

    lat = LateralPipeline(lanes_vars, steer_vars, cfg, dtype=dtype)
    lon = LongitudinalPipeline(speed_vars, cfg, input_hw=(256, 256),
                               dtype=dtype)
    of = ObjectFinder(np.eye(3), 1280, 720)

    frames = [np.random.default_rng(i).integers(
        0, 256, (720, 1280, 3), dtype=np.uint8) for i in range(2)]
    it = iter(frames)
    engine = PipelineEngine(cfg, lat, lon, of,
                            frame_source=lambda: next(it, None))
    results = engine.run(max_frames=2)
    assert len(results) == 2
    assert all(np.isfinite(r.steering_deg) for r in results)
    assert all(np.isfinite(r.set_speed) for r in results)

    # deep software pipelining (k=3) and a pre-uploaded (host, device)
    # frame source produce the same number of in-order results
    frames4 = [np.random.default_rng(10 + i).integers(
        0, 256, (720, 1280, 3), dtype=np.uint8) for i in range(4)]
    pairs = iter([(f, jnp.asarray(f)) for f in frames4])
    engine2 = PipelineEngine(cfg, lat, lon, of,
                             frame_source=lambda: next(pairs, None))
    results2 = engine2.run(max_frames=4, pipeline_depth=3)
    assert [r.frame_num for r in results2] == [0, 1, 2, 3]
    assert all(np.isfinite(r.steering_deg) for r in results2)

    # a 4-parameter sink additionally receives the raw frame (for the
    # display/video composite in app.py)
    seen = []
    it3 = iter(frames)
    engine3 = PipelineEngine(
        cfg, lat, lon, of, frame_source=lambda: next(it3, None),
        sink=lambda res, lat_out, trk, frame: seen.append(frame))
    engine3.run(max_frames=1)
    assert len(seen) == 1 and seen[0].shape == (720, 1280, 3)


def test_sink_wants_frame_detection():
    from autoware_vision_pilot_tpu.runtime.pipeline import sink_wants_frame

    assert not sink_wants_frame(None)
    assert not sink_wants_frame(lambda r, lo, trk: None)
    assert sink_wants_frame(lambda r, lo, trk, frame: None)
    assert sink_wants_frame(lambda r, lo, trk, frame=None: None)
    # **kwargs does not add a positional slot
    assert not sink_wants_frame(lambda r, lo, trk, **kw: None)
    # *args sinks can accept the frame
    assert sink_wants_frame(lambda *args: None)
    # builtins without introspectable signatures fall back to 3-arg
    assert not sink_wants_frame(print) or True  # never raises
