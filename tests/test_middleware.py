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
