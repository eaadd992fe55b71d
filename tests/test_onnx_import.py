"""ONNX artifact import: the reference's real weight-interchange contract.

The reference ships released weights as ``.onnx`` files produced by
``Models/exports/convert_pytorch_to_onnx.py`` (export_params=True, opset
18).  Neither ``onnx`` nor ``onnxruntime`` exists in this environment, so
the codec under test (convert/onnx_proto.py) is pure Python; its
wire-format bytes are validated here against ``protoc --decode_raw``
(an independent protobuf parser) and the full import path is proven at
<=1e-3 against the reference torch graphs serialized through a real
on-disk .onnx file.
"""
import shutil
import subprocess

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
import flax.linen as fnn
from jax import lax

from autoware_vision_pilot_tpu.convert import import_state_dict
from autoware_vision_pilot_tpu.convert import onnx_proto
from autoware_vision_pilot_tpu.convert.onnx_import import (
    import_onnx, load_onnx_state_dict, save_state_dict_as_onnx)
from autoware_vision_pilot_tpu.models.scene_seg import SceneSegNetwork
from autoware_vision_pilot_tpu.models.ego_lanes import EgoLanesNetwork
from autoware_vision_pilot_tpu.nn import layers as L

from support.torch_b0 import TorchBackbone, randomize_bn_stats
from support.reference import load_standalone

P = lax.Precision.HIGHEST


def nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


# --- wire format -------------------------------------------------------------

def _small_model():
    rng = np.random.default_rng(0)
    g = onnx_proto.Graph(name="g")
    for name, shape, dtype in [("a.weight", (4, 3, 3, 3), np.float32),
                               ("a.bias", (4,), np.float32),
                               ("shape_const", (2,), np.int64)]:
        arr = (rng.normal(size=shape).astype(dtype) if dtype == np.float32
               else np.array([1, 2], dtype=np.int64))
        g.initializers[name] = onnx_proto.Tensor.from_numpy(name, arr)
    g.inputs.append(onnx_proto.ValueInfo(name="input",
                                         shape=["batch_size", 3, 320, 640]))
    g.outputs.append(onnx_proto.ValueInfo(name="output",
                                          shape=["batch_size", 3, 320, 640]))
    g.nodes.append(onnx_proto.Node(op_type="Identity", name="id",
                                   inputs=["input"], outputs=["output"]))
    return onnx_proto.Model(producer_name="avp-tpu", graph=g)


def test_wire_roundtrip(tmp_path):
    m = _small_model()
    path = tmp_path / "small.onnx"
    onnx_proto.save_model(m, path)
    m2 = onnx_proto.load_model(path)
    assert m2.ir_version == m.ir_version
    assert m2.opset_version == 18
    assert m2.producer_name == "avp-tpu"
    assert set(m2.graph.initializers) == set(m.graph.initializers)
    for k in m.graph.initializers:
        np.testing.assert_array_equal(m2.graph.initializers[k].to_numpy(),
                                      m.graph.initializers[k].to_numpy())
    assert m2.graph.nodes[0].op_type == "Identity"
    assert m2.graph.inputs[0].shape == ["batch_size", 3, 320, 640]
    assert m2.graph.outputs[0].name == "output"


def test_wire_bytes_against_protoc_decode_raw(tmp_path):
    """protoc is an independent protobuf implementation: --decode_raw must
    see our field numbers (1=ir_version, 7=graph, 8=opset) and the graph's
    initializer names, proving the writer emits spec-valid wire bytes."""
    if shutil.which("protoc") is None:
        pytest.skip("protoc not installed")
    path = tmp_path / "small.onnx"
    onnx_proto.save_model(_small_model(), path)
    out = subprocess.run(["protoc", "--decode_raw"],
                         stdin=open(path, "rb"), capture_output=True,
                         text=True, check=True).stdout
    lines = [ln.strip() for ln in out.splitlines()]
    assert any(ln.startswith("1:") for ln in lines)      # ir_version
    assert any(ln.startswith("7 {") for ln in lines)     # graph
    assert any(ln.startswith("8 {") for ln in lines)     # opset_import
    assert '"a.weight"' in out and '"Identity"' in out
    assert '"batch_size"' in out                          # symbolic dim


def test_typed_float_data_parse():
    """Initializers stored as repeated float_data (not raw_data) — the
    other legal TensorProto encoding — must parse identically."""
    t = onnx_proto.Tensor(name="x", dims=(2, 3), data_type=onnx_proto.FLOAT,
                          float_data=[1.0, -2.5, 3.0, 4.0, 0.0, -1.0])
    np.testing.assert_array_equal(
        t.to_numpy(), np.array([[1, -2.5, 3], [4, 0, -1]], dtype=np.float32))
    t64 = onnx_proto.Tensor(name="y", dims=(3,), data_type=onnx_proto.INT64,
                            int64_data=[-1, 0, 7])
    np.testing.assert_array_equal(t64.to_numpy(),
                                  np.array([-1, 0, 7], dtype=np.int64))


def test_negative_int64_raw_roundtrip(tmp_path):
    arr = np.array([-5, -1, 0, 2**40], dtype=np.int64)
    g = onnx_proto.Graph(name="g")
    g.initializers["neg"] = onnx_proto.Tensor.from_numpy("neg", arr)
    path = tmp_path / "neg.onnx"
    onnx_proto.save_model(onnx_proto.Model(graph=g), path)
    got = onnx_proto.load_model(path).graph.initializers["neg"].to_numpy()
    np.testing.assert_array_equal(got, arr)


# --- end-to-end: reference graph -> .onnx file -> flax, <=1e-3 ---------------

def _composite(parts):
    class Composite(torch.nn.Module):
        def __init__(self):
            super().__init__()
            for name, mod in parts.items():
                setattr(self, name, mod)
    m = Composite()
    randomize_bn_stats(m, seed=11)
    m.eval()
    return m


@pytest.mark.ref_parity
def test_scene_seg_onnx_import_parity(tmp_path):
    """Reference SceneSeg torch graph -> serialized .onnx artifact (the
    interchange format of convert_pytorch_to_onnx.py:45-97) -> import_onnx
    -> flax forward, <=1e-3 (BASELINE bar; asserted tighter)."""
    torch.manual_seed(21)
    sc = load_standalone("scene_context")
    sn = load_standalone("scene_neck")
    sh = load_standalone("scene_seg_head")
    m = _composite({"Backbone": TorchBackbone(),
                    "SceneContext": sc.SceneContext(),
                    "SceneNeck": sn.SceneNeck(),
                    "SceneSegHead": sh.SceneSegHead()})
    x_t = torch.randn(1, 3, 320, 640)
    with torch.no_grad():
        feats = m.Backbone(x_t)
        ctx = m.SceneContext(feats[4])
        neck = m.SceneNeck(ctx, feats)
        y_t = m.SceneSegHead(neck, feats)

    path = tmp_path / "SceneSeg.onnx"
    save_state_dict_as_onnx(
        {k: v.numpy() for k, v in m.state_dict().items()}, path, "SceneSeg")

    # Re-read from disk: every byte goes through the wire codec.
    net = SceneSegNetwork(precision=P)
    var = net.init(jax.random.key(0), nhwc(x_t))
    var = import_onnx(var, path)
    y_j = net.apply(var, nhwc(x_t))
    np.testing.assert_allclose(nchw(y_j), y_t.numpy(), atol=2e-4, rtol=1e-3)


@pytest.mark.ref_parity
def test_ego_lanes_onnx_import_parity(tmp_path):
    torch.manual_seed(22)
    ff = load_standalone("backbone_feature_fusion")
    ac = load_standalone("auto_steer_context")
    en = load_standalone("ego_path_neck")
    eh = load_standalone("ego_lanes_head")
    m = _composite({"BEVBackbone": TorchBackbone(),
                    "BackboneFeatureFusion": ff.BackboneFeatureFusion(),
                    "AutoSteerContext": ac.AutoSteerContext(),
                    "EgopathNeck": en.EgoPathNeck(),
                    "EgoLanesHead": eh.EgoLanesHead()})
    x_t = torch.randn(1, 3, 320, 640)
    with torch.no_grad():
        feats = m.BEVBackbone(x_t)
        fused = m.BackboneFeatureFusion(feats)
        ctx = m.AutoSteerContext(fused)
        neck = m.EgopathNeck(ctx, feats)
        y_t = m.EgoLanesHead(neck)

    path = tmp_path / "EgoLanes.onnx"
    save_state_dict_as_onnx(
        {k: v.numpy() for k, v in m.state_dict().items()}, path, "EgoLanes")
    net = EgoLanesNetwork(precision=P)
    var = net.init(jax.random.key(0), nhwc(x_t))
    var = import_onnx(var, path)
    y_j = net.apply(var, nhwc(x_t))
    np.testing.assert_allclose(nchw(y_j), y_t.numpy(), atol=2e-4, rtol=1e-3)


# --- constant-folded exports (do_constant_folding=True) ----------------------

class _TinyTorch(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 8, 3, padding=1)
        self.bn1 = torch.nn.BatchNorm2d(8)
        self.conv2 = torch.nn.Conv2d(8, 4, 1)

    def forward(self, x):
        return self.conv2(torch.nn.functional.silu(self.bn1(self.conv1(x))))


class _TinyFlax(fnn.Module):
    @fnn.compact
    def __call__(self, x):
        x = L.Conv2d(8, 3, padding=1, precision=P, name="conv1")(x)
        x = L.BatchNorm2d(name="bn1")(x)
        x = L.silu(x)
        return L.Conv2d(4, 1, precision=P, name="conv2")(x)


def test_folded_bn_onnx_import(tmp_path):
    """The reference exports with do_constant_folding=True, which fuses BN
    into the preceding conv and drops the BN initializers.  Emulate that
    fold (the standard w' = w*g/sqrt(v+eps) rewrite) and check import_onnx
    fills identity BN and still matches the torch eval forward <=1e-3."""
    torch.manual_seed(33)
    m = _TinyTorch()
    randomize_bn_stats(m, seed=5)
    m.eval()
    sd = {k: v.numpy().copy() for k, v in m.state_dict().items()}

    eps = m.bn1.eps
    g_ = sd["bn1.weight"] / np.sqrt(sd["bn1.running_var"] + eps)
    folded = {
        "conv1.weight": sd["conv1.weight"] * g_[:, None, None, None],
        "conv1.bias": (sd["conv1.bias"] - sd["bn1.running_mean"]) * g_
                      + sd["bn1.bias"],
        "conv2.weight": sd["conv2.weight"],
        "conv2.bias": sd["conv2.bias"],
    }
    path = tmp_path / "tiny_folded.onnx"
    save_state_dict_as_onnx(folded, path, "Tiny",
                            io=((("input", ("batch_size", 3, 16, 32)),),
                                (("output", ("batch_size", 4, 16, 32)),)))

    x_t = torch.randn(1, 3, 16, 32)
    with torch.no_grad():
        y_t = m(x_t)
    net = _TinyFlax()
    var = net.init(jax.random.key(0), nhwc(x_t))
    var = import_onnx(var, path)
    y_j = net.apply(var, nhwc(x_t))
    np.testing.assert_allclose(nchw(y_j), y_t.numpy(), atol=1e-4, rtol=1e-3)


def test_folded_import_fails_on_missing_conv(tmp_path):
    """Missing *conv* weights must still raise — identity-BN fill only
    covers folded normalization, never core weights."""
    torch.manual_seed(34)
    m = _TinyTorch()
    m.eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()
          if not k.startswith("conv2")}
    path = tmp_path / "broken.onnx"
    save_state_dict_as_onnx(sd, path, "Tiny",
                            io=((("input", ("batch_size", 3, 16, 32)),),
                                (("output", ("batch_size", 4, 16, 32)),)))
    net = _TinyFlax()
    var = net.init(jax.random.key(0), jnp.zeros((1, 16, 32, 3)))
    with pytest.raises(KeyError):
        import_onnx(var, path)


def test_load_onnx_state_dict_filters_nothing(tmp_path):
    """load_onnx_state_dict is the raw view: every initializer, including
    exporter shape constants, comes back as numpy."""
    path = tmp_path / "small.onnx"
    onnx_proto.save_model(_small_model(), path)
    sd = load_onnx_state_dict(path)
    assert set(sd) == {"a.weight", "a.bias", "shape_const"}
    assert sd["shape_const"].dtype == np.int64


# --- real-exporter artifacts: mangled 'onnx::Conv_*' initializer names -------

class _SeqTorch(torch.nn.Module):
    """Bias-free Conv + BN as Sequential indices — the reference's
    ubiquitous block shape (torch_b0 style), where Conv+BN fusion grafts
    a bias onto a conv that has no bias leaf in the flax mirror."""

    def __init__(self):
        super().__init__()
        self.features = torch.nn.Sequential(
            torch.nn.Conv2d(3, 8, 3, padding=1, bias=False),
            torch.nn.BatchNorm2d(8),
            torch.nn.SiLU(),
            torch.nn.Conv2d(8, 4, 1, bias=False),
            torch.nn.BatchNorm2d(4),
        )

    def forward(self, x):
        return self.features(x)


class _SeqFlax(fnn.Module):
    @fnn.compact
    def __call__(self, x):
        x = L.Conv2d(8, 3, padding=1, use_bias=False, precision=P,
                     name="features_0")(x)
        x = L.BatchNorm2d(name="features_1")(x)
        x = L.silu(x)
        x = L.Conv2d(4, 1, use_bias=False, precision=P, name="features_3")(x)
        return L.BatchNorm2d(name="features_4")(x)


def _fold_conv_bn(w, bn_w, bn_b, bn_m, bn_v, eps, conv_b=None):
    g = bn_w / np.sqrt(bn_v + eps)
    b0 = conv_b if conv_b is not None else np.zeros_like(bn_b)
    return w * g[:, None, None, None], (b0 - bn_m) * g + bn_b


def _write_folded_ts_export(m, path):
    """Emit the .onnx a real `torch.onnx.export(..., do_constant_folding=
    True)` produces for _SeqTorch: BN nodes gone (eval-peephole Conv+BN
    fusion), fused weights under mangled 'onnx::Conv_<idx>' names, Conv
    nodes keeping their module-scope names."""
    sd = {k: v.numpy().copy() for k, v in m.state_dict().items()}
    eps = m.features[1].eps
    w1, b1 = _fold_conv_bn(sd["features.0.weight"], sd["features.1.weight"],
                           sd["features.1.bias"], sd["features.1.running_mean"],
                           sd["features.1.running_var"], eps)
    w2, b2 = _fold_conv_bn(sd["features.3.weight"], sd["features.4.weight"],
                           sd["features.4.bias"], sd["features.4.running_mean"],
                           sd["features.4.running_var"], eps)
    g = onnx_proto.Graph(name="main_graph")
    for name, arr in [("onnx::Conv_21", w1), ("onnx::Conv_22", b1),
                      ("onnx::Conv_24", w2), ("onnx::Conv_25", b2)]:
        g.initializers[name] = onnx_proto.Tensor.from_numpy(
            name, arr.astype(np.float32))
    g.inputs.append(onnx_proto.ValueInfo(name="input",
                                         shape=["batch_size", 3, 16, 32]))
    g.outputs.append(onnx_proto.ValueInfo(name="output",
                                          shape=["batch_size", 4, 16, 32]))
    g.nodes += [
        onnx_proto.Node(op_type="Conv", name="/features/features.0/Conv",
                        inputs=["input", "onnx::Conv_21", "onnx::Conv_22"],
                        outputs=["/features/features.0/Conv_output_0"]),
        onnx_proto.Node(op_type="Sigmoid", name="/features/features.2/Sigmoid",
                        inputs=["/features/features.0/Conv_output_0"],
                        outputs=["/features/features.2/Sigmoid_output_0"]),
        onnx_proto.Node(op_type="Mul", name="/features/features.2/Mul",
                        inputs=["/features/features.0/Conv_output_0",
                                "/features/features.2/Sigmoid_output_0"],
                        outputs=["/features/features.2/Mul_output_0"]),
        onnx_proto.Node(op_type="Conv", name="/features/features.3/Conv",
                        inputs=["/features/features.2/Mul_output_0",
                                "onnx::Conv_24", "onnx::Conv_25"],
                        outputs=["output"]),
    ]
    onnx_proto.save_model(onnx_proto.Model(producer_name="pytorch",
                                           producer_version="2.13.0",
                                           graph=g), path)


def test_mangled_folded_export_import(tmp_path):
    """A constant-folded TS-exporter artifact (mangled 'onnx::Conv_*'
    initializers, module-scope node names, BN folded away, fused bias on a
    conv whose flax mirror is bias-free) must import via graph-topology
    recovery and match the torch eval forward <=1e-3
    (reference exporter: Models/exports/convert_pytorch_to_onnx.py:45-97)."""
    torch.manual_seed(44)
    m = _SeqTorch()
    randomize_bn_stats(m, seed=6)
    m.eval()
    path = tmp_path / "seq_folded.onnx"
    _write_folded_ts_export(m, path)

    x_t = torch.randn(1, 3, 16, 32)
    with torch.no_grad():
        y_t = m(x_t)
    net = _SeqFlax()
    var = net.init(jax.random.key(0), nhwc(x_t))
    var = import_onnx(var, path)
    y_j = net.apply(var, nhwc(x_t))
    np.testing.assert_allclose(nchw(y_j), y_t.numpy(), atol=1e-4, rtol=1e-3)


def test_qual_from_node_name():
    from autoware_vision_pilot_tpu.convert.onnx_import import (
        _qual_from_node_name)
    assert _qual_from_node_name(
        "/Backbone/encoder/encoder.0/encoder.0.0/Conv") == "Backbone.encoder.0.0"
    assert _qual_from_node_name("/features/features.0/Conv") == "features.0"
    assert _qual_from_node_name("/conv1/Conv") == "conv1"
    assert _qual_from_node_name("/Conv") == ""
    assert _qual_from_node_name("") is None
    assert _qual_from_node_name("Constant_3") is None
    assert _qual_from_node_name(
        "/encoder/layer1/layer1.0/conv1/Conv") == "encoder.layer1.0.conv1"


def test_real_torch_onnx_export_roundtrip(tmp_path):
    """CI-tier proof: a GENUINE torch.onnx.export artifact (both folded and
    unfolded) loads through import_onnx and matches the torch eval forward
    <=1e-3.  Locally this skips when the 'onnx' package is absent (the TS
    exporter requires it); CI installs onnx so the real exporter's naming
    (incl. 'onnx::Conv_*' fusion mangling) is exercised for real."""
    pytest.importorskip("onnx")
    torch.manual_seed(45)
    m = _SeqTorch()
    randomize_bn_stats(m, seed=7)
    m.eval()
    x_t = torch.randn(1, 3, 16, 32)
    with torch.no_grad():
        y_t = m(x_t)
    for fold in (False, True):
        path = tmp_path / f"seq_fold{int(fold)}.onnx"
        torch.onnx.export(m, (x_t,), str(path), export_params=True,
                          opset_version=18, do_constant_folding=fold,
                          input_names=["input"], output_names=["output"],
                          dynamic_axes={"input": {0: "batch_size"},
                                        "output": {0: "batch_size"}},
                          dynamo=False)
        net = _SeqFlax()
        var = net.init(jax.random.key(1), nhwc(x_t))
        var = import_onnx(var, path)
        y_j = net.apply(var, nhwc(x_t))
        np.testing.assert_allclose(nchw(y_j), y_t.numpy(), atol=1e-3,
                                   rtol=1e-3, err_msg=f"fold={fold}")
        try:
            import onnxruntime as ort
        except ImportError:
            continue
        sess = ort.InferenceSession(str(path),
                                    providers=["CPUExecutionProvider"])
        y_ort = sess.run(None, {"input": x_t.numpy()})[0]
        np.testing.assert_allclose(nchw(y_j), y_ort, atol=1e-3, rtol=1e-3,
                                   err_msg=f"ort fold={fold}")
