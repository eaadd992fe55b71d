"""End-to-end parity of the segmentation model family vs the reference
PyTorch graphs (<=1e-3, the BASELINE.json bar; we assert tighter).

Reference decoder modules are imported from /root/reference at test time;
the EfficientNet-B0 backbone uses the local torchvision-layout replica
(torchvision is not installed here). Weights are random+seeded, imported
through convert.torch_import.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from jax import lax

from autoware_vision_pilot_tpu.convert import import_state_dict
from autoware_vision_pilot_tpu.models.efficientnet import EfficientNetB0Features
from autoware_vision_pilot_tpu.models.scene_seg import SceneSegNetwork
from autoware_vision_pilot_tpu.models.scene_3d import Scene3DNetwork
from autoware_vision_pilot_tpu.models.domain_seg import DomainSegNetwork
from autoware_vision_pilot_tpu.models.ego_lanes import EgoLanesNetwork

from support.torch_b0 import TorchBackbone, randomize_bn_stats
from support.reference import load_standalone

P = lax.Precision.HIGHEST
ATOL = 2e-4


def nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


def build_torch_composite(parts: dict):
    class Composite(torch.nn.Module):
        def __init__(self):
            super().__init__()
            for name, mod in parts.items():
                setattr(self, name, mod)
    m = Composite()
    randomize_bn_stats(m, seed=7)
    m.eval()
    return m


def run_parity(torch_model, torch_forward, flax_model, x_t, atol=ATOL):
    with torch.no_grad():
        y_t = torch_forward(torch_model, x_t)
    x_j = nhwc(x_t)
    var = flax_model.init(jax.random.key(0), x_j)
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    var = import_state_dict(var, sd)
    y_j = flax_model.apply(var, x_j)
    if isinstance(y_t, (list, tuple)):
        for a, b in zip(y_t, y_j):
            np.testing.assert_allclose(nchw(b), a.numpy(), atol=atol, rtol=1e-3)
    else:
        np.testing.assert_allclose(nchw(y_j), y_t.numpy(), atol=atol, rtol=1e-3)


def test_backbone_parity():
    torch.manual_seed(0)
    tb = TorchBackbone()
    randomize_bn_stats(tb, seed=3)
    tb.eval()
    x = torch.randn(1, 3, 64, 128)
    with torch.no_grad():
        feats_t = tb(x)
    mod = EfficientNetB0Features(precision=P)
    var = mod.init(jax.random.key(0), nhwc(x))
    sd = {k[len("encoder."):]: v.numpy() for k, v in tb.state_dict().items()}
    # our converter expects the wrapper layout: re-prefix as encoder.*
    sd = {f"encoder.{k}": v for k, v in sd.items()}
    var = import_state_dict(var, sd)
    feats_j = mod.apply(var, nhwc(x))
    assert [f.shape[-1] for f in feats_j] == [32, 24, 40, 80, 1280]
    for a, b in zip(feats_t, feats_j):
        np.testing.assert_allclose(nchw(b), a.numpy(), atol=1e-4, rtol=1e-3)


@pytest.mark.ref_parity
def test_scene_seg_parity():
    torch.manual_seed(1)
    sc = load_standalone("scene_context")
    sn = load_standalone("scene_neck")
    sh = load_standalone("scene_seg_head")
    m = build_torch_composite({
        "Backbone": TorchBackbone(),
        "SceneContext": sc.SceneContext(),
        "SceneNeck": sn.SceneNeck(),
        "SceneSegHead": sh.SceneSegHead(),
    })

    def fwd(m, x):
        feats = m.Backbone(x)
        ctx = m.SceneContext(feats[4])
        neck = m.SceneNeck(ctx, feats)
        return m.SceneSegHead(neck, feats)

    x = torch.randn(1, 3, 320, 640)
    run_parity(m, fwd, SceneSegNetwork(precision=P), x)


@pytest.mark.ref_parity
def test_scene_3d_parity():
    torch.manual_seed(2)
    dc = load_standalone("depth_context")
    dn = load_standalone("scene_3d_neck")
    dh = load_standalone("scene_3d_head")
    bb = TorchBackbone()

    class PTB(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.pretrainedBackBone = bb

        def forward(self, x):
            return self.pretrainedBackBone(x)

    m = build_torch_composite({
        "PreTrainedBackbone": PTB(),
        "DepthContext": dc.DepthContext(),
        "DepthNeck": dn.Scene3DNeck(),
        "SuperDepthHead": dh.Scene3DHead(),
    })

    def fwd(m, x):
        feats = m.PreTrainedBackbone(x)
        ctx = m.DepthContext(feats[4])
        neck = m.DepthNeck(ctx, feats)
        return m.SuperDepthHead(neck, feats)

    x = torch.randn(1, 3, 320, 640)
    run_parity(m, fwd, Scene3DNetwork(precision=P), x)


@pytest.mark.ref_parity
def test_domain_seg_parity():
    torch.manual_seed(3)
    sc = load_standalone("scene_context")
    sn = load_standalone("scene_neck")
    dh = load_standalone("domain_seg_head")
    bb = TorchBackbone()

    class Upstream(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.pretrainedBackBone = bb
            self.pretrainedContext = sc.SceneContext()
            self.pretrainedNeck = sn.SceneNeck()

        def forward(self, x):
            feats = self.pretrainedBackBone(x)
            ctx = self.pretrainedContext(feats[4])
            return self.pretrainedNeck(ctx, feats), feats

    m = build_torch_composite({
        "DomainSegUpstream": Upstream(),
        "DomainSegHead": dh.DomainSegHead(),
    })

    def fwd(m, x):
        neck, feats = m.DomainSegUpstream(x)
        return m.DomainSegHead(neck, feats)

    x = torch.randn(1, 3, 320, 640)
    run_parity(m, fwd, DomainSegNetwork(precision=P), x)


@pytest.mark.ref_parity
def test_ego_lanes_parity():
    torch.manual_seed(4)
    ff = load_standalone("backbone_feature_fusion")
    ac = load_standalone("auto_steer_context")
    en = load_standalone("ego_path_neck")
    eh = load_standalone("ego_lanes_head")
    m = build_torch_composite({
        "BEVBackbone": TorchBackbone(),
        "BackboneFeatureFusion": ff.BackboneFeatureFusion(),
        "AutoSteerContext": ac.AutoSteerContext(),
        "EgopathNeck": en.EgoPathNeck(),
        "EgoLanesHead": eh.EgoLanesHead(),
    })

    def fwd(m, x):
        feats = m.BEVBackbone(x)
        fused = m.BackboneFeatureFusion(feats)
        ctx = m.AutoSteerContext(fused)
        neck = m.EgopathNeck(ctx, feats)
        return m.EgoLanesHead(neck)

    x = torch.randn(1, 3, 320, 640)
    run_parity(m, fwd, EgoLanesNetwork(precision=P), x)
