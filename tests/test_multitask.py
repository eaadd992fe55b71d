"""Fused SharedPerceptionStack == the three separate networks, given the
same (shared-upstream) weights."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.models.scene_seg import SceneSegNetwork
from autoware_vision_pilot_tpu.models.scene_3d import Scene3DNetwork
from autoware_vision_pilot_tpu.models.domain_seg import DomainSegNetwork
from autoware_vision_pilot_tpu.models.multitask import (
    SharedPerceptionStack, import_from_individual_checkpoints)
from autoware_vision_pilot_tpu.convert.torch_import import (
    flatten_params, unflatten_params)


@pytest.mark.slow
def test_fused_stack_matches_individuals():
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 64, 128, 3)).astype(np.float32))
    kw = dict(ctx_hw=(2, 4))

    seg = SceneSegNetwork(**kw)
    seg_v = seg.init(jax.random.key(1), x)

    # Scene3D with its backbone REPLACED by SceneSeg's (the reference's
    # frozen-shared-backbone training contract)
    d3 = Scene3DNetwork(**kw)
    d3_v = d3.init(jax.random.key(2), x)
    for col in ("params", "batch_stats"):
        if "Backbone" in seg_v.get(col, {}):
            d3_v[col]["PreTrainedBackbone"]["pretrainedBackBone"] = \
                seg_v[col]["Backbone"]

    # DomainSeg upstream = SceneSeg's backbone+context+neck (only the
    # backbone has batch_stats; context/neck are BN-free)
    dm = DomainSegNetwork(**kw)
    dm_v = dm.init(jax.random.key(3), x)
    for col in ("params", "batch_stats"):
        up = dm_v[col]["DomainSegUpstream"]
        for src_name, dst_name in [("Backbone", "pretrainedBackBone"),
                                   ("SceneContext", "pretrainedContext"),
                                   ("SceneNeck", "pretrainedNeck")]:
            if src_name in seg_v.get(col, {}):
                up[dst_name] = seg_v[col][src_name]

    # reference outputs
    y_seg = seg.apply(seg_v, x)
    y_d3 = d3.apply(d3_v, x)
    y_dm = dm.apply(dm_v, x)

    # fused stack with merged weights
    stack = SharedPerceptionStack(**kw)
    sv = stack.init(jax.random.key(4), x)
    # remap Scene3D/DomainSeg trees to the fused naming
    d3_flat = {"params": d3_v["params"], "batch_stats": d3_v["batch_stats"]}
    dm_remap = {col: {"DomainSegHead": dm_v[col]["DomainSegHead"]}
                for col in ("params", "batch_stats")
                if "DomainSegHead" in dm_v.get(col, {})}
    sv = import_from_individual_checkpoints(sv, seg_v, d3_flat, dm_remap)

    f_seg, f_d3, f_dm = stack.apply(sv, x)
    np.testing.assert_allclose(np.asarray(f_seg), np.asarray(y_seg),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_d3), np.asarray(y_d3),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_dm), np.asarray(y_dm),
                               atol=1e-5, rtol=1e-5)
