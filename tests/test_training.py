"""Training stack: losses, metrics, augmentations, schedulers, and a tiny
end-to-end Lite training run (loss decreases) on the 8-device CPU mesh."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from autoware_vision_pilot_tpu.train.losses import (
    segmentation_ce_loss, binary_seg_loss, ssi_mae_depth_loss,
    lanes_bce_edge_loss, robust_mae,
)
from autoware_vision_pilot_tpu.train.metrics import (
    confusion_matrix, miou_from_confusion, detection_map,
)
from autoware_vision_pilot_tpu.train.augment import (
    random_hflip, gaussian_noise, augment_batch,
)
from autoware_vision_pilot_tpu.train.datasets import (
    SyntheticSegDataset, decode_scene_seg_mask, round_robin_interleave,
    SCENESEG_COLOURS,
)
from autoware_vision_pilot_tpu.train.lite_trainer import (
    build_schedule, build_optimizer,
)


def test_ce_loss_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    tgt = rng.integers(0, 3, (2, 8, 8))
    w = np.array([1.0, 2.0, 0.5], np.float32)
    ours = float(segmentation_ce_loss(jnp.asarray(logits), jnp.asarray(tgt),
                                      jnp.asarray(w)))
    t = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(tgt))
    assert abs(ours - float(t)) < 1e-5


def test_bce_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    tgt = rng.integers(0, 2, (2, 8, 8, 1)).astype(np.float32)
    ours = float(binary_seg_loss(jnp.asarray(logits), jnp.asarray(tgt)))
    t = torch.nn.BCEWithLogitsLoss()(torch.tensor(logits),
                                     torch.tensor(tgt))
    assert abs(ours - float(t)) < 1e-6


def test_robust_mae_matches_quantile_filter():
    rng = np.random.default_rng(2)
    p = rng.normal(size=(1, 16, 16, 1)).astype(np.float32)
    g = rng.normal(size=(1, 16, 16, 1)).astype(np.float32)
    ours = float(robust_mae(jnp.asarray(p), jnp.asarray(g)))
    err = np.abs(p - g)
    q = np.quantile(err, 0.9)
    want = err[err < q].mean()
    assert abs(ours - want) < 1e-5


def test_depth_and_lanes_losses_finite():
    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.normal(size=(1, 32, 64, 1)).astype(np.float32))
    g = jnp.asarray(rng.uniform(0, 1, (1, 32, 64, 1)).astype(np.float32))
    total, mae, e = ssi_mae_depth_loss(p, g)
    assert np.isfinite(float(total))
    lg = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
    lt = jnp.asarray(rng.integers(0, 2, (1, 32, 64, 3)).astype(np.float32))
    total, bce, e = lanes_bce_edge_loss(lg, lt)
    assert np.isfinite(float(total))


def test_miou():
    pred = jnp.asarray([[0, 1], [2, 2]])
    gt = jnp.asarray([[0, 1], [2, 0]])
    cm = confusion_matrix(pred[None], gt[None], 3)
    iou, miou, overall = miou_from_confusion(cm)
    assert abs(iou[1] - 1.0) < 1e-9
    assert abs(overall - 0.75) < 1e-9


def test_detection_map_perfect():
    preds = [(np.array([[10, 10, 50, 50]]), np.array([0.9]), np.array([0]))]
    gts = [(np.array([[10, 10, 50, 50]]), np.array([0]))]
    m50, m = detection_map(preds, gts, num_classes=1)
    assert m50 == 1.0 and m == 1.0


def test_detection_map_miss():
    preds = [(np.array([[100, 100, 140, 140]]), np.array([0.9]),
              np.array([0]))]
    gts = [(np.array([[10, 10, 50, 50]]), np.array([0]))]
    m50, _ = detection_map(preds, gts, num_classes=1)
    assert m50 == 0.0


def test_detection_map_class_with_no_predictions():
    # regression: a class present in GT but absent from every prediction
    # produced empty recall/precision arrays and crashed the 101-point
    # interpolation (IndexError on an empty envelope). AP must be 0 for
    # that class, not an exception.
    preds = [(np.array([[10, 10, 50, 50]]), np.array([0.9]), np.array([0]))]
    gts = [(np.array([[10, 10, 50, 50], [60, 60, 90, 90]]),
            np.array([0, 1]))]
    m50, m = detection_map(preds, gts, num_classes=2)
    assert m50 == 0.5 and m == 0.5


@pytest.mark.heavy
def test_augmentations_shapes_and_determinism():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 1, (4, 32, 64, 3)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 3, (4, 32, 64)).astype(np.int32))
    k = jax.random.key(0)
    i2, l2 = augment_batch(k, img, lab)
    assert i2.shape == img.shape and l2.shape == lab.shape
    i3, l3 = augment_batch(k, img, lab)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i3))
    # flip=1.0 flips both image and label consistently
    i4, l4 = random_hflip(k, img, lab, prob=1.0)
    np.testing.assert_array_equal(np.asarray(i4), np.asarray(img)[:, :, ::-1])
    np.testing.assert_array_equal(np.asarray(l4), np.asarray(lab)[:, :, ::-1])


@pytest.mark.heavy
def test_augmentation_profiles_full_sets():
    """The four per-profile compositions (augmentations.py:63-113 parity):
    jittable, shape/range-preserving, deterministic per key, and the
    roadwork profile (p=1.0 HSV) actually changes the image."""
    from autoware_vision_pilot_tpu.train.augment import PROFILE_FNS

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0.1, 0.9, (4, 32, 64, 3)
                                  ).astype(np.float32))
    for name, fn in PROFILE_FNS.items():
        out = jax.jit(fn)(jax.random.key(3), img)
        assert out.shape == img.shape, name
        a = np.asarray(out)
        assert np.isfinite(a).all(), name
        assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-6, name
        out2 = jax.jit(fn)(jax.random.key(3), img)
        np.testing.assert_array_equal(a, np.asarray(out2))
    road = np.asarray(PROFILE_FNS["roadwork"](jax.random.key(1), img))
    assert np.abs(road - np.asarray(img)).max() > 0.05


def test_hsv_roundtrip():
    from autoware_vision_pilot_tpu.train.augment import (
        _rgb_to_hsv_vec, _hsv_to_rgb_vec)
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    back = _hsv_to_rgb_vec(_rgb_to_hsv_vec(img))
    assert float(jnp.max(jnp.abs(back - img))) < 1e-4


@pytest.mark.heavy
def test_augment_batch_profile_dispatch():
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(0, 1, (2, 16, 32, 3)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 3, (2, 16, 32)).astype(np.int32))
    for prof in ("moderate", "noise", "roadwork", "autosteer", "none"):
        i2, l2 = augment_batch(jax.random.key(0), img, lab,
                               noise_profile=prof)
        assert i2.shape == img.shape and l2.shape == lab.shape


def test_decode_scene_seg_mask():
    lab = np.zeros((4, 4, 3), np.uint8)
    lab[0, :] = SCENESEG_COLOURS["road"]
    lab[1, :] = SCENESEG_COLOURS["small_mobile_vehicle"]
    lab[2, :] = SCENESEG_COLOURS["sky"]
    ids, w = decode_scene_seg_mask(lab)
    assert (ids[0] == 2).all() and (ids[1] == 1).all() and (ids[2] == 0).all()
    assert w.shape == (3,)
    assert w[0] == 16 / (8 + 5120)  # sky + unlabelled rows are background


def test_round_robin_interleave_covers_all():
    d1 = SyntheticSegDataset(n_train=5, n_val=1, hw=(8, 8))
    d2 = SyntheticSegDataset(n_train=3, n_val=1, hw=(8, 8))
    order = list(round_robin_interleave([d1, d2],
                                        np.random.default_rng(0)))
    assert len(order) == 8
    assert sorted(i for d, i in order if d == 0) == list(range(5))
    assert sorted(i for d, i in order if d == 1) == list(range(3))
    # alternation while both have samples
    assert [d for d, _ in order[:6]] == [0, 1, 0, 1, 0, 1]


def test_schedulers_and_optimizers():
    cfg = {"optimizer": {"type": "adamw", "lr": 1e-3},
           "scheduler": {"type": "warmup_cosine", "warmup_steps": 10,
                         "min_lr": 1e-6},
           "training": {"max_steps": 100}}
    sched = build_schedule(cfg)
    assert sched(0) < sched(10)  # warmup
    assert sched(99) < sched(10)  # decay
    tx = build_optimizer(cfg, sched)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    updates, _ = tx.update(g, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


@pytest.mark.slow
def test_lite_trainer_loss_decreases(tmp_path):
    """Tiny CNN + synthetic data: 30 steps on the 8-device mesh, loss drops."""
    import flax.linen as fnn
    from autoware_vision_pilot_tpu.train.lite_trainer import LiteTrainer

    class TinySeg(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            h = fnn.Conv(16, (3, 3), padding=1)(x)
            h = fnn.relu(h)
            h = fnn.BatchNorm(use_running_average=not train)(h)
            return fnn.Conv(3, (3, 3), padding=1)(h)

    rng = np.random.default_rng(0)
    # learnable pattern: class depends on x position
    labels = np.tile(np.repeat(np.arange(3), 8)[None, None, :],
                     (8, 16, 1)).astype(np.int32)  # (8, 16, 24)
    images = (labels[..., None] * 80 + 40 +
              rng.normal(0, 5, (8, 16, 24, 3))).astype(np.uint8)

    def batch_iter():
        while True:
            yield images, labels

    cfg = {
        "experiment": {"output_dir": str(tmp_path), "seed": 0,
                       "wandb": {"enabled": False}},
        "training": {"max_steps": 30, "grad_accum_steps": 2,
                     "logging": {"log_every_steps": 1000},
                     "save_last": True},
        "optimizer": {"type": "adamw", "lr": 5e-3},
        "scheduler": {"type": "none"},
        "loss": {"num_classes": 3},
    }
    trainer = LiteTrainer(TinySeg(), cfg, batch_iter, input_hw=(16, 24),
                          num_classes=3)
    # capture first/last loss by stepping manually
    it = batch_iter()
    losses = []
    import jax.numpy as jnp2
    from autoware_vision_pilot_tpu.ops.preprocess import (
        IMAGENET_MEAN, IMAGENET_STD)
    for i in range(30):
        imgs, labs = next(it)
        x = imgs.astype(np.float32) / 255.0
        x = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        trainer.rng, k = jax.random.split(trainer.rng)
        trainer.state, loss = trainer.run_step(
            trainer.state, jnp2.asarray(x), jnp2.asarray(labs), k)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
    assert (tmp_path / "last.msgpack").exists() is False  # fit() not called


def test_multichip_batch_inference():
    """Batch sharded over the 8-device mesh; same numerics as single-dev."""
    import flax.linen as fnn
    from autoware_vision_pilot_tpu.parallel.multichip_inference import (
        make_sharded_infer)
    from autoware_vision_pilot_tpu.core.mesh import make_mesh

    class M(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            return fnn.Conv(4, (3, 3), padding=1)(x)

    m = M()
    v = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(16, 8, 8, 3)).astype(np.float32))
    mesh = make_mesh()
    infer = make_sharded_infer(lambda v, x: m.apply(v, x), v, mesh)
    out = infer(x)
    ref = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)
    # output actually sharded over devices
    assert len(out.sharding.device_set) == mesh.devices.size


@pytest.mark.heavy
def test_lite_trainer_loss_types():
    """Lite loss-type switch (scene3d_lite / ego_lanes_lite analogs)."""
    import flax.linen as fnn
    from autoware_vision_pilot_tpu.train.lite_trainer import LiteTrainer

    class Dense1(fnn.Module):
        out: int = 1

        @fnn.compact
        def __call__(self, x, train=False):
            return fnn.Conv(self.out, (3, 3), padding=1)(x)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 16, 24, 3), dtype=np.uint8)

    def it_depth():
        while True:
            yield imgs, rng.uniform(0, 1, (4, 16, 24)).astype(np.float32)

    def it_lanes():
        while True:
            yield imgs, rng.integers(0, 2, (4, 16, 24, 3)).astype(np.float32)

    base = {"experiment": {"wandb": {"enabled": False}},
            "training": {"max_steps": 2, "save_last": False,
                         "logging": {"log_every_steps": 10**9}},
            "optimizer": {"lr": 1e-3}, "scheduler": {"type": "none"}}
    for loss_type, model, it in [
            ("depth_ssi", Dense1(1), it_depth),
            ("lanes_bce", Dense1(3), it_lanes)]:
        cfg = dict(base)
        cfg["loss"] = {"type": loss_type}
        cfg["experiment"] = {"output_dir": f"/tmp/lite_{loss_type}",
                             "wandb": {"enabled": False}}
        tr = LiteTrainer(model, cfg, it, input_hw=(16, 24))
        tr.fit(max_steps=2)
        assert tr.validate(1) is None  # dense tasks skip mIoU


@pytest.mark.heavy
def test_mesh_dp_train_step_matches_single_device():
    """DP training numerics: one step of make_seg_train_step on the
    8-device mesh equals the same step on a 1-device mesh with identical
    data — what torch DDP guarantees implicitly via its gradient
    all-reduce (reference auto_speed_trainer.py:56-61, 103-105)."""
    import flax.linen as fnn
    import optax
    from autoware_vision_pilot_tpu.core.mesh import make_mesh
    from autoware_vision_pilot_tpu.train.train_step import (
        create_seg_train_state, make_seg_train_step)

    class TinySeg(fnn.Module):
        @fnn.compact
        def __call__(self, x, train: bool = False):
            x = fnn.Conv(8, (3, 3), padding=1)(x)
            x = fnn.BatchNorm(use_running_average=not train)(x)
            x = fnn.relu(x)
            return fnn.Conv(3, (1, 1))(x)

    model = TinySeg()
    rng = np.random.default_rng(7)
    B = 8
    images = jnp.asarray(rng.normal(size=(B, 8, 16, 3)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 3, size=(B, 8, 16)), jnp.int32)
    key = jax.random.key(3)

    def one_step(mesh):
        # sgd, not adam: adam's first-step update is ~±lr*sign(g), which
        # amplifies fp-reassociation noise in tiny gradients into full-size
        # update flips; sgd keeps param diff proportional to grad diff,
        # which is the DP-allreduce property under test.
        tx = optax.sgd(0.1)
        state = create_seg_train_state(model, (1, 8, 16, 3),
                                       jax.random.key(0), tx)
        run, _ = make_seg_train_step(
            model, tx, loss_fn=segmentation_ce_loss,
            mesh=mesh, microbatches=2)
        new_state, loss = run(state, images, targets, key)
        return new_state, loss

    mesh8 = make_mesh()
    assert mesh8.devices.size == 8, "conftest must force 8 CPU devices"
    mesh1 = make_mesh((1,), devices=jax.devices()[:1])

    s8, l8 = one_step(mesh8)
    s1, l1 = one_step(mesh1)
    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        s8.params, s1.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        s8.batch_stats, s1.batch_stats)


@pytest.mark.heavy
def test_bev_and_reprojected_losses():
    """EgoLanes BEV loss family vs hand computation
    (ego_lanes_trainer.py:362-578 semantics)."""
    from autoware_vision_pilot_tpu.train.losses import (
        bev_data_loss, bev_gradient_loss, project_bev_to_image,
        reprojected_data_loss, corridor_bev_losses,
        weighted_egolanes_loss, data_and_denoising_loss)

    gt_x = jnp.array([0.2, 0.3, 0.4, 0.5])
    pred_x = jnp.array([0.25, 0.3, 0.35, 0.5])
    assert abs(float(bev_data_loss(gt_x, pred_x)) -
               np.mean([0.05, 0.0, 0.05, 0.0])) < 1e-6
    # gradient loss: diffs gt [.1,.1,.1] pred [.05,.05,.15]; sum/4
    assert abs(float(bev_gradient_loss(gt_x, pred_x)) -
               (0.05 + 0.05 + 0.05) / 4) < 1e-6

    # identity-ish homography: reprojection == scaled BEV coords
    H = jnp.eye(3)
    gt_y = jnp.array([0.1, 0.2, 0.3, 0.4])
    xy = project_bev_to_image(gt_x, gt_y, H, (640, 640), (640, 320))
    np.testing.assert_allclose(np.asarray(xy[0]),
                               np.asarray(640 * gt_x / 640), atol=1e-6)
    np.testing.assert_allclose(np.asarray(xy[1]),
                               np.asarray(640 * gt_y / 320), atol=1e-6)

    # reprojected data loss of gt vs itself is 0
    gt_reproj = project_bev_to_image(gt_x, gt_y, H, (640, 640), (640, 320))
    assert float(reprojected_data_loss(
        gt_reproj, gt_y, gt_x, H, (640, 640), (640, 320))) < 1e-7

    # corridor aggregate returns all four terms and they differentiate
    gt_elems = {"path": jnp.stack([gt_x, gt_y]),
                "left": jnp.stack([gt_x - 0.1, gt_y]),
                "right": jnp.stack([gt_x + 0.1, gt_y])}
    pred_elems = {"path": pred_x, "left": pred_x - 0.1,
                  "right": pred_x + 0.1}
    reproj = {n: project_bev_to_image(gt_elems[n][0], gt_elems[n][1], H,
                                      (640, 640), (640, 320))
              for n in gt_elems}
    out = corridor_bev_losses(gt_elems, pred_elems, gt_reproj=reproj,
                              homography=H)
    assert set(out) == {"bev_data", "bev_gradient", "reproj_data",
                        "reproj_gradient"}

    def total(px):
        preds = {"path": px, "left": px - 0.1, "right": px + 0.1}
        o = corridor_bev_losses(gt_elems, preds, gt_reproj=reproj,
                                homography=H)
        return sum(o.values())

    g = jax.grad(total)(pred_x)
    assert np.abs(np.asarray(g)).max() > 0

    # gradient descent on the BEV losses converges pred -> gt
    px = pred_x
    for _ in range(200):
        px = px - 0.01 * jax.grad(total)(px)
    assert float(total(px)) < float(total(pred_x)) * 0.2

    # channel-weighted seg loss: 2/2/1 weighting increases ego-channel cost
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, 16, 32, 3)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 2, (1, 16, 32, 3)), jnp.float32)
    totw, per = weighted_egolanes_loss(logits, tgt)
    assert abs(float(totw) - float(2 * per[0] + 2 * per[1] + per[2])) < 1e-5

    d, den = data_and_denoising_loss(jnp.ones(4) * 2, jnp.ones(4),
                                     jnp.ones(4) * 2.5)
    assert abs(float(d) - 1.0) < 1e-6 and abs(float(den) - 0.5) < 1e-6


def test_tensor_parallel_inference_matches_single_device():
    """TP channel sharding over a (data=2, model=4) mesh: outputs match
    the unsharded forward (XLA inserts the ICI collectives; SURVEY §2.3
    'optional pjit sharding of conv channels')."""
    import flax.linen as fnn
    from autoware_vision_pilot_tpu.nn.layers import Conv2d, Linear
    from autoware_vision_pilot_tpu.parallel.tensor_parallel import (
        shard_variables_tp, make_tp_infer)
    from jax.sharding import Mesh

    class Net(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            h = Conv2d(64, 3, padding=1, name="c1")(x)
            h = jax.nn.relu(h)
            h = Conv2d(32, 3, padding=1, name="c2")(h)
            h = jnp.mean(h, axis=(1, 2))
            return Linear(16, name="fc")(h)

    net = Net()
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (4, 16, 32, 3)), jnp.float32)
    v = net.init(jax.random.key(0), x)
    ref = net.apply(v, x)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    tp_v = shard_variables_tp(v, mesh)
    # kernels actually sharded on their output-channel dim
    c1w = tp_v["params"]["c1"]["w"]
    assert not c1w.sharding.is_fully_replicated
    out = make_tp_infer(net.apply, tp_v, mesh)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_distributed_init_and_hybrid_mesh_single_process():
    """env:// initialization (auto_speed_trainer.py:280-298 analog):
    WORLD_SIZE==1 falls back to single-process; the hybrid mesh degrades
    to a flat ICI mesh usable by the DP train step."""
    from autoware_vision_pilot_tpu.parallel.distributed import (
        initialize_distributed, make_hybrid_mesh)

    assert initialize_distributed(num_processes=1) is False
    mesh = make_hybrid_mesh(ici_axes=(8,), axis_names=("data",))
    assert mesh.shape == {"data": 8}
    mesh2 = make_hybrid_mesh(ici_axes=(2, 4),
                             axis_names=("data", "model"))
    assert mesh2.shape == {"data": 2, "model": 4}


# ------------------------------------------------------- pseudo-labeling

def _fake_depth_teacher(scale=3.0):
    """DepthAnythingTeacher with an injected fake HF model/processor:
    'depth' = scaled image mean, at half resolution (exercises the
    interpolate-back + per-image min-max normalization paths)."""
    import torch
    import types
    from autoware_vision_pilot_tpu.train.teachers import DepthAnythingTeacher

    def processor(images, return_tensors):
        assert return_tensors == "pt"
        x = torch.stack([torch.from_numpy(np.asarray(im)).float()
                         for im in images])  # (B,H,W,3)
        return {"pixel_values": x.permute(0, 3, 1, 2)}

    class FakeModel(torch.nn.Module):
        def forward(self, pixel_values):
            half = torch.nn.functional.avg_pool2d(pixel_values, 2)
            depth = half.mean(dim=1) * scale  # (B, H/2, W/2)
            return types.SimpleNamespace(predicted_depth=depth)

    return DepthAnythingTeacher(encoder="vitl", model=FakeModel(),
                                processor=processor)


def test_depth_anything_teacher_labels():
    """Teacher returns (B,H,W) float32 relative depth in [0,1], resized
    back to the input resolution regardless of the model's native output
    scale (lite_trainer_base.py:249-278 analog)."""
    from autoware_vision_pilot_tpu.train.teachers import DepthAnythingTeacher

    teacher = _fake_depth_teacher()
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 16, 24, 3), dtype=np.uint8)
    # image 0: smooth horizontal gradient (survives the fake model's
    # half-res pooling, so monotonicity is checkable)
    imgs[0] = np.tile(np.linspace(0, 255, 24, dtype=np.uint8)[None, :, None],
                      (16, 1, 3))
    labels = teacher(imgs)
    assert labels.shape == (2, 16, 24) and labels.dtype == np.float32
    assert labels.min() >= 0.0 and labels.max() <= 1.0 + 1e-6
    # min-max normalization is per image: both images span [0, 1]
    assert np.allclose(labels.min(axis=(1, 2)), 0.0, atol=1e-6)
    assert np.allclose(labels.max(axis=(1, 2)), 1.0, atol=1e-6)
    # ordering preserved: brighter image regions -> larger 'depth'
    flat = imgs[0].mean(-1)
    corr = np.corrcoef(flat.ravel(), labels[0].ravel())[0, 1]
    assert corr > 0.9

    with pytest.raises(ValueError):
        DepthAnythingTeacher(encoder="vitg2")
    with pytest.raises(ValueError):
        teacher(np.zeros((16, 24, 3), np.uint8))


@pytest.mark.heavy
def test_lite_trainer_routes_unlabeled_batches_through_teacher(tmp_path):
    """Batches yielded with labels=None go through the pseudo_labeler and
    train the depth head (the DepthAnythingV2 pseudo-labeling flow)."""
    import flax.linen as fnn
    from autoware_vision_pilot_tpu.train.lite_trainer import LiteTrainer

    class TinyDepth(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            h = fnn.relu(fnn.Conv(8, (3, 3), padding=1)(x))
            return fnn.Conv(1, (3, 3), padding=1)(h)

    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (4, 16, 24, 3), dtype=np.uint8)

    def batch_iter():
        while True:
            yield images, None  # unlabeled: teacher must label it

    cfg = {
        "experiment": {"output_dir": str(tmp_path), "seed": 0,
                       "wandb": {"enabled": False}},
        "training": {"max_steps": 2, "grad_accum_steps": 2,
                     "logging": {"log_every_steps": 1000},
                     "save_last": False},
        "optimizer": {"type": "adamw", "lr": 1e-3},
        "scheduler": {"type": "none"},
        "loss": {"type": "depth_ssi"},
    }
    teacher = _fake_depth_teacher()
    calls = []
    def counting_teacher(imgs):
        calls.append(imgs.shape)
        return teacher(imgs)

    trainer = LiteTrainer(TinyDepth(), cfg, batch_iter, input_hw=(16, 24),
                          pseudo_labeler=counting_teacher)
    state = trainer.fit()
    assert len(calls) == 2 and calls[0] == (4, 16, 24, 3)
    assert int(state.step) == 2

    # without a teacher, unlabeled batches must fail loudly
    t2 = LiteTrainer(TinyDepth(), cfg, batch_iter, input_hw=(16, 24))
    with pytest.raises(ValueError, match="pseudo_labeler"):
        t2.fit()
