"""Legacy-style trainer: multi-dataset sample interleave with gradient
accumulation as effective batch size.

Rebuild of the reference's SceneSeg-family training scheme
(Models/training/train_scene_seg.py): datasets are interleaved
sample-by-sample with per-epoch shuffle (:104-160), the optimizer steps
every `batch_size` samples with the batch size decayed per epoch
(32->16->8->4->3->2->1, :113-129), and validation + checkpoint run every
`val_every` samples (:229-240).

TPU-native twist: instead of one sample per device step, samples are
grouped into device batches and the accumulation happens in ONE jitted
program (lax.scan over microbatches) — same optimizer semantics
(mean gradient over the accumulation window), ~batch_size x fewer
dispatches.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .datasets import round_robin_interleave, batched_loader
from .losses import segmentation_ce_loss
from .metrics import confusion_matrix, miou_from_confusion
from ..ops.preprocess import IMAGENET_MEAN, IMAGENET_STD
from ..export.checkpoints import save_msgpack

BATCH_SIZE_SCHEDULE = (32, 16, 8, 4, 3, 2, 1)  # per-epoch decay


@dataclasses.dataclass
class LegacyTrainerConfig:
    num_epochs: int = 7
    lr: float = 1e-4
    val_every: int = 8000
    hw: tuple = (320, 640)
    num_classes: int = 3
    ckpt_dir: str = "runs/legacy"
    log_every: int = 250
    batch_schedule: Sequence[int] = BATCH_SIZE_SCHEDULE
    task: str = "seg"  # 'seg' (mIoU validation) | 'dense' (val-loss only)
    label_dtype: Any = None  # default: int32 for seg, float32 for dense
    qat: bool = False  # quantization-aware training (train/qat.py) —
    #                    Quanty-QAT analog for the legacy model family
    qat_min_channels: int = 32


class LegacySegTrainer:
    """model: a flax seg network; datasets: list with the SceneSegDataset
    interface."""

    def __init__(self, model, datasets, cfg: LegacyTrainerConfig,
                 loss_fn: Optional[Callable] = None, seed: int = 0):
        self.model = model
        self.datasets = datasets
        self.cfg = cfg
        self.loss_fn = loss_fn or (
            lambda logits, tgt, w: segmentation_ce_loss(logits, tgt, w))
        self.tx = optax.adamw(cfg.lr)
        rng = jax.random.key(seed)
        vars_ = model.init(rng, jnp.zeros((1, *cfg.hw, 3), jnp.float32),
                           train=False)
        self.params = vars_["params"]
        self.batch_stats = vars_.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)
        self.rng = rng
        self.np_rng = np.random.default_rng(seed)
        self.sample_count = 0
        self.history = []

        def grad_step(params, batch_stats, opt_state, images, labels,
                      weights, key):
            def loss(p, bs):
                x = images.astype(jnp.float32) / 255.0
                x = (x - IMAGENET_MEAN) / IMAGENET_STD
                if cfg.qat:
                    from .qat import qat_apply
                    out, mut = qat_apply(
                        self.model, {"params": p, "batch_stats": bs}, x,
                        train=True, mutable=["batch_stats"],
                        rngs={"dropout": key},
                        min_channels=cfg.qat_min_channels)
                else:
                    out, mut = self.model.apply(
                        {"params": p, "batch_stats": bs}, x, train=True,
                        mutable=["batch_stats"], rngs={"dropout": key})
                return self.loss_fn(out, labels, jnp.mean(weights, 0)), \
                    mut.get("batch_stats", bs)

            (l, new_bs), g = jax.value_and_grad(loss, has_aux=True)(
                params, batch_stats)
            updates, new_opt = self.tx.update(g, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_bs, new_opt, l

        self._grad_step = jax.jit(grad_step, donate_argnums=(0, 1, 2))

        def val_step(params, batch_stats, images, labels):
            x = images.astype(jnp.float32) / 255.0
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
            out = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, x)
            pred = jnp.argmax(out, -1)
            return confusion_matrix(pred, labels, cfg.num_classes)

        self._val_step = jax.jit(val_step)

    def _epoch_batch_size(self, epoch):
        s = self.cfg.batch_schedule
        return s[min(epoch, len(s) - 1)]

    def train(self, max_samples: Optional[int] = None,
              callbacks: Optional[Callable] = None):
        cfg = self.cfg
        for epoch in range(cfg.num_epochs):
            bs = self._epoch_batch_size(epoch)
            order = list(round_robin_interleave(self.datasets, self.np_rng))
            # group interleaved samples into device batches of size bs
            i = 0
            while i < len(order):
                group = order[i:i + bs]
                i += bs
                imgs, labs, ws = [], [], []
                for d_idx, s_idx in group:
                    img, ids, w = self.datasets[d_idx].get_train(s_idx)
                    import cv2
                    img = cv2.resize(img, (cfg.hw[1], cfg.hw[0]),
                                     interpolation=cv2.INTER_LINEAR)
                    ids = cv2.resize(ids, (cfg.hw[1], cfg.hw[0]),
                                     interpolation=cv2.INTER_NEAREST)
                    imgs.append(img)
                    labs.append(ids)
                    ws.append(w)
                self.rng, k = jax.random.split(self.rng)
                self.params, self.batch_stats, self.opt_state, loss = \
                    self._grad_step(self.params, self.batch_stats,
                                    self.opt_state,
                                    jnp.asarray(np.stack(imgs)),
                                    jnp.asarray(np.stack(labs)),
                                    jnp.asarray(np.stack(ws)), k)
                self.sample_count += len(group)
                if (self.sample_count // bs) % cfg.log_every == 0:
                    self.history.append((self.sample_count, float(loss)))
                if callbacks:
                    callbacks(self, float(loss))
                if max_samples and self.sample_count >= max_samples:
                    return self.history
                if cfg.val_every and \
                        self.sample_count % cfg.val_every < bs:
                    self.validate_and_save(epoch)
        return self.history

    def validate_and_save(self, epoch):
        cm_total = None
        if self.cfg.task == "seg":
            for ds in self.datasets:
                n_val = ds.item_count()[1]
                for imgs, labs, _ in batched_loader(ds, range(n_val), 4,
                                                    self.cfg.hw,
                                                    train=False):
                    cm = self._val_step(self.params, self.batch_stats,
                                        jnp.asarray(imgs),
                                        jnp.asarray(labs))
                    cm_total = cm if cm_total is None else cm_total + cm
        import pathlib
        p = pathlib.Path(self.cfg.ckpt_dir)
        p.mkdir(parents=True, exist_ok=True)
        save_msgpack(
            p / f"iter_{self.sample_count}_epoch_{epoch}.msgpack",
            {"params": self.params, "batch_stats": self.batch_stats})
        if cm_total is None:
            return None
        iou, miou, overall = miou_from_confusion(cm_total)
        return miou, overall


def make_scene3d_trainer(model, datasets, cfg: LegacyTrainerConfig = None,
                         edge_scale: float = 1.0, **kw):
    """Scene3D legacy trainer: SSI robust-mAE + multi-scale edge loss
    (scene_3d_trainer.py:151-196). Dataset labels are float depth maps."""
    from .losses import ssi_mae_depth_loss
    cfg = cfg or LegacyTrainerConfig(task="dense",
                                     ckpt_dir="runs/scene3d")

    def loss(logits, tgt, w):
        tgt = tgt[..., None] if tgt.ndim == 3 else tgt
        total, _, _ = ssi_mae_depth_loss(logits, tgt, edge_scale)
        return total

    return LegacySegTrainer(model, datasets, cfg, loss_fn=loss, **kw)


def make_domainseg_trainer(model, datasets, cfg: LegacyTrainerConfig = None,
                           **kw):
    """DomainSeg legacy trainer: BCE on the binary roadwork head
    (domain_seg_trainer.py role). Also covers the EgoSpace capability —
    the reference's EgoSpaceTrainer imports a model module that does not
    exist upstream (dead code); its training scheme (binary seg on the
    frozen SceneSeg upstream) is exactly this."""
    from .losses import binary_seg_loss
    cfg = cfg or LegacyTrainerConfig(task="dense",
                                     ckpt_dir="runs/domainseg")

    def loss(logits, tgt, w):
        tgt = tgt[..., None] if tgt.ndim == 3 else tgt
        return binary_seg_loss(logits, tgt)

    return LegacySegTrainer(model, datasets, cfg, loss_fn=loss, **kw)


def make_egolanes_trainer(model, datasets, cfg: LegacyTrainerConfig = None,
                          channel_weights: bool = True,
                          bev_loss_weight: float = 0.0,
                          bev_homography=None,
                          bev_wh=(640, 640), perspective_wh=(640, 320),
                          **kw):
    """EgoLanes legacy trainer (ego_lanes_trainer.py:268-542):
    per-channel BCE + multi-scale edge loss with the reference's 2/2/1
    ego-left/ego-right/other weighting; labels are (H/4, W/4, 3) binary
    masks.

    With bev_loss_weight > 0 the BEV/reprojected corridor terms
    (calc_BEV_*_driving_corridor / calc_reprojected_*_driving_corridor)
    are added for batches that carry BEV GT: the loss_fn then expects the
    target as a dict {"masks": (N,h,w,3), "bev_gt": {name: (2,K)},
    "bev_pred": {name: (K,)}, "reproj_gt": {name: (2,K)} (optional)}.
    """
    from .losses import (lanes_bce_edge_loss, weighted_egolanes_loss,
                         corridor_bev_losses)
    cfg = cfg or LegacyTrainerConfig(task="dense",
                                     ckpt_dir="runs/egolanes")

    def seg_loss(logits, tgt):
        if channel_weights:
            total, _ = weighted_egolanes_loss(logits, tgt)
        else:
            total, _, _ = lanes_bce_edge_loss(logits, tgt)
        return total

    def loss(logits, tgt, w):
        if isinstance(tgt, dict):
            total = seg_loss(logits, tgt["masks"])
            if bev_loss_weight > 0 and "bev_gt" in tgt:
                bev = corridor_bev_losses(
                    tgt["bev_gt"], tgt["bev_pred"],
                    gt_reproj=tgt.get("reproj_gt"),
                    homography=bev_homography,
                    bev_wh=bev_wh, perspective_wh=perspective_wh)
                total = total + bev_loss_weight * sum(bev.values())
            return total
        return seg_loss(logits, tgt)

    return LegacySegTrainer(model, datasets, cfg, loss_fn=loss, **kw)
