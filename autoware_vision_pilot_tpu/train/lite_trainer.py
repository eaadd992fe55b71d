"""Lite trainer: YAML-experiment-config training with resume, best/last
checkpoints, schedulers, and optional W&B/TensorBoard.

Rebuild of Models/training/lite_trainer_base.py (476 LoC) with the same
config schema as Models/config/SceneSegLite.yaml: experiment/
checkpoint/dataset/dataloader/training/optimizer/scheduler/loss/network
sections. Differences by design:

- optimizers/schedulers are optax (adamw/sgd; none/step/cosine/
  warmup_cosine/poly), the whole step is one jitted SPMD program, and the
  trainer is mesh-aware (data-parallel over all local devices) — the DDP
  analog is free.
- resume restores model/optimizer/step from orbax (same `_maybe_resume`
  semantics, lite_trainer_base.py:283).
"""
from __future__ import annotations

import pathlib
from typing import Any, Callable, Dict, Optional

import numpy as np
import yaml
import jax
import jax.numpy as jnp
import optax

from .losses import segmentation_ce_loss
from .metrics import confusion_matrix, miou_from_confusion
from .train_step import create_seg_train_state, make_seg_train_step
from ..core.mesh import make_mesh
from ..ops.preprocess import IMAGENET_MEAN, IMAGENET_STD
from ..export.checkpoints import (
    save_checkpoint, load_checkpoint, save_msgpack)


def load_experiment_config(path: str | pathlib.Path) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def build_optimizer(cfg: Dict[str, Any], schedule) -> optax.GradientTransformation:
    o = cfg.get("optimizer", {})
    typ = o.get("type", "adamw")
    wd = float(o.get("weight_decay", 1e-2))
    if typ == "adamw":
        betas = o.get("betas", [0.9, 0.999])
        return optax.adamw(schedule, b1=betas[0], b2=betas[1],
                           weight_decay=wd)
    if typ == "sgd":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(schedule, momentum=float(o.get("momentum", 0.9))))
    raise ValueError(f"unknown optimizer {typ}")


def build_schedule(cfg: Dict[str, Any]) -> Callable:
    s = cfg.get("scheduler", {})
    lr = float(cfg.get("optimizer", {}).get("lr", 1e-4))
    typ = s.get("type", "none")
    max_steps = int(cfg.get("training", {}).get("max_steps", 100000))
    if typ in ("none", None):
        return lr
    if typ == "step":
        return optax.exponential_decay(
            lr, transition_steps=int(s.get("step_size", 30)),
            decay_rate=float(s.get("gamma", 0.1)), staircase=True)
    if typ == "cosine":
        return optax.cosine_decay_schedule(
            lr, max_steps, alpha=float(s.get("min_lr", 1e-6)) / lr)
    if typ == "warmup_cosine":
        warm = int(s.get("warmup_steps", 1000))
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warm, max_steps, end_value=float(s.get("min_lr", 1e-6)))
    if typ == "poly":
        return optax.polynomial_schedule(lr, float(s.get("min_lr", 1e-6)),
                                         power=0.9,
                                         transition_steps=max_steps)
    raise ValueError(f"unknown scheduler {typ}")


class LiteTrainer:
    """Config-driven seg trainer. `batch_iter()` must yield
    (images_u8 (B,H,W,3) np, labels (B,H,W) np) and cycle forever;
    `val_iter()` yields the validation set once per call."""

    def __init__(self, model, cfg: Dict[str, Any],
                 batch_iter: Callable, val_iter: Optional[Callable] = None,
                 input_hw=(512, 1024), num_classes: Optional[int] = None,
                 mesh=None, pseudo_labeler: Optional[Callable] = None):
        # pseudo_labeler(images_u8) -> labels: teacher-model hook for
        # unlabeled batches (the DepthAnythingV2 pseudo-labeling path,
        # lite_trainer_base.py:249-278). Batches yielding labels=None are
        # routed through it.
        self.pseudo_labeler = pseudo_labeler
        self.cfg = cfg
        self.model = model
        self.batch_iter = batch_iter
        self.val_iter = val_iter
        self.input_hw = input_hw
        loss_cfg = cfg.get("loss", {})
        self.num_classes = num_classes or int(loss_cfg.get("num_classes", 3))
        self.ignore_index = loss_cfg.get("ignore_index", None)
        weights = None
        aw = loss_cfg.get("apply_weights", {})
        if aw and aw.get("enabled"):
            weights = jnp.asarray(aw["values"], jnp.float32)
        self.class_weights = weights

        self.out_dir = pathlib.Path(
            cfg.get("experiment", {}).get("output_dir", "runs/lite"))
        self.out_dir.mkdir(parents=True, exist_ok=True)

        self.mesh = mesh or make_mesh()
        schedule = build_schedule(cfg)
        self.tx = build_optimizer(cfg, schedule)
        seed = int(cfg.get("experiment", {}).get("seed", 42))
        self.state = create_seg_train_state(
            model, (1, *input_hw, 3), jax.random.key(seed), self.tx)
        self.rng = jax.random.key(seed + 1)

        micro = int(cfg.get("training", {}).get("grad_accum_steps", 1))

        # loss type selects the task family (the scene_seg_lite /
        # scene3d_lite / ego_lanes_lite trainer subclasses of the
        # reference collapse into one config switch here)
        loss_type = loss_cfg.get("type", "cross_entropy")

        def ce_loss(logits, targets):
            ce_tgt = targets
            if self.ignore_index is not None:
                valid = targets != self.ignore_index
                ce_tgt = jnp.where(valid, targets, 0)
                onehot = jax.nn.one_hot(ce_tgt, self.num_classes,
                                        dtype=logits.dtype)
                onehot = onehot * valid[..., None]
                return segmentation_ce_loss(logits, onehot,
                                            self.class_weights)
            return segmentation_ce_loss(logits, ce_tgt, self.class_weights)

        if loss_type == "depth_ssi":
            from .losses import ssi_mae_depth_loss
            edge_scale = float(loss_cfg.get("edge_scale", 1.0))

            def loss_fn(logits, targets):
                t = targets[..., None] if targets.ndim == 3 else targets
                total, _, _ = ssi_mae_depth_loss(logits, t, edge_scale)
                return total
        elif loss_type == "lanes_bce":
            from .losses import lanes_bce_edge_loss

            def loss_fn(logits, targets):
                total, _, _ = lanes_bce_edge_loss(logits, targets)
                return total
        else:
            loss_fn = ce_loss
        self.loss_type = loss_type

        self.run_step, _ = make_seg_train_step(
            model, self.tx, loss_fn, mesh=self.mesh, microbatches=micro)

        def val_step(params, batch_stats, images, labels):
            x = images.astype(jnp.float32) / 255.0
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
            out = model.apply({"params": params, "batch_stats": batch_stats}, x)
            return confusion_matrix(jnp.argmax(out, -1), labels,
                                    self.num_classes,
                                    ignore_index=self.ignore_index)

        self._val_step = jax.jit(val_step)
        self.best_miou = -1.0
        self._maybe_resume()
        self._init_wandb()

    # -- checkpointing / resume --
    def _ckpt_dir(self):
        return self.out_dir / "checkpoints"

    def _maybe_resume(self):
        load_from = (self.cfg.get("checkpoint", {}) or {}).get("load_from")
        if load_from:
            self.state = load_checkpoint(load_from, self.state)
            print(f"[lite] resumed from {load_from} at step "
                  f"{int(self.state.step)}")

    def _init_wandb(self):
        self._wandb = None
        w = (self.cfg.get("experiment", {}).get("wandb") or {})
        if w.get("enabled"):
            try:
                import wandb
                self._wandb = wandb.init(
                    project=w.get("project_name", "avp_tpu"),
                    config=self.cfg)
            except Exception as e:  # offline/unavailable: degrade gracefully
                print(f"[lite] wandb disabled ({e})")
        # TensorBoard (the reference's SummaryWriter path) — gated; also
        # always keep a dependency-free JSONL metrics log
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(str(self.out_dir / "tb"))
        except Exception:
            pass
        self._metrics_file = open(self.out_dir / "metrics.jsonl", "a")

    def _log_scalar(self, name: str, value: float, step: int):
        import json as _json
        self._metrics_file.write(
            _json.dumps({"step": step, name: value}) + "\n")
        self._metrics_file.flush()
        if self._tb:
            self._tb.add_scalar(name, value, step)
        if self._wandb:
            self._wandb.log({name: value}, step=step)

    # -- training --
    def fit(self, max_steps: Optional[int] = None):
        t = self.cfg.get("training", {})
        max_steps = max_steps or int(t.get("max_steps", 1000))
        val_every = int(t.get("validation", {}).get("every_n_steps", 0) or 0)
        log_every = int(t.get("logging", {}).get("log_every_steps", 50))

        it = self.batch_iter()
        for step in range(int(self.state.step), max_steps):
            images, labels = next(it)
            if labels is None:
                if self.pseudo_labeler is None:
                    raise ValueError("unlabeled batch but no pseudo_labeler")
                labels = self.pseudo_labeler(images)
            x = images.astype(np.float32) / 255.0
            x = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
            self.rng, k = jax.random.split(self.rng)
            self.state, loss = self.run_step(
                self.state, jnp.asarray(x), jnp.asarray(labels), k)
            if (step + 1) % log_every == 0:
                l = float(loss)
                print(f"[lite] step {step + 1} loss {l:.4f}")
                self._log_scalar("train/loss", l, step + 1)
            if val_every and (step + 1) % val_every == 0:
                self.validate(step + 1)
        if t.get("save_last", True):
            save_msgpack(self.out_dir / "last.msgpack",
                         {"params": self.state.params,
                          "batch_stats": self.state.batch_stats})
            save_checkpoint(self._ckpt_dir(), self.state)
        return self.state

    def validate(self, step: int):
        if self.val_iter is None:
            return None
        if self.loss_type != "cross_entropy":
            # dense-regression tasks validate on loss, not mIoU
            return None
        cm_total = None
        for images, labels in self.val_iter():
            cm = self._val_step(self.state.params, self.state.batch_stats,
                                jnp.asarray(images), jnp.asarray(labels))
            cm_total = cm if cm_total is None else cm_total + cm
        if cm_total is None:
            return None
        _, miou, overall = miou_from_confusion(cm_total)
        print(f"[lite] step {step} val mIoU {miou:.4f} overall {overall:.4f}")
        self._log_scalar("val/miou", miou, step)
        self._log_scalar("val/overall", overall, step)
        if miou > self.best_miou and self.cfg.get("training", {}).get(
                "save_best", True):
            self.best_miou = miou
            save_msgpack(self.out_dir / "best_mIoU.msgpack",
                         {"params": self.state.params,
                          "batch_stats": self.state.batch_stats})
        return miou
