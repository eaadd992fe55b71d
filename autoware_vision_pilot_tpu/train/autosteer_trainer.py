"""AutoSteer 2.0 trainer: lane-position vector + height-validity training.

Rebuild of Models/training/auto_steer_trainer.py (:63-140): masked L1 on
the soft-argmax lane-position vector (prediction multiplied by the
height-validity target before the L1 — rows without a lane contribute
zero) + BCE-with-logits on the height map, EMA, warmup-cosine schedule,
gradient accumulation; AMP/GradScaler -> bf16, DDP/NCCL -> mesh sharding.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.auto_steer import AutoSteerNetwork
from ..core.mesh import make_mesh, data_sharding
from ..export.checkpoints import save_msgpack


def autosteer_loss(lane_value, height_logits, target_xp, target_h,
                   xp_weight: float = 10.0):
    """lane_value (B,H,1,1), height_logits (B,H,1,1) in NHWC;
    targets in the same layout. Masked L1 + BCE."""
    masked_pred = lane_value * target_h
    l_xp = jnp.mean(jnp.abs(masked_pred - target_xp))
    z = height_logits
    l_h = jnp.mean(jnp.maximum(z, 0) - z * target_h +
                   jnp.log1p(jnp.exp(-jnp.abs(z))))
    return xp_weight * l_xp + l_h, {"xp": l_xp, "h_vector": l_h}


@dataclasses.dataclass
class AutoSteerTrainerConfig:
    input_hw: Tuple[int, int] = (512, 1024)
    lr: float = 1e-3
    warmup_steps: int = 500
    max_steps: int = 10000
    weight_decay: float = 5e-4
    ema_decay: float = 0.9999
    xp_weight: float = 10.0
    ckpt_dir: str = "runs/autosteer"


class AutoSteerTrainer:
    def __init__(self, cfg: AutoSteerTrainerConfig, mesh=None, seed: int = 0):
        self.cfg = cfg
        self.mesh = mesh or make_mesh()
        self.model = AutoSteerNetwork(variant="n", img_h=cfg.input_hw[0],
                                      img_w=cfg.input_hw[1])
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.warmup_steps, cfg.max_steps,
            end_value=cfg.lr * 0.01)
        self.tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
        init_fn = jax.jit(lambda k: self.model.init(
            k, jnp.zeros((1, *cfg.input_hw, 3)), train=True))
        vars_ = init_fn(jax.random.key(seed))
        self.params = vars_["params"]
        self.batch_stats = vars_.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)
        self.ema_params = jax.tree.map(jnp.copy, self.params)
        self.rng = jax.random.key(seed + 1)

        xp_w = cfg.xp_weight
        ema_d = cfg.ema_decay

        def train_step(params, bs, opt_state, ema, images, t_xp, t_h, key):
            def loss_fn(p):
                (lane, height), mut = self.model.apply(
                    {"params": p, "batch_stats": bs}, images, train=True,
                    mutable=["batch_stats"], rngs={"dropout": key})
                total, parts = autosteer_loss(lane, height, t_xp, t_h, xp_w)
                return total, (mut.get("batch_stats", bs), parts)

            (loss, (new_bs, parts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_ema = jax.tree.map(
                lambda e, p: e * ema_d + p * (1 - ema_d), ema, new_params)
            return new_params, new_bs, new_opt, new_ema, loss, parts

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2, 3))

    def fit_step(self, images_u8, target_xp, target_h) -> float:
        x = jnp.asarray(images_u8, jnp.float32) / 255.0
        if x.shape[0] % self.mesh.devices.size == 0:
            x = jax.device_put(x, data_sharding(self.mesh, x.ndim))
        self.rng, k = jax.random.split(self.rng)
        (self.params, self.batch_stats, self.opt_state, self.ema_params,
         loss, parts) = self._train_step(
            self.params, self.batch_stats, self.opt_state, self.ema_params,
            x, jnp.asarray(target_xp), jnp.asarray(target_h), k)
        return float(loss)

    def validate(self, val_batches, detect_thresh: float = 0.5):
        """Lane-vector metrics over (images, t_xp, t_h) batches (the
        auto_steer_trainer.py val role), all from ONE forward pass:
        mean |xp error| on rows where the lane exists, height-validity
        precision/recall, AND the reference-comparable vector mAP/mAP@50
        (AutoSteer/README.md:12-14 publishes 0.9546/0.9691;
        auto_steer_trainer.py:163-248)."""
        eval_vars = {"params": self.ema_params,
                     "batch_stats": self.batch_stats}

        @jax.jit
        def fwd(x):
            return self.model.apply(eval_vars, x)

        from .metrics import vector_ap
        map_thresholds = (0.02, 0.05, 0.10)
        abs_err_sum = n_rows = 0.0
        tp = fp = fn = 0.0
        ap_tp = {t: [] for t in map_thresholds}
        ap_fp = {t: [] for t in map_thresholds}
        conf = []
        n_lines = 0
        for images, t_xp, t_h in val_batches:
            x = jnp.asarray(images, jnp.float32) / 255.0
            lane, height = fwd(x)
            lane = np.asarray(lane, np.float32)
            prob = 1.0 / (1.0 + np.exp(-np.asarray(height, np.float32)))
            t_xp = np.asarray(t_xp, np.float32)
            t_h = np.asarray(t_h, np.float32)
            valid = t_h > 0.5
            abs_err_sum += np.abs(lane[valid] - t_xp[valid]).sum()
            n_rows += valid.sum()
            pred = prob > detect_thresh
            tp += (pred & valid).sum()
            fp += (pred & ~valid).sum()
            fn += (~pred & valid).sum()
            # vector AP: per line, hit at threshold t when the mean
            # masked normalized-x error < t, ranked by mean height conf
            # (val loop :203-224)
            lane2 = lane.reshape(len(x), -1)
            prob2 = prob.reshape(len(x), -1)
            line = lane2 * (prob2 > 0.5)
            target_line = (t_xp.reshape(len(x), -1) *
                           (t_h.reshape(len(x), -1) > 0.5))
            dist = np.abs(line - target_line).mean(axis=1)
            for t in map_thresholds:
                hit = dist < t
                ap_tp[t].extend(hit.astype(int).tolist())
                ap_fp[t].extend((~hit).astype(int).tolist())
            conf.extend(prob2.mean(axis=1).tolist())
            n_lines += len(x)
        mae = abs_err_sum / max(n_rows, 1)
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        out = {"xp_mae": float(mae), "h_precision": float(precision),
               "h_recall": float(recall),
               "map": 0.0, "map50": 0.0}
        if n_lines:
            _, _, out["map"], out["map50"] = vector_ap(
                ap_tp, ap_fp, conf, n_lines)
        return out

    def validate_map(self, val_batches,
                     thresholds=(0.02, 0.05, 0.10)):
        """Lane-vector mAP, comparable to the reference's published
        val numbers (AutoSteer/README.md:12-14 — mAP 0.9546 / mAP@50
        0.9691; auto_steer_trainer.py:163-248): per lane line, the
        prediction is a hit at distance threshold t when the mean
        masked normalized-x error is < t; decisions are ranked by the
        mean height confidence and scored with 101-point interpolated
        AP per threshold (vector_ap). mAP@50 = AP at t=0.05.
        """
        from .metrics import vector_ap

        eval_vars = {"params": self.ema_params,
                     "batch_stats": self.batch_stats}

        @jax.jit
        def fwd(x):
            return self.model.apply(eval_vars, x)

        tp = {t: [] for t in thresholds}
        fp = {t: [] for t in thresholds}
        conf = []
        n_lines = 0
        for images, t_xp, t_h in val_batches:
            x = jnp.asarray(images, jnp.float32) / 255.0
            lane, height = fwd(x)
            # (B, H, 1, 1) -> one line per sample, H rows
            lane = np.asarray(lane, np.float32).reshape(len(x), -1)
            prob = 1.0 / (1.0 + np.exp(
                -np.asarray(height, np.float32).reshape(len(x), -1)))
            t_xp = np.asarray(t_xp, np.float32).reshape(len(x), -1)
            t_h = np.asarray(t_h, np.float32).reshape(len(x), -1)
            # masked lines in normalized space (val loop :203-214)
            line = lane * (prob > 0.5)
            target_line = t_xp * (t_h > 0.5)
            dist = np.abs(line - target_line).mean(axis=1)
            for t in thresholds:
                hit = dist < t
                tp[t].extend(hit.astype(int).tolist())
                fp[t].extend((~hit).astype(int).tolist())
            conf.extend(prob.mean(axis=1).tolist())
            n_lines += len(x)
        if not n_lines:
            return {"map": 0.0, "map50": 0.0,
                    "precision": 0.0, "recall": 0.0}
        m_pre, m_rec, mean_ap, map50 = vector_ap(tp, fp, conf, n_lines)
        return {"map": mean_ap, "map50": map50,
                "precision": m_pre, "recall": m_rec}

    def save(self, name: str = "last"):
        import pathlib
        p = pathlib.Path(self.cfg.ckpt_dir)
        p.mkdir(parents=True, exist_ok=True)
        save_msgpack(p / f"{name}.msgpack",
                     {"params": self.ema_params,
                      "batch_stats": self.batch_stats})
