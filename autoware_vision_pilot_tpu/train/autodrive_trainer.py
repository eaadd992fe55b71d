"""AutoDrive trainer: temporal two-frame regression training.

Rebuild of Models/training/{auto_drive_trainer.py,train_auto_drive.py,
train_autodrive_qat.py}: L1 on normalized distance, L1 on curvature, BCE
on the cut-in flag; AutoSpeed backbone warm-start
(autodrive_network.py load_backbone_from_autospeed); optional QAT via
fake-quant on weights (straight-through estimator) — the PT2E/XNNPACK QAT
analog.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.auto_drive import AutoDriveNetwork
from ..convert.torch_import import flatten_params, unflatten_params
from ..export.checkpoints import save_msgpack


def fake_quant_int8(w):
    """Symmetric per-tensor int8 fake-quant with straight-through grads."""
    scale = jnp.maximum(jnp.max(jnp.abs(w)), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127) * scale
    return w + jax.lax.stop_gradient(q - w)


def autodrive_loss(d_norm, curvature, flag_logit, gt_d, gt_curv, gt_flag,
                   w_d: float = 1.0, w_c: float = 1.0, w_f: float = 1.0):
    l_d = jnp.mean(jnp.abs(d_norm[:, 0] - gt_d))
    l_c = jnp.mean(jnp.abs(curvature[:, 0] - gt_curv))
    z = flag_logit[:, 0]
    l_f = jnp.mean(jnp.maximum(z, 0) - z * gt_flag +
                   jnp.log1p(jnp.exp(-jnp.abs(z))))
    total = w_d * l_d + w_c * l_c + w_f * l_f
    return total, {"distance": l_d, "curvature": l_c, "flag": l_f}


@dataclasses.dataclass
class AutoDriveTrainerConfig:
    input_hw: Tuple[int, int] = (512, 1024)
    lr: float = 1e-4
    weight_decay: float = 1e-2
    qat: bool = False
    freeze_backbone: bool = False
    ckpt_dir: str = "runs/autodrive"


class AutoDriveTrainer:
    def __init__(self, cfg: AutoDriveTrainerConfig, seed: int = 0):
        self.cfg = cfg
        self.model = AutoDriveNetwork(img_h=cfg.input_hw[0],
                                      img_w=cfg.input_hw[1])
        init_fn = jax.jit(lambda k: self.model.init(
            k, jnp.zeros((1, *cfg.input_hw, 3)),
            jnp.zeros((1, *cfg.input_hw, 3)), train=False))
        vars_ = init_fn(jax.random.key(seed))
        self.params = vars_["params"]
        self.batch_stats = vars_.get("batch_stats", {})

        if cfg.freeze_backbone:
            flat = flatten_params(self.params)
            labels = unflatten_params({
                k: "frozen" if k.startswith("backbone") else "train"
                for k in flat})
            self.tx = optax.multi_transform(
                {"train": optax.adamw(cfg.lr, weight_decay=cfg.weight_decay),
                 "frozen": optax.set_to_zero()},
                labels)
        else:
            self.tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
        self.opt_state = self.tx.init(self.params)
        self.rng = jax.random.key(seed + 1)

        qat = cfg.qat

        def train_step(params, bs, opt_state, prev, curr, gt_d, gt_curv,
                       gt_flag, key):
            def loss_fn(p):
                p_used = jax.tree.map(fake_quant_int8, p) if qat else p
                (d, c, f), mut = self.model.apply(
                    {"params": p_used, "batch_stats": bs}, prev, curr,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": key})
                total, parts = autodrive_loss(d, c, f, gt_d, gt_curv,
                                              gt_flag)
                return total, (mut.get("batch_stats", bs), parts)

            (loss, (new_bs, parts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_bs, new_opt,
                    loss, parts)

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    def warm_start_from_autospeed(self, autospeed_params):
        """Transfer the AutoSpeed backbone ('net' subtree) into our
        'backbone' subtree (autodrive_network.py:38-79 semantics)."""
        src = flatten_params(autospeed_params.get("net", {}))
        dst = flatten_params(self.params)
        matched = 0
        for k, v in src.items():
            key = f"backbone.{k}"
            if key in dst and dst[key].shape == v.shape:
                dst[key] = v
                matched += 1
        self.params = unflatten_params(dst)
        print(f"[autodrive] transferred {matched} backbone tensors")
        return matched

    def fit_step(self, prev_u8, curr_u8, gt_d, gt_curv, gt_flag) -> float:
        xp = jnp.asarray(prev_u8, jnp.float32) / 255.0
        xc = jnp.asarray(curr_u8, jnp.float32) / 255.0
        self.rng, k = jax.random.split(self.rng)
        (self.params, self.batch_stats, self.opt_state, loss, parts) = \
            self._train_step(self.params, self.batch_stats, self.opt_state,
                             xp, xc, jnp.asarray(gt_d),
                             jnp.asarray(gt_curv), jnp.asarray(gt_flag), k)
        return float(loss)

    def save(self, name: str = "last"):
        import pathlib
        p = pathlib.Path(self.cfg.ckpt_dir)
        p.mkdir(parents=True, exist_ok=True)
        save_msgpack(p / f"{name}.msgpack",
                     {"params": self.params,
                      "batch_stats": self.batch_stats})
