"""Data augmentations, TPU-native.

Replaces the reference's Albumentations pipelines
(Models/data_utils/augmentations.py:34-113: resize 640x320 + flip,
grid-shuffle, and per-profile noise sets) with jittable batched JAX ops —
the whole augmentation stack runs on device as part of the input pipeline
instead of per-sample on CPU workers.

All functions take NHWC image batches (float [0,1]) + matching label maps
and a PRNG key; everything is shape-static and vmappable.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.preprocess import IMAGENET_MEAN, IMAGENET_STD


def normalize_imagenet(img):
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def random_hflip(key, img, label=None, prob: float = 0.5):
    """Per-sample horizontal flip of an NHWC batch."""
    B = img.shape[0]
    flip = jax.random.bernoulli(key, prob, (B, 1, 1, 1))
    img = jnp.where(flip, img[:, :, ::-1], img)
    if label is not None:
        lf = flip.reshape(B, *([1] * (label.ndim - 1)))
        if label.ndim == 3:  # (B, H, W)
            label = jnp.where(lf, label[:, :, ::-1], label)
        else:                # (B, H, W, C)
            label = jnp.where(lf, label[:, :, ::-1], label)
    return img, label


def random_grid_shuffle(key, img, label=None, grid: Tuple[int, int] = (1, 2),
                        prob: float = 0.25):
    """Shuffle grid cells (the reference's RandomGridShuffle analog).
    grid=(gy,gx); applied with probability `prob` per sample."""
    B, H, W, C = img.shape
    gy, gx = grid
    ch, cw = H // gy, W // gx
    k1, k2 = jax.random.split(key)
    perms = jax.vmap(lambda k: jax.random.permutation(k, gy * gx))(
        jax.random.split(k1, B))
    apply = jax.random.bernoulli(k2, prob, (B,))

    def shuffle_one(x, perm, ap):
        cells = x[:gy * ch, :gx * cw].reshape(gy, ch, gx, cw, -1)
        cells = cells.transpose(0, 2, 1, 3, 4).reshape(gy * gx, ch, cw, -1)
        shuf = cells[perm]
        out = shuf.reshape(gy, gx, ch, cw, -1).transpose(0, 2, 1, 3, 4)
        out = out.reshape(gy * ch, gx * cw, -1)
        out = x.at[:gy * ch, :gx * cw].set(out.reshape(x[:gy * ch, :gx * cw].shape))
        return jnp.where(ap, out, x)

    img = jax.vmap(shuffle_one)(img, perms, apply)
    if label is not None:
        lab = label if label.ndim == 4 else label[..., None]
        lab = jax.vmap(shuffle_one)(lab.astype(jnp.float32), perms, apply)
        label = (lab.astype(label.dtype) if label.ndim == 4
                 else lab[..., 0].astype(label.dtype))
    return img, label


def gaussian_noise(key, img, sigma: float = 0.02, prob: float = 0.5):
    k1, k2 = jax.random.split(key)
    B = img.shape[0]
    apply = jax.random.bernoulli(k1, prob, (B, 1, 1, 1))
    noise = jax.random.normal(k2, img.shape) * sigma
    return jnp.clip(jnp.where(apply, img + noise, img), 0.0, 1.0)


def color_jitter(key, img, brightness: float = 0.2, contrast: float = 0.2,
                 prob: float = 0.5):
    kb, kc, ka = jax.random.split(key, 3)
    B = img.shape[0]
    apply = jax.random.bernoulli(ka, prob, (B, 1, 1, 1))
    b = jax.random.uniform(kb, (B, 1, 1, 1), minval=-brightness,
                           maxval=brightness)
    c = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - contrast,
                           maxval=1 + contrast)
    mean = jnp.mean(img, axis=(1, 2, 3), keepdims=True)
    out = (img - mean) * c + mean + b
    return jnp.clip(jnp.where(apply, out, img), 0.0, 1.0)


def random_crop_resize(key, img, label, out_hw: Tuple[int, int],
                       scale_range: Tuple[float, float] = (0.5, 2.0)):
    """Random scale crop then resize to out_hw (Lite 'random_crop' mode).
    Labels resized with nearest."""
    B, H, W, _ = img.shape
    oh, ow = out_hw
    ks, kx, ky = jax.random.split(key, 3)
    s = jax.random.uniform(ks, (B,), minval=scale_range[0],
                           maxval=min(scale_range[1], 1.0))
    ch = jnp.maximum((s * H).astype(jnp.int32), 8)
    cw = jnp.maximum((s * W).astype(jnp.int32), 8)
    x0 = (jax.random.uniform(kx, (B,)) * (W - cw)).astype(jnp.int32)
    y0 = (jax.random.uniform(ky, (B,)) * (H - ch)).astype(jnp.int32)

    def crop_one(im, lb, yy, xx, hh, ww):
        # dynamic-slice a max-size window then mask-resize: to stay
        # shape-static we gather via coordinate maps
        ys = yy + (jnp.arange(oh) * hh / oh).astype(jnp.int32)
        xs = xx + (jnp.arange(ow) * ww / ow).astype(jnp.int32)
        im_out = im[ys][:, xs]
        lb_out = lb[ys][:, xs]
        return im_out, lb_out

    img_out, lab_out = jax.vmap(crop_one)(img, label, y0, x0, ch, cw)
    return img_out, lab_out


NOISE_PROFILES = {
    "none": dict(sigma=0.0, prob=0.0),
    "moderate": dict(sigma=0.02, prob=0.5),
    "heavy": dict(sigma=0.05, prob=0.7),
    "roadwork": dict(sigma=0.03, prob=0.5),
}


def augment_batch(key, img, label, *, flip_prob=0.5, noise_profile="moderate",
                  grid_shuffle=False, grid=(1, 2), grid_prob=0.25,
                  jitter=True):
    """The default train-time augmentation pipeline (one jitted program)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img, label = random_hflip(k1, img, label, flip_prob)
    if grid_shuffle:
        img, label = random_grid_shuffle(k2, img, label, grid, grid_prob)
    prof = NOISE_PROFILES.get(noise_profile, NOISE_PROFILES["moderate"])
    if prof["prob"] > 0:
        img = gaussian_noise(k3, img, **prof)
    if jitter:
        img = color_jitter(k4, img)
    return img, label
