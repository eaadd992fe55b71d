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


# ------------------------------------------------------------------
# Photometric / weather primitives (Albumentations analogs, batched)
# ------------------------------------------------------------------

def _per_sample_gate(key, prob, B):
    return jax.random.bernoulli(key, prob, (B, 1, 1, 1))


def to_gray(key, img, prob: float = 0.1):
    """A.ToGray(method='weighted_average')."""
    gate = _per_sample_gate(key, prob, img.shape[0])
    w = jnp.asarray([0.299, 0.587, 0.114])
    g = jnp.sum(img * w, axis=-1, keepdims=True)
    return jnp.where(gate, jnp.broadcast_to(g, img.shape), img)


def multiplicative_noise(key, img, multiplier=(0.5, 1.5),
                         prob: float = 0.5):
    """A.MultiplicativeNoise(per_channel=False)."""
    kg, km = jax.random.split(key)
    B = img.shape[0]
    gate = _per_sample_gate(kg, prob, B)
    m = jax.random.uniform(km, (B, 1, 1, 1), minval=multiplier[0],
                           maxval=multiplier[1])
    return jnp.clip(jnp.where(gate, img * m, img), 0.0, 1.0)


def pixel_dropout(key, img, dropout_prob: float = 0.025,
                  prob: float = 0.25):
    """A.PixelDropout(per_channel=True)."""
    kg, kd = jax.random.split(key)
    gate = _per_sample_gate(kg, prob, img.shape[0])
    keep = jax.random.bernoulli(kd, 1.0 - dropout_prob, img.shape)
    return jnp.where(gate, img * keep, img)


def iso_noise(key, img, color_shift=(0.1, 0.3), intensity: float = 0.5,
              prob: float = 0.5):
    """A.ISONoise: luma gaussian noise + random per-channel color shift."""
    kg, kl, kc, ks = jax.random.split(key, 4)
    B = img.shape[0]
    gate = _per_sample_gate(kg, prob, B)
    luma = jax.random.normal(kl, img.shape[:3] + (1,)) * 0.05 * intensity
    shift = jax.random.uniform(ks, (B, 1, 1, 1), minval=color_shift[0],
                               maxval=color_shift[1])
    col = jax.random.normal(kc, (B, 1, 1, 3)) * 0.05 * shift
    return jnp.clip(jnp.where(gate, img + luma + col, img), 0.0, 1.0)


def random_fog(key, img, alpha_coef: float = 0.1, prob: float = 0.25):
    """A.RandomFog analog: blend toward white, denser near the top
    (distance proxy), strength ~ alpha_coef."""
    kg, ka = jax.random.split(key)
    B, H, _, _ = img.shape
    gate = _per_sample_gate(kg, prob, B)
    a = jax.random.uniform(ka, (B, 1, 1, 1), minval=0.5, maxval=1.0)
    grad = jnp.linspace(1.0, 0.3, H).reshape(1, H, 1, 1)
    alpha = jnp.clip(a * alpha_coef * 5.0 * grad, 0.0, 0.9)
    fogged = img * (1 - alpha) + alpha
    return jnp.where(gate, fogged, img)


def random_shadow(key, img, roi=(0.2, 0.2, 0.8, 0.8),
                  intensity=(0.3, 0.7), prob: float = 0.05):
    """A.RandomShadow analog: darken a random axis-aligned patch inside
    the ROI by a random intensity."""
    kg, kx, ky, kw, kh, ki = jax.random.split(key, 6)
    B, H, W, _ = img.shape
    gate = _per_sample_gate(kg, prob, B)
    x0r, y0r, x1r, y1r = roi
    cx = jax.random.uniform(kx, (B, 1, 1, 1), minval=x0r, maxval=x1r) * W
    cy = jax.random.uniform(ky, (B, 1, 1, 1), minval=y0r, maxval=y1r) * H
    hw = jax.random.uniform(kw, (B, 1, 1, 1), minval=0.05, maxval=0.25) * W
    hh = jax.random.uniform(kh, (B, 1, 1, 1), minval=0.05, maxval=0.25) * H
    it = jax.random.uniform(ki, (B, 1, 1, 1), minval=intensity[0],
                            maxval=intensity[1])
    ys = jnp.arange(H).reshape(1, H, 1, 1)
    xs = jnp.arange(W).reshape(1, 1, W, 1)
    inside = ((jnp.abs(ys - cy) < hh) & (jnp.abs(xs - cx) < hw))
    shaded = jnp.where(inside, img * (1 - it), img)
    return jnp.where(gate, shaded, img)


def random_rain(key, img, slant: int = 3, streaks: float = 0.0008,
                prob: float = 0.1):
    """A.RandomRain analog: sparse seeds smeared along a slanted vertical
    to form streaks, blended bright; slight darkening of the scene."""
    kg, ks = jax.random.split(key)
    B, H, W, _ = img.shape
    gate = _per_sample_gate(kg, prob, B)
    seeds = jax.random.bernoulli(ks, streaks, (B, H, W, 1)).astype(
        img.dtype)
    streak = jnp.zeros_like(seeds)
    for i in range(8):  # 8-px streak length, slanted
        streak = streak + jnp.roll(seeds, (i, (i * slant) // 8),
                                   axis=(1, 2))
    streak = jnp.clip(streak, 0.0, 1.0)
    rained = jnp.clip(img * 0.92 + streak * 0.7, 0.0, 1.0)
    return jnp.where(gate, rained, img)


def spatter(key, img, intensity: float = 0.3, prob: float = 0.1):
    """A.Spatter(mode='rain') analog: smooth random blobs blended dark."""
    kg, kn = jax.random.split(key)
    B, H, W, _ = img.shape
    gate = _per_sample_gate(kg, prob, B)
    coarse = jax.random.normal(kn, (B, H // 8 or 1, W // 8 or 1, 1))
    blob = jax.image.resize(coarse, (B, H, W, 1), "bilinear")
    mask = (blob > 1.0).astype(img.dtype)
    spat = jnp.clip(img * (1 - 0.5 * mask * intensity * 2) +
                    mask * 0.05, 0.0, 1.0)
    return jnp.where(gate, spat, img)


def random_gravel(key, img, roi=(0.2, 0.2, 0.8, 0.8), prob: float = 0.05):
    """A.RandomGravel analog: bright speckle patches inside the ROI."""
    kg, kp = jax.random.split(key)
    B, H, W, _ = img.shape
    gate = _per_sample_gate(kg, prob, B)
    speck = jax.random.bernoulli(kp, 0.002, (B, H, W, 1)).astype(img.dtype)
    ys = jnp.arange(H).reshape(1, H, 1, 1) / H
    xs = jnp.arange(W).reshape(1, 1, W, 1) / W
    in_roi = ((ys > roi[1]) & (ys < roi[3]) & (xs > roi[0]) & (xs < roi[2]))
    out = jnp.clip(img + speck * in_roi * 0.6, 0.0, 1.0)
    return jnp.where(gate, out, img)


def _rgb_to_hsv_vec(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    d = mx - mn + 1e-8
    h = jnp.where(mx == r, ((g - b) / d) % 6.0,
                  jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0))
    h = h / 6.0
    s = d / (mx + 1e-8)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb_vec(hsv):
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def hue_saturation_value(key, img, hue_shift: float = 0.5,
                         sat_shift: float = 0.6, val_shift: float = 0.3,
                         prob: float = 1.0):
    """A.HueSaturationValue analog (shifts as fractions of full range;
    the roadwork profile's hue_shift_limit=±180deg == hue_shift=0.5)."""
    kg, kh, ks, kv = jax.random.split(key, 4)
    B = img.shape[0]
    gate = _per_sample_gate(kg, prob, B)
    dh = jax.random.uniform(kh, (B, 1, 1), minval=-hue_shift,
                            maxval=hue_shift)
    ds = jax.random.uniform(ks, (B, 1, 1), minval=-sat_shift,
                            maxval=sat_shift)
    dv = jax.random.uniform(kv, (B, 1, 1), minval=-val_shift,
                            maxval=val_shift)
    hsv = _rgb_to_hsv_vec(img)
    hsv = jnp.stack([(hsv[..., 0] + dh) % 1.0,
                     jnp.clip(hsv[..., 1] + ds, 0.0, 1.0),
                     jnp.clip(hsv[..., 2] + dv, 0.0, 1.0)], axis=-1)
    return jnp.where(gate, _hsv_to_rgb_vec(hsv), img)


def brightness_contrast(key, img, brightness: float = 0.3,
                        contrast: float = 0.5, prob: float = 0.05):
    """A.RandomBrightnessContrast with explicit limits."""
    return color_jitter(key, img, brightness=brightness,
                        contrast=contrast, prob=prob)


# ------------------------------------------------------------------
# Per-profile compositions (augmentations.py:63-113 parity)
# ------------------------------------------------------------------

def profile_moderate(key, img):
    """transform_moderate (augmentations.py:63-79): the light per-op-
    probability set used by the segmentation trainers."""
    ks = jax.random.split(key, 10)
    img = pixel_dropout(ks[0], img, 0.25, prob=0.05)
    img = multiplicative_noise(ks[1], img, (0.2, 0.5), prob=0.05)
    img = spatter(ks[2], img, prob=0.05)
    img = to_gray(ks[3], img, prob=0.1)
    img = random_rain(ks[4], img, prob=0.05)
    img = random_shadow(ks[5], img, prob=0.05)
    img = random_gravel(ks[6], img, prob=0.05)
    img = brightness_contrast(ks[7], img, 0.3, 0.5, prob=0.05)
    img = iso_noise(ks[8], img, (0.1, 0.3), prob=0.05)
    img = gaussian_noise(ks[9], img, 0.02, prob=0.05)
    return img


def profile_noise(key, img):
    """transform_noise (augmentations.py:81-97): the heavy set."""
    ks = jax.random.split(key, 11)
    img = multiplicative_noise(ks[0], img, (0.5, 1.5), prob=0.5)
    img = pixel_dropout(ks[1], img, 0.025, prob=0.25)
    img = color_jitter(ks[2], img, brightness=0.6, contrast=0.6, prob=0.5)
    img = gaussian_noise(ks[3], img, 0.02, prob=0.5)
    img = gaussian_noise(ks[4], img, 0.1, prob=0.5)
    img = iso_noise(ks[5], img, (0.1, 0.5), prob=0.5)
    img = random_fog(ks[6], img, alpha_coef=0.2, prob=0.25)
    img = random_fog(ks[7], img, alpha_coef=0.04, prob=0.25)
    img = random_rain(ks[8], img, prob=0.1)
    img = spatter(ks[9], img, prob=0.1)
    img = to_gray(ks[10], img, prob=0.1)
    return img


def profile_roadwork(key, img):
    """transform_noise_roadwork (augmentations.py:99-104): extreme HSV
    shift (hue ±180deg) + frequent grayscale."""
    k1, k2 = jax.random.split(key)
    img = hue_saturation_value(k1, img, 0.5, 0.6, 0.31, prob=1.0)
    return to_gray(k2, img, prob=0.5)


def profile_autosteer(key, img):
    """transform_noise_autosteer (augmentations.py:106-112)."""
    k1, k2, k3 = jax.random.split(key, 3)
    img = brightness_contrast(k1, img, 0.3, 0.3, prob=0.5)
    img = gaussian_noise(k2, img, 0.02, prob=0.3)
    return to_gray(k3, img, prob=0.1)


NOISE_PROFILES = {
    "none": dict(sigma=0.0, prob=0.0),
    "moderate": dict(sigma=0.02, prob=0.5),
    "heavy": dict(sigma=0.05, prob=0.7),
    "roadwork": dict(sigma=0.03, prob=0.5),
}

PROFILE_FNS = {
    "moderate": profile_moderate,
    "noise": profile_noise,
    "roadwork": profile_roadwork,
    "autosteer": profile_autosteer,
}


def augment_batch(key, img, label, *, flip_prob=0.5, noise_profile="moderate",
                  grid_shuffle=False, grid=(1, 2), grid_prob=0.25,
                  jitter=True):
    """The default train-time augmentation pipeline (one jitted program).
    noise_profile: 'moderate' | 'noise' | 'roadwork' | 'autosteer' pick
    the reference's per-profile Albumentations sets (full composition);
    'none'/'heavy' keep the simple gaussian fallback."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img, label = random_hflip(k1, img, label, flip_prob)
    if grid_shuffle:
        img, label = random_grid_shuffle(k2, img, label, grid, grid_prob)
    prof_fn = PROFILE_FNS.get(noise_profile)
    if prof_fn is not None:
        img = prof_fn(k3, img)
    else:
        prof = NOISE_PROFILES.get(noise_profile, NOISE_PROFILES["moderate"])
        if prof["prob"] > 0:
            img = gaussian_noise(k3, img, **prof)
        if jitter:
            img = color_jitter(k4, img)
    return img, label
