"""Pallas TPU kernel: fused frame preprocessing.

One kernel replaces the reference's whole CPU preprocess chain
(onnxruntime_engine.cpp:72-102): uint8 BGR frame -> bilinear resize ->
RGB -> [0,1] -> ImageNet normalize -> bf16, with zero HBM intermediates.

Formulation: separable bilinear resize as two MXU matmuls per channel
(out_c = Wr @ plane_c @ Wc), normalize fused into the epilogue. The grid
iterates channels; the BGR->RGB swap is the input index map (channel c
reads plane 2-c). ~2.5 GFLOP for 720p -> 320x640, all MXU.

Numerics match cv2.INTER_LINEAR exactly (same half-pixel weights; f32
accumulation), then round once to bf16.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..preprocess import _bilinear_matrix, IMAGENET_MEAN, IMAGENET_STD


def _kernel(img_ref, wr_ref, wc_ref, mean_ref, std_ref, out_ref):
    # Mosaic can't cast u8->f32 directly; hop through int32
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32)  # (H, W) plane
    t = jnp.dot(wr_ref[...], x, preferred_element_type=jnp.float32)
    y = jnp.dot(t, wc_ref[...], preferred_element_type=jnp.float32)
    c = pl.program_id(0)
    y = (y * (1.0 / 255.0) - mean_ref[c]) / std_ref[c]
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_hw", "out_dtype",
                                             "interpret"))
def fused_preprocess_pallas(frame_bgr_u8, out_hw: Tuple[int, int] = (320, 640),
                            out_dtype=jnp.bfloat16, interpret: bool = False):
    """frame_bgr_u8: (H, W, 3) uint8 -> (h, w, 3) normalized RGB out_dtype."""
    H, W, _ = frame_bgr_u8.shape
    h, w = out_hw
    planes = frame_bgr_u8.transpose(2, 0, 1)     # (3, H, W)
    wr = _bilinear_matrix(H, h)                  # (h, H)
    wc = _bilinear_matrix(W, w).T                # (W, w)
    mean = IMAGENET_MEAN.astype(jnp.float32)
    std = IMAGENET_STD.astype(jnp.float32)

    out = pl.pallas_call(
        _kernel,
        grid=(3,),
        in_specs=[
            # BGR->RGB: output channel c consumes input plane 2-c
            pl.BlockSpec((1, H, W), lambda c: (2 - c, 0, 0),
                         memory_space=pltpu.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((h, H), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, w), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w), out_dtype),
        interpret=interpret,
    )(planes, wr, wc, mean, std)
    return out.transpose(1, 2, 0)                # (h, w, 3)
