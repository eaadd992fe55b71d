"""Dtype / precision policy for the whole framework.

Two first-class operating points:

- PARITY: float32 params and compute with ``lax.Precision.HIGHEST`` matmuls.
  Used by the parity test-suite which compares against the reference
  PyTorch graphs to <=1e-3 (BASELINE.json north star).
- FAST: bfloat16 compute on the MXU (weights kept in bf16, accumulation in
  f32 via ``preferred_element_type``). This is the production inference and
  training point on TPU; it replaces the reference's AMP autocast+GradScaler
  (Models/training/auto_speed_trainer.py:64,92) — no loss scaling is needed
  for bf16.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    # precision for conv/matmul ops (None = backend default)
    precision: Any = None

    def cast(self, x):
        """Cast an activation pytree to the compute dtype."""
        return jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if hasattr(a, "astype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x,
        )

    def cast_params(self, params):
        return jax.tree.map(
            lambda a: a.astype(self.param_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            params,
        )


PARITY = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                precision=lax.Precision.HIGHEST)
FAST = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
              precision=None)


def default_policy() -> Policy:
    return PARITY
