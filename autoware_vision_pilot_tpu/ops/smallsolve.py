"""Closed-form tiny linear solves for exported programs.

``jnp.linalg.solve`` lowers to a LAPACK (CPU) / cuSOLVER-style custom
call that only JAX's own runtime registers FFI handlers for — an
exported StableHLO module containing ``lapack_sgetrf_ffi`` cannot run
under other XLA hosts (the TF C API runner in
host/tools/visionpilot_app.cpp fails with "No FFI handler registered").
Every solve in the lateral stack is a 3x3 normal-equations system
(poly_fit.cpp-style quadratic fits), so Cramer's rule via the adjugate
is exact, branch-free, pure-arithmetic StableHLO — portable to any XLA
host and cheaper than an LU factorization at this size.
"""
from __future__ import annotations

import jax.numpy as jnp


def solve3x3(A, b):
    """Solve A @ x = b for a (3,3) system via the adjugate (Cramer).

    Matches ``jnp.linalg.solve(A, b)`` to float tolerance for
    well-conditioned systems (the callers ridge-regularize). Singular A
    yields inf/nan exactly like the LAPACK path's div-by-zero would.
    """
    a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
    a10, a11, a12 = A[1, 0], A[1, 1], A[1, 2]
    a20, a21, a22 = A[2, 0], A[2, 1], A[2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    # adjugate rows (cofactor transpose)
    x0 = (c00 * b[0] + (a02 * a21 - a01 * a22) * b[1]
          + (a01 * a12 - a02 * a11) * b[2])
    x1 = (c01 * b[0] + (a00 * a22 - a02 * a20) * b[1]
          + (a02 * a10 - a00 * a12) * b[2])
    x2 = (c02 * b[0] + (a01 * a20 - a00 * a21) * b[1]
          + (a00 * a11 - a01 * a10) * b[2])
    return jnp.stack([x0, x1, x2]) / det
