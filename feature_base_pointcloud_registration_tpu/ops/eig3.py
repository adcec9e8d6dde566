"""Closed-form symmetric 3x3 eigen-decomposition and Cramer solves.

The hot correspondence loop needs, per query point, the eigenvalues +
principal eigenvector of a 3x3 covariance (corner line test, ref:
src/mapOptmization.h:1060-1078) and a 3x3 linear solve (surf plane fit, ref
:1169).  Batched LAPACK-style jnp.linalg.{eigh,solve} lower to iterative
loops on TPU; these closed forms are pure VPU math (trigonometric Cardano
for the spectrum, cross-product basis extraction for the eigenvector,
adjugate/Cramer for the solve) and fuse into the surrounding kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def eigvals_sym3(A):
    """Eigenvalues of symmetric (...,3,3), ascending.  Trigonometric Cardano
    (stable for symmetric matrices)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    p_safe = jnp.where(p > 1e-12, p, 1.0)

    # det(B/p) / 2
    c00 = b11 * b22 - a12 * a12
    c01 = a01 * b22 - a12 * a02
    c02 = a01 * a12 - b11 * a02
    detB = b00 * c00 - a01 * c01 + a02 * c02
    r = jnp.clip(detB / (2.0 * p_safe ** 3), -1.0, 1.0)

    phi = jnp.arccos(r) / 3.0
    l2 = q + 2.0 * p * jnp.cos(phi)                       # largest
    l0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    l1 = 3.0 * q - l0 - l2
    near_diag = p <= 1e-12
    l0 = jnp.where(near_diag, q, l0)
    l1 = jnp.where(near_diag, q, l1)
    l2 = jnp.where(near_diag, q, l2)
    return jnp.stack([l0, l1, l2], axis=-1)


def principal_eigvec_sym3(A, lam_max):
    """Unit eigenvector for the largest eigenvalue of symmetric (...,3,3).

    Rows of (A - lam I) span the orthogonal complement of the eigenvector;
    the largest pairwise cross product of rows is the eigenvector.  Falls
    back to e_x for (near-)isotropic matrices.
    """
    I = jnp.eye(3, dtype=A.dtype)
    B = A - lam_max[..., None, None] * I
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    best = jnp.where((n01 >= n02)[..., None] & (n01 >= n12)[..., None], c01,
                     jnp.where((n02 >= n12)[..., None], c02, c12))
    norm = jnp.sqrt(jnp.sum(best * best, -1, keepdims=True))
    safe = jnp.where(norm > 1e-20, norm, 1.0)
    v = best / safe
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), v.shape)
    return jnp.where(norm > 1e-20, v, fallback)


def det3(A):
    return (A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
            - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
            + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]))


def solve3(A, b):
    """Cramer solve of (...,3,3) x = (...,3).  Returns (x, det)."""
    d = det3(A)
    d_safe = jnp.where(jnp.abs(d) > 1e-20, d, 1.0)
    A0 = jnp.concatenate([b[..., :, None], A[..., :, 1:]], axis=-1)
    A1 = jnp.concatenate([A[..., :, :1], b[..., :, None], A[..., :, 2:]], axis=-1)
    A2 = jnp.concatenate([A[..., :, :2], b[..., :, None]], axis=-1)
    x = jnp.stack([det3(A0) / d_safe, det3(A1) / d_safe, det3(A2) / d_safe],
                  axis=-1)
    return x, d
