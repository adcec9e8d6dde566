"""FPFH descriptors + normal estimation, fully vectorized.

The BASELINE north-star asks for FPFH-style descriptor histograms as a
vectorized binning kernel for the KITTI coarse-init config (descriptor
matching + RANSAC, then ICP refinement).  The reference itself has no
descriptors — this extends the capability surface the way PCL users pair
FPFH+SAC-IA with ICP.

Implementation (Rusu et al., ICRA 2009), fixed-K neighborhoods:
  1. normals: smallest eigenvector of the K-NN covariance (closed-form 3x3),
     oriented toward the viewpoint,
  2. SPFH: Darboux-frame angles (alpha, phi, theta) against each neighbor,
     soft-binned into 3 x 11 histograms via one-hot scatter,
  3. FPFH: SPFH(p) + mean_k SPFH(neighbor_k)/dist_k.

Everything is [N, K]-shaped masked math; the only searches are the same
streamed k-NN used everywhere else.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .eig3 import eigvals_sym3, principal_eigvec_sym3
from .knn import knn

_PREC = jax.lax.Precision.HIGHEST
N_BINS = 11


def estimate_normals(pts, mask, k: int = 16, chunk: int = 2048,
                     viewpoint=None):
    """Per-point unit normals from K-NN covariance; oriented to viewpoint.

    Returns (normals [N,3], valid [N])."""
    d2, idx = knn(pts, pts, mask, k=k, chunk=chunk)
    nn = pts[idx]                                       # [N,K,3]
    nn_valid = d2 < 1e37
    w = nn_valid.astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(w, -1), 1.0)
    c = jnp.sum(nn * w[..., None], axis=1) / cnt[:, None]
    dev = (nn - c[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", dev, dev, precision=_PREC) / cnt[:, None, None]
    lam = eigvals_sym3(cov)
    # smallest eigenvector = normal: use principal of (trace*I - cov)
    tr = cov[:, 0, 0] + cov[:, 1, 1] + cov[:, 2, 2]
    flipped = tr[:, None, None] * jnp.eye(3, dtype=pts.dtype) - cov
    n = principal_eigvec_sym3(flipped, eigvals_sym3(flipped)[:, 2])
    vp = (jnp.zeros(3, pts.dtype) if viewpoint is None
          else jnp.asarray(viewpoint, pts.dtype))
    to_vp = vp[None, :] - pts
    sign = jnp.where(jnp.sum(n * to_vp, -1, keepdims=True) < 0, -1.0, 1.0)
    n = n * sign
    valid = mask & (jnp.sum(nn_valid, -1) >= 3)
    return n, valid


def _pair_features(p, n_p, q, n_q):
    """Darboux angles (alpha, phi, theta) for point pairs.

    p, n_p: [N,3]; q, n_q: [N,K,3].  Returns three [N,K] arrays + dist."""
    d = q - p[:, None, :]
    dist = jnp.linalg.norm(d, axis=-1)
    safe = jnp.where(dist > 1e-9, dist, 1.0)
    du = d / safe[..., None]

    u = n_p[:, None, :]                         # [N,1,3]
    v = jnp.cross(du, jnp.broadcast_to(u, du.shape))
    v_n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.where(v_n > 1e-9, v_n, 1.0)
    w = jnp.cross(jnp.broadcast_to(u, du.shape), v)

    alpha = jnp.sum(v * n_q, -1)                              # in [-1,1]
    phi = jnp.sum(jnp.broadcast_to(u, du.shape) * du, -1)     # in [-1,1]
    theta = jnp.arctan2(jnp.sum(w * n_q, -1), jnp.sum(jnp.broadcast_to(u, du.shape) * n_q, -1))
    return alpha, phi, theta, dist


def _hist(vals, lo, hi, weights):
    """Masked histogram into N_BINS bins over [lo, hi] -> [N, N_BINS]."""
    b = jnp.clip(((vals - lo) / (hi - lo) * N_BINS).astype(jnp.int32),
                 0, N_BINS - 1)
    oh = jax.nn.one_hot(b, N_BINS, dtype=vals.dtype)          # [N,K,B]
    return jnp.sum(oh * weights[..., None], axis=1)


@partial(jax.jit, static_argnames=("k", "chunk"))
def fpfh(pts, mask, k: int = 16, chunk: int = 2048):
    """FPFH descriptors.  Returns (desc [N,33], valid [N])."""
    normals, n_valid = estimate_normals(pts, mask, k=k, chunk=chunk)

    d2, idx = knn(pts, pts, mask, k=k, chunk=chunk)
    nn = pts[idx]
    nn_n = normals[idx]
    nn_valid = (d2 < 1e37) & n_valid[idx]
    w = nn_valid.astype(pts.dtype)

    alpha, phi, theta, dist = _pair_features(pts, normals, nn, nn_n)
    import math
    spfh = jnp.concatenate([
        _hist(alpha, -1.0, 1.0, w),
        _hist(phi, -1.0, 1.0, w),
        _hist(theta, -math.pi, math.pi, w),
    ], axis=-1)                                                # [N,33]
    cnt = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1.0)
    spfh = spfh / cnt                                          # normalize

    # FPFH = SPFH(p) + mean_k SPFH(q_k) / dist_k
    inv_d = jnp.where(dist > 1e-9, 1.0 / dist, 0.0) * w
    nb = spfh[idx]                                             # [N,K,33]
    acc = jnp.sum(nb * inv_d[..., None], axis=1) / jnp.maximum(
        jnp.sum(inv_d, -1, keepdims=True), 1e-9)
    desc = spfh + acc
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.where(norm > 1e-9, norm, 1.0)
    valid = n_valid & mask
    return jnp.where(valid[:, None], desc, 0.0), valid


def match_descriptors(src_desc, src_valid, dst_desc, dst_valid):
    """Nearest-descriptor match src -> dst on the MXU.

    Returns (idx [Ns] into dst, sim [Ns] cosine-like score)."""
    sim = jnp.dot(src_desc, dst_desc.T, precision=_PREC)
    sim = jnp.where(dst_valid[None, :], sim, -jnp.inf)
    idx = jnp.argmax(sim, axis=1)
    best = jnp.take_along_axis(sim, idx[:, None], 1)[:, 0]
    best = jnp.where(src_valid, best, -jnp.inf)
    return idx.astype(jnp.int32), best
