"""Point-to-line / point-to-plane correspondence with analytic coefficients.

Vectorized rebuild of cornerOptimization / surfOptimization
(ref: src/mapOptmization.h:1002-1215).  The reference runs an OpenMP loop of
serial KD-tree queries + per-point 3x3 eigendecompositions / 5x3 QR solves;
here every query point is processed at once: one streamed MXU 5-NN pass,
one batched eigh over [N,3,3] covariances, one batched 3x3 normal-equation
solve.  All accept/reject gates become masks:

  corner: 5th-NN d2 < 1.0 (ref :1027), line test l0 > 3*l1 (ref :1063),
          weight s = 1 - 0.9*|ld2| > 0.1 (ref :1106,1115)
  surf:   5th-NN d2 < 1.0 (ref :1154), plane residual <= 0.2 m for all 5
          neighbors (ref :1184-1189), s = 1 - 0.9*|pd2|/sqrt(||p||) > 0.1
          (ref :1198,1207 — sqrt(sqrt(squared norm)))

Outputs per query point: unit-direction coefficients scaled by s (the
Jacobian w.r.t. the point), weighted residual, validity mask — exactly the
(coeff, laserCloudOri flag) pair the reference accumulates (ref :1109-1120).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .eig3 import eigvals_sym3, principal_eigvec_sym3

_PREC = jax.lax.Precision.HIGHEST
_BIG = np.float32(3.0e38)  # numpy, NOT jnp: module import may happen inside a jit
# trace (lazy in-function imports); a jnp scalar created there is a leaked
# tracer captured as this global forever (the round-3..5 order-dependent
# INVALID_ARGUMENT executable-cache wart).  numpy scalars never trace.


def select_smallest(d2, k: int):
    """Boolean mask of the k smallest entries along the last axis (ties by
    lower index), plus the largest selected value.

    The TPU-fast replacement for top-k + gather on narrow candidate sets:
    rank_i = #{j : d2_j < d2_i, ties by index} via an all-pairs [..., K, K]
    comparison — pure elementwise VPU work, no sort network, no scatter
    (lax.top_k / argmin-scatter passes measured 6x the cost of the entire
    correspondence math at K=8).  Downstream consumers use the mask in
    weighted-sum form instead of gathering the selected rows.
    """
    K = d2.shape[-1]
    idx = jnp.arange(K, dtype=jnp.int32)
    earlier = (d2[..., None, :] < d2[..., :, None]) | (
        (d2[..., None, :] == d2[..., :, None])
        & (idx[None, :] < idx[:, None]))
    rank = jnp.sum(earlier, axis=-1)                    # [..., K]
    sel = rank < k
    dmax = jnp.max(jnp.where(sel, d2, -jnp.inf), axis=-1)
    return sel, dmax


def corner_correspondence(pts_world, valid, knn_fn):
    """Point-to-line coefficients for corner features.

    pts_world: [N,3] query points in map frame; valid: [N];
    knn_fn: q -> (d2 [N,5], nn [N,5,3]) — local or map-sharded search.
    Returns (coeff [N,3], resid [N], mask [N]).
    """
    d2, nn = knn_fn(pts_world)                          # [N,5], [N,5,3]
    sel = jnp.ones(d2.shape, bool)                      # exact 5-NN: all
    return _corner_from_candidates(pts_world, valid, nn, sel,
                                   jnp.max(d2, axis=-1))


def corner_correspondence_cand(pts_world, valid, cand_xyz, cand_valid):
    """Point-to-line coefficients straight from a K-candidate set.

    The production hot path: d2 at the CURRENT pose + rank-mask 5-NN
    selection + masked-sum line fit — no top-k, no gather (see
    select_smallest).  cand_xyz: [N,K,3]; cand_valid: [N,K].
    """
    diff = pts_world[:, None, :] - cand_xyz
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand_valid, d2, _BIG)
    sel, dmax = select_smallest(d2, 5)
    return _corner_from_candidates(pts_world, valid, cand_xyz, sel, dmax)


def _corner_from_candidates(pts_world, valid, nn, sel, d5max):
    """Shared line-fit tail; sel selects exactly the 5-NN among nn's rows."""
    gate_nn = valid & (d5max < 1.0)

    selF = sel.astype(nn.dtype)[..., None]              # [N,K,1]
    c = jnp.sum(nn * selF, axis=1) / 5.0                # [N,3]
    dev = (nn - c[:, None, :]) * selF
    cov = jnp.einsum("nki,nkj->nij", dev, dev, precision=_PREC) / 5.0    # [N,3,3]
    # closed-form symmetric 3x3 spectrum (ascending); reference (cv::eigen)
    # is descending with row eigenvectors — same spectrum (ref :1060-1063).
    w = eigvals_sym3(cov)
    lam_max, lam_mid = w[:, 2], w[:, 1]
    v = principal_eigvec_sym3(cov, lam_max)             # principal direction
    gate_line = lam_max > 3.0 * lam_mid

    p0 = pts_world
    p1 = c + 0.1 * v
    p2 = c - 0.1 * v

    # |(p0-p1) x (p0-p2)| and derivative direction (ref :1083-1103).
    d01 = p0 - p1
    d02 = p0 - p2
    cx = d01[:, 0] * d02[:, 1] - d02[:, 0] * d01[:, 1]   # (x0-x1)(y0-y2)-(x0-x2)(y0-y1)
    cy = d01[:, 0] * d02[:, 2] - d02[:, 0] * d01[:, 2]
    cz = d01[:, 1] * d02[:, 2] - d02[:, 1] * d01[:, 2]
    a012 = jnp.sqrt(cx * cx + cy * cy + cz * cz)

    d12 = p1 - p2
    l12 = jnp.sqrt(jnp.sum(d12 * d12, axis=-1))

    denom = a012 * l12
    safe = jnp.where(denom > 1e-12, denom, 1.0)
    la = (d12[:, 1] * cx + d12[:, 2] * cy) / safe
    lb = -(d12[:, 0] * cx - d12[:, 2] * cz) / safe
    lc = -(d12[:, 0] * cy + d12[:, 1] * cz) / safe

    ld2 = a012 / jnp.where(l12 > 1e-12, l12, 1.0)
    s = 1.0 - 0.9 * jnp.abs(ld2)
    mask = gate_nn & gate_line & (s > 0.1) & (denom > 1e-12)

    coeff = s[:, None] * jnp.stack([la, lb, lc], axis=-1)
    resid = s * ld2
    coeff = jnp.where(mask[:, None], coeff, 0.0)
    resid = jnp.where(mask, resid, 0.0)
    return coeff, resid, mask


def surf_correspondence(pts_world, valid, knn_fn, *,
                        min_plane_spread: float = 0.0):
    """Point-to-plane coefficients for surface features.

    Plane fit solves A n = -1 over the 5 neighbors (ref :1169) via 3x3
    normal equations; rank-deficient fits are rejected by the 0.2 m check.
    Returns (coeff [N,3], resid [N], mask [N]).
    """
    d2, nn = knn_fn(pts_world)                          # [N,5], [N,5,3]
    sel = jnp.ones(d2.shape, bool)                      # exact 5-NN: all
    return _surf_from_candidates(pts_world, valid, nn, sel,
                                 jnp.max(d2, axis=-1),
                                 min_plane_spread=min_plane_spread)


def surf_correspondence_cand(pts_world, valid, cand_xyz, cand_valid, *,
                             min_plane_spread: float = 0.0):
    """Point-to-plane coefficients straight from a K-candidate set
    (rank-mask 5-NN selection + masked-sum plane fit; see select_smallest)."""
    diff = pts_world[:, None, :] - cand_xyz
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand_valid, d2, _BIG)
    sel, dmax = select_smallest(d2, 5)
    return _surf_from_candidates(pts_world, valid, cand_xyz, sel, dmax,
                                 min_plane_spread=min_plane_spread)


def _householder_lstsq3(A, b):
    """argmin_n ||A n - b||  for A [N,K,3] (all-zero rows allowed), via 3
    Householder reflections + back substitution — error grows with cond(A),
    not cond(A)^2.

    The reference solves the plane fit A n = -1 with colPivHouseholderQr
    (ref :1169); forming the 3x3 normal equations instead squares the
    conditioning, and with map coordinates ~15 m from the origin the f32
    Cramer solve produced garbage normals on marginal planes (observed: 12%
    of surf gates flipping vs the f64 oracle).  Returns (n [N,3],
    |det R| [N]) — |r00*r11*r22| = |det A-ish|, the rank gate.
    """
    K = A.shape[1]
    rows = jnp.arange(K)
    cols = [A[:, :, 0], A[:, :, 1], A[:, :, 2]]
    y = b
    for j in range(3):
        act = (rows >= j)[None, :]
        x = jnp.where(act, cols[j], 0.0)                # [N,K]
        normx = jnp.sqrt(jnp.sum(x * x, axis=1))
        pj = x[:, j]
        alpha = -jnp.where(pj >= 0, 1.0, -1.0) * normx
        v = x - alpha[:, None] * (rows == j)[None, :].astype(x.dtype)
        vn2 = jnp.sum(v * v, axis=1)
        inv = jnp.where(vn2 > 1e-30, 2.0 / vn2, 0.0)
        for c in range(j, 3):
            coef = inv * jnp.sum(v * cols[c], axis=1)
            cols[c] = cols[c] - coef[:, None] * v
        coefy = inv * jnp.sum(v * y, axis=1)
        y = y - coefy[:, None] * v
    r00, r01, r02 = cols[0][:, 0], cols[1][:, 0], cols[2][:, 0]
    r11, r12 = cols[1][:, 1], cols[2][:, 1]
    r22 = cols[2][:, 2]

    def _safe(d):
        return jnp.where(jnp.abs(d) > 1e-20, d, 1e-20)

    n2 = y[:, 2] / _safe(r22)
    n1 = (y[:, 1] - r12 * n2) / _safe(r11)
    n0 = (y[:, 0] - r01 * n1 - r02 * n2) / _safe(r00)
    return jnp.stack([n0, n1, n2], axis=-1), jnp.abs(r00 * r11 * r22)


def _surf_from_candidates(pts_world, valid, nn, sel, d5max, *,
                          min_plane_spread: float = 0.0):
    """Shared plane-fit tail; sel selects exactly the 5-NN among nn's rows.

    min_plane_spread (static, meters; 0 = off = reference parity) is an
    opt-in collinearity gate the reference lacks: its plane-validity check
    (all 5 pts within 0.2 m of the fit, ref src/mapOptmization.h:1182-1190)
    PASSES 5-NN sets that are collinear (e.g. same-ring arcs in a sparse
    early map), whose fitted normals are arbitrary in the plane orthogonal
    to the line and bias the solve.  The gate requires the neighbor
    scatter's middle singular value (sqrt of the middle eigenvalue of the
    5-point covariance) — the in-plane short-axis extent — to reach
    min_plane_spread before the correspondence is accepted.
    """
    gate_nn = valid & (d5max < 1.0)

    selF = sel.astype(nn.dtype)[..., None]              # [N,K,1]
    nn_sel = nn * selF
    # least squares A n = -1 over the selected rows (zero rows are no-ops);
    # |det R| gate matches the old |det(A^T A)| > 1e-10 (det G = det R^2).
    n, detR = _householder_lstsq3(nn_sel, -sel.astype(nn.dtype))
    ok_det = detR > 1e-5

    ps = jnp.sqrt(jnp.sum(n * n, axis=-1))
    ps_safe = jnp.where(ps > 1e-12, ps, 1.0)
    pa = n[:, 0] / ps_safe
    pb = n[:, 1] / ps_safe
    pc = n[:, 2] / ps_safe
    pd = 1.0 / ps_safe

    plane_res = jnp.abs(
        pa[:, None] * nn[:, :, 0] + pb[:, None] * nn[:, :, 1]
        + pc[:, None] * nn[:, :, 2] + pd[:, None]
    )
    plane_valid = (jnp.all(jnp.where(sel, plane_res <= 0.2, True), axis=1)
                   & ok_det & (ps > 1e-12))

    pd2 = pa * pts_world[:, 0] + pb * pts_world[:, 1] + pc * pts_world[:, 2] + pd
    # ref :1198: s = 1 - 0.9*|pd2| / sqrt(sqrt(x*x+y*y+z*z)) — the inner
    # argument is the SQUARED norm, so the divisor is ||p||^(1/2).
    sumsq = jnp.sum(pts_world * pts_world, axis=-1)
    s = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(jnp.sqrt(jnp.maximum(sumsq, 1e-12)))

    mask = gate_nn & plane_valid & (s > 0.1)
    if min_plane_spread > 0.0:
        w = sel.astype(nn.dtype)                        # [N,K]
        cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)      # [N]
        mu = jnp.sum(nn * w[..., None], axis=1) / cnt[:, None]
        d = (nn - mu[:, None, :]) * w[..., None]        # [N,K,3]
        C = jnp.einsum("nki,nkj->nij", d, d) / cnt[:, None, None]
        lam_mid = eigvals_sym3(C)[:, 1]                 # middle eigenvalue
        mask = mask & (jnp.sqrt(jnp.maximum(lam_mid, 0.0))
                       >= min_plane_spread)
    coeff = s[:, None] * jnp.stack([pa, pb, pc], axis=-1)
    resid = s * pd2
    coeff = jnp.where(mask[:, None], coeff, 0.0)
    resid = jnp.where(mask, resid, 0.0)
    return coeff, resid, mask
