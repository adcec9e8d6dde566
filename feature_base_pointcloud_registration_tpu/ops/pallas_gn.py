"""Fused Gauss-Newton round: ONE Pallas kernel per solve round per scan.

Round 2 measured the batched solve ~84% device-idle: each GN iteration of
register_rounds_core lowers to ~50 XLA fusions whose fixed launch/ramp
overheads dwarf the actual VPU work (device-busy 0.45 ms/scan vs 2.9 ms
wall, docs/ROUND_NOTES.md).  This kernel runs a scan's ENTIRE round — all
candidate-local GN iterations: transform, 5-NN selection among K
candidates, line/plane fits, Jacobian assembly, JtJ reduction (MXU),
6x6 solve, degeneracy projection, convergence — inside VMEM, one grid
program per scan lane.

Because each lane is its own grid program with its own iteration guard
(@pl.when on the lane's converged flag), a converged lane stops paying for
iterations immediately — there is NO cross-lane while_loop lockstep, so
throughput scales monotonically with batch size (round-2's B=64 regression
was exactly that lockstep).

Replaces the reference's hot loop (scan2MapOptimization,
ref: src/mapOptmization.h:1403-1442) for the batched TPU path.  The math
mirrors ops/correspondence.py + ops/solver.py kernel-side:

  * 5-of-K selection: iterative min-extraction, ties by lower index
    (select_smallest semantics);
  * corner line fit: closed-form 3x3 spectrum (ops/eig3.py port);
  * surf plane fit: 3-reflection Householder least squares;
  * JtJ/Jtb/n_corr: one (8,P)x(8,P) MXU contraction per iteration —
    rows [Jr, Jp, Jy, nx, ny, nz, b, mask];
  * solve: vectorized Gauss-Jordan on the augmented (8,8) tile of
    (JtJ + 1e-2 I | Jtb) — the tiny Tikhonov shift perturbs directions
    with eigenvalue >= 100 (the degeneracy threshold, ref :1362) by
    <= 1e-4 relative, far below the 0.05deg/0.05cm convergence grain;
    degenerate directions are zeroed by matP anyway.  The reference
    itself solves by QR each iteration (cv::solve, ref :1343) and
    eigendecomposes only at iteration 0.  Kept fully in vector registers:
    per-element VPU->scalar reads are ~100-cycle syncs and dominated the
    first version of this kernel;
  * iteration-0 degeneracy analysis: scalar-unrolled cyclic Jacobi
    (6 sweeps) -> matP = V diag(lam >= thresh) V^T (ref :1346-1377).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38
_PI = 3.14159265358979


def _arccos(x):
    """Vector arccos from primitives Mosaic has (sqrt + polynomial):
    Hastings/Abramowitz-Stegun 4.4.45 8-term, |err| <= 2e-8 — Mosaic
    implements neither acos nor atan2."""
    ax = jnp.abs(x)
    p = jnp.float32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * ax + c
    acos_pos = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x >= 0, acos_pos, _PI - acos_pos)

# stat vector slots (f32): [0:6] pose6, [6] executed iterations,
# [7] converged, [8] is_degenerate, [9] feature gate, [10] n_corr
STAT = 16


def _jacobi6(a, sweeps: int = 6):
    """Scalar-unrolled cyclic Jacobi on a symmetric 6x6.

    a: dict[(i,j)] -> scalar, i<=j.  Returns (eigvals[6], V dict[(i,j)])
    with A = V diag(w) V^T (columns of V are eigenvectors).
    """
    A = {}
    for i in range(6):
        for j in range(6):
            A[(i, j)] = a[(min(i, j), max(i, j))]
    V = {(i, j): (jnp.float32(1.0) if i == j else jnp.float32(0.0))
         for i in range(6) for j in range(6)}
    for _ in range(sweeps):
        for p in range(6):
            for q in range(p + 1, 6):
                apq = A[(p, q)]
                app = A[(p, p)]
                aqq = A[(q, q)]
                small = jnp.abs(apq) < 1e-20
                apq_s = jnp.where(small, 1.0, apq)
                tau = (aqq - app) / (2.0 * apq_s)
                t = jnp.sign(tau) / (jnp.abs(tau)
                                     + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(tau == 0.0, 1.0, t)
                t = jnp.where(small, 0.0, t)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                nA = dict(A)
                for k in range(6):
                    akp = A[(k, p)]
                    akq = A[(k, q)]
                    nA[(k, p)] = c * akp - s * akq
                    nA[(k, q)] = s * akp + c * akq
                A2 = dict(nA)
                for k in range(6):
                    apk = nA[(p, k)]
                    aqk = nA[(q, k)]
                    A2[(p, k)] = c * apk - s * aqk
                    A2[(q, k)] = s * apk + c * aqk
                A = A2
                nV = dict(V)
                for k in range(6):
                    vkp = V[(k, p)]
                    vkq = V[(k, q)]
                    nV[(k, p)] = c * vkp - s * vkq
                    nV[(k, q)] = s * vkp + c * vkq
                V = nV
    return [A[(i, i)] for i in range(6)], V


def _sym3_lam_max_mid(a00, a01, a02, a11, a12, a22):
    """Largest + middle eigenvalue of a symmetric 3x3 in plane layout:
    trigonometric Cardano spectrum (ops/eig3.eigvals_sym3 port)."""
    q = (a00 + a11 + a22) / 3.0
    b00 = a00 - q
    b11 = a11 - q
    b22 = a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    p_safe = jnp.where(p > 1e-12, p, 1.0)
    c00 = b11 * b22 - a12 * a12
    c01 = a01 * b22 - a12 * a02
    c02 = a01 * a12 - b11 * a02
    detB = b00 * c00 - a01 * c01 + a02 * c02
    r = jnp.clip(detB / (2.0 * p_safe * p_safe * p_safe), -1.0, 1.0)
    phi = _arccos(r) / 3.0
    l2 = q + 2.0 * p * jnp.cos(phi)                        # largest
    l0 = q + 2.0 * p * jnp.cos(phi + 2.0 * _PI / 3.0)      # smallest
    l1 = 3.0 * q - l0 - l2
    near_diag = p <= 1e-12
    lam_max = jnp.where(near_diag, q, l2)
    lam_mid = jnp.where(near_diag, q, l1)
    return lam_max, lam_mid


def _corr_corner(fx, fy, fz, fm, cand, xw, yw, zw, K):
    """Corner point-to-line coefficients, plane layout.

    fx..fm: (1,P) feature planes; cand: (3K,P) candidate planes
    (x rows 0..K-1, y rows K..2K-1, z rows 2K..3K-1); xw..zw: (1,P)
    world-frame features.  Returns (ca, cb, cc, resid, maskf) all (1,P).
    Port of correspondence._corner_from_candidates.
    """
    cnx = cand[0 * K:1 * K, :]
    cny = cand[1 * K:2 * K, :]
    cnz = cand[2 * K:3 * K, :]
    dx = cnx - xw
    dy = cny - yw
    dz = cnz - zw
    d2 = dx * dx + dy * dy + dz * dz                       # (K,P)

    # 5-of-K selection: iterative min extraction, ties by lowest row
    P = d2.shape[1]
    rows = lax.broadcasted_iota(jnp.int32, (K, P), 0)
    d2m = d2
    sel = jnp.zeros((K, P), jnp.float32)
    for _ in range(5):
        m = jnp.min(d2m, axis=0, keepdims=True)            # (1,P)
        ridx = jnp.min(jnp.where(d2m == m, rows, K), axis=0,
                       keepdims=True)                      # first row
        oh = (rows == ridx).astype(jnp.float32)
        sel = sel + oh
        d2m = jnp.where(oh > 0, _BIG, d2m)
    d5max = jnp.max(jnp.where(sel > 0, d2, -jnp.inf), axis=0,
                    keepdims=True)                         # (1,P)
    gate_nn = fm * jnp.where(d5max < 1.0, 1.0, 0.0)

    cx = jnp.sum(cnx * sel, axis=0, keepdims=True) / 5.0
    cy_ = jnp.sum(cny * sel, axis=0, keepdims=True) / 5.0
    cz_ = jnp.sum(cnz * sel, axis=0, keepdims=True) / 5.0
    dvx = (cnx - cx) * sel
    dvy = (cny - cy_) * sel
    dvz = (cnz - cz_) * sel
    a00 = jnp.sum(dvx * dvx, axis=0, keepdims=True) / 5.0
    a01 = jnp.sum(dvx * dvy, axis=0, keepdims=True) / 5.0
    a02 = jnp.sum(dvx * dvz, axis=0, keepdims=True) / 5.0
    a11 = jnp.sum(dvy * dvy, axis=0, keepdims=True) / 5.0
    a12 = jnp.sum(dvy * dvz, axis=0, keepdims=True) / 5.0
    a22 = jnp.sum(dvz * dvz, axis=0, keepdims=True) / 5.0

    lam_max, lam_mid = _sym3_lam_max_mid(a00, a01, a02, a11, a12, a22)
    gate_line = jnp.where(lam_max > 3.0 * lam_mid, 1.0, 0.0)

    # principal eigenvector: largest cross product of rows of (A - lam I)
    # (ops/eig3.principal_eigvec_sym3 port)
    B00 = a00 - lam_max
    B11 = a11 - lam_max
    B22 = a22 - lam_max
    # rows: r0 = (B00, a01, a02), r1 = (a01, B11, a12), r2 = (a02, a12, B22)
    c01x = a01 * a12 - a02 * B11
    c01y = a02 * a01 - B00 * a12
    c01z = B00 * B11 - a01 * a01
    c02x = a01 * B22 - a02 * a12
    c02y = a02 * a02 - B00 * B22
    c02z = B00 * a12 - a01 * a02
    c12x = B11 * B22 - a12 * a12
    c12y = a12 * a02 - a01 * B22
    c12z = a01 * a12 - B11 * a02
    n01 = c01x * c01x + c01y * c01y + c01z * c01z
    n02 = c02x * c02x + c02y * c02y + c02z * c02z
    n12 = c12x * c12x + c12y * c12y + c12z * c12z
    use01 = jnp.where((n01 >= n02) & (n01 >= n12), 1.0, 0.0)
    use02 = jnp.where((use01 == 0.0) & (n02 >= n12), 1.0, 0.0)
    use12 = 1.0 - use01 - use02
    vx = use01 * c01x + use02 * c02x + use12 * c12x
    vy = use01 * c01y + use02 * c02y + use12 * c12y
    vz = use01 * c01z + use02 * c02z + use12 * c12z
    nrm2 = vx * vx + vy * vy + vz * vz
    nrm = jnp.sqrt(nrm2)
    ok_v = nrm > 1e-20
    inv = jnp.where(ok_v, 1.0 / jnp.where(ok_v, nrm, 1.0), 0.0)
    vx = jnp.where(ok_v, vx * inv, 1.0)
    vy = jnp.where(ok_v, vy * inv, 0.0)
    vz = jnp.where(ok_v, vz * inv, 0.0)

    # point-to-line distance + gradient (ref :1083-1120)
    x1 = cx + 0.1 * vx
    y1 = cy_ + 0.1 * vy
    z1 = cz_ + 0.1 * vz
    x2 = cx - 0.1 * vx
    y2 = cy_ - 0.1 * vy
    z2 = cz_ - 0.1 * vz
    d01x = xw - x1
    d01y = yw - y1
    d01z = zw - z1
    d02x = xw - x2
    d02y = yw - y2
    d02z = zw - z2
    crx_ = d01x * d02y - d02x * d01y
    cry_ = d01x * d02z - d02x * d01z
    crz_ = d01y * d02z - d02y * d01z
    a012 = jnp.sqrt(crx_ * crx_ + cry_ * cry_ + crz_ * crz_)
    d12x = x1 - x2
    d12y = y1 - y2
    d12z = z1 - z2
    l12 = jnp.sqrt(d12x * d12x + d12y * d12y + d12z * d12z)
    denom = a012 * l12
    safe = jnp.where(denom > 1e-12, denom, 1.0)
    la = (d12y * crx_ + d12z * cry_) / safe
    lb = -(d12x * crx_ - d12z * crz_) / safe
    lc = -(d12x * cry_ + d12y * crz_) / safe
    ld2 = a012 / jnp.where(l12 > 1e-12, l12, 1.0)
    s = 1.0 - 0.9 * jnp.abs(ld2)
    maskf = (gate_nn * gate_line * jnp.where(s > 0.1, 1.0, 0.0)
             * jnp.where(denom > 1e-12, 1.0, 0.0))
    ca = s * la * maskf
    cb = s * lb * maskf
    cc = s * lc * maskf
    resid = s * ld2 * maskf
    return ca, cb, cc, resid, maskf


def _corr_surf(fx, fy, fz, fm, cand, xw, yw, zw, K,
               min_plane_spread: float = 0.0):
    """Surface point-to-plane coefficients, plane layout.  Port of
    correspondence._surf_from_candidates (Householder least squares).

    min_plane_spread (static, meters; 0 = off = reference parity) ports the
    opt-in collinearity gate: the reference's plane-validity check (all 5
    pts within 0.2 m of the fit, ref src/mapOptmization.h:1182-1190) passes
    collinear 5-NN sets whose normals are arbitrary; the gate requires the
    5-NN scatter's middle singular value (sqrt of the middle eigenvalue of
    the 5-point covariance) to reach min_plane_spread."""
    snx = cand[0 * K:1 * K, :]
    sny = cand[1 * K:2 * K, :]
    snz = cand[2 * K:3 * K, :]
    dx = snx - xw
    dy = sny - yw
    dz = snz - zw
    d2 = dx * dx + dy * dy + dz * dz

    P = d2.shape[1]
    rows = lax.broadcasted_iota(jnp.int32, (K, P), 0)
    d2m = d2
    sel = jnp.zeros((K, P), jnp.float32)
    for _ in range(5):
        m = jnp.min(d2m, axis=0, keepdims=True)
        ridx = jnp.min(jnp.where(d2m == m, rows, K), axis=0, keepdims=True)
        oh = (rows == ridx).astype(jnp.float32)
        sel = sel + oh
        d2m = jnp.where(oh > 0, _BIG, d2m)
    d5max = jnp.max(jnp.where(sel > 0, d2, -jnp.inf), axis=0, keepdims=True)
    gate_nn = fm * jnp.where(d5max < 1.0, 1.0, 0.0)

    # Householder least squares: argmin ||A n + sel|| over selected rows
    # (A n = -1; zero rows are no-ops) — correspondence._householder_lstsq3
    cols = [snx * sel, sny * sel, snz * sel]
    y = -sel
    rdet = []
    for j in range(3):
        act = (rows >= j).astype(jnp.float32)
        x = cols[j] * act
        normx = jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True))
        pj = x[j:j + 1, :]
        alpha = -jnp.where(pj >= 0, 1.0, -1.0) * normx
        ej = (rows == j).astype(jnp.float32)
        v = x - alpha * ej
        vn2 = jnp.sum(v * v, axis=0, keepdims=True)
        inv = jnp.where(vn2 > 1e-30, 2.0 / jnp.where(vn2 > 1e-30, vn2, 1.0),
                        0.0)
        for c_ in range(j, 3):
            coef = inv * jnp.sum(v * cols[c_], axis=0, keepdims=True)
            cols[c_] = cols[c_] - coef * v
        coefy = inv * jnp.sum(v * y, axis=0, keepdims=True)
        y = y - coefy * v
    r00 = cols[0][0:1, :]
    r01 = cols[1][0:1, :]
    r02 = cols[2][0:1, :]
    r11 = cols[1][1:2, :]
    r12 = cols[2][1:2, :]
    r22 = cols[2][2:3, :]

    def _safe(dv):
        # floor at 1e-6, NOT 1e-20: a degenerate R (e.g. all-sentinel
        # candidate rows) with r22 ~ 1e-20 sends n2 to ~1e20, whose square
        # overflows fp32 to inf, and pa = inf/inf = NaN — which survives
        # the later maskf=0 multiply (NaN * 0 = NaN) and poisons the whole
        # lane's JtJ.  Any pivot this small fails the |r00 r11 r22| > 1e-5
        # determinant gate anyway, so the clamp never changes a kept plane.
        return jnp.where(jnp.abs(dv) > 1e-6,
                         dv, jnp.where(dv >= 0, 1e-6, -1e-6))

    y0 = y[0:1, :]
    y1 = y[1:2, :]
    y2 = y[2:3, :]
    n2 = y2 / _safe(r22)
    n1 = (y1 - r12 * n2) / _safe(r11)
    n0 = (y0 - r01 * n1 - r02 * n2) / _safe(r00)
    # cascaded divisions by floored pivots can still reach ~1e23 on
    # degenerate rows, whose square is inf; clip keeps every later square
    # finite.  A clip that binds means the fitted plane passes within
    # 1e-6 m of the origin — not a real plane the gates would keep.
    n0 = jnp.clip(n0, -1e6, 1e6)
    n1 = jnp.clip(n1, -1e6, 1e6)
    n2 = jnp.clip(n2, -1e6, 1e6)
    ok_det = jnp.where(jnp.abs(r00 * r11 * r22) > 1e-5, 1.0, 0.0)

    ps = jnp.sqrt(n0 * n0 + n1 * n1 + n2 * n2)
    ps_ok = ps > 1e-12
    ps_safe = jnp.where(ps_ok, ps, 1.0)
    pa = n0 / ps_safe
    pb = n1 / ps_safe
    pc = n2 / ps_safe
    pd = 1.0 / ps_safe

    # all 5 selected neighbors within 0.2 m of the plane (ref :1182-1190)
    pres = jnp.abs(pa * snx + pb * sny + pc * snz + pd)    # (K,P)
    bad = jnp.max(jnp.where(sel > 0, pres, -jnp.inf), axis=0, keepdims=True)
    plane_ok = (jnp.where(bad <= 0.2, 1.0, 0.0) * ok_det
                * jnp.where(ps_ok, 1.0, 0.0))

    pd2 = pa * xw + pb * yw + pc * zw + pd
    sumsq = xw * xw + yw * yw + zw * zw
    s = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(
        jnp.sqrt(jnp.maximum(sumsq, 1e-12)))
    maskf = gate_nn * plane_ok * jnp.where(s > 0.1, 1.0, 0.0)
    if min_plane_spread > 0.0:
        # 5-NN scatter covariance over the selected rows (exactly 5 picked)
        mx = jnp.sum(snx * sel, axis=0, keepdims=True) / 5.0
        my = jnp.sum(sny * sel, axis=0, keepdims=True) / 5.0
        mz = jnp.sum(snz * sel, axis=0, keepdims=True) / 5.0
        cdx = (snx - mx) * sel
        cdy = (sny - my) * sel
        cdz = (snz - mz) * sel
        a00 = jnp.sum(cdx * cdx, axis=0, keepdims=True) / 5.0
        a01 = jnp.sum(cdx * cdy, axis=0, keepdims=True) / 5.0
        a02 = jnp.sum(cdx * cdz, axis=0, keepdims=True) / 5.0
        a11 = jnp.sum(cdy * cdy, axis=0, keepdims=True) / 5.0
        a12 = jnp.sum(cdy * cdz, axis=0, keepdims=True) / 5.0
        a22 = jnp.sum(cdz * cdz, axis=0, keepdims=True) / 5.0
        _, lam_mid = _sym3_lam_max_mid(a00, a01, a02, a11, a12, a22)
        spread_ok = jnp.where(
            jnp.sqrt(jnp.maximum(lam_mid, 0.0)) >= min_plane_spread,
            1.0, 0.0)
        maskf = maskf * spread_ok
    ca = s * pa * maskf
    cb = s * pb * maskf
    cc = s * pc * maskf
    resid = s * pd2 * maskf
    return ca, cb, cc, resid, maskf


def _gn_round_kernel(stat_ref, matP_ref, featc_ref, feats_ref,
                     candc_ref, cands_ref, stat_out, matP_out, mp_ref,
                     *, K: int, iters: int, min_corr: int,
                     eig_thresh: float, conv_rot_deg: float,
                     conv_trans_cm: float, jacobi_sweeps: int,
                     min_plane_spread: float, cand_planes_2d: bool = False):
    """One grid program = one scan lane = one full solve round."""
    b = pl.program_id(0)
    for j in range(STAT):
        stat_out[b, j] = stat_ref[b, j]
    for j in range(36):
        matP_out[b, j] = matP_ref[b, j]

    ri8 = lax.broadcasted_iota(jnp.int32, (8, 8), 0)
    ci8 = lax.broadcasted_iota(jnp.int32, (8, 8), 1)
    # degeneracy projector as a VMEM tile (rebuilt from SMEM once per
    # program when carrying a projector across rounds)
    mp_ref[:, :] = jnp.where(ri8 == ci8, 1.0, 0.0)

    @pl.when(stat_ref[b, 8] > 0.0)
    def _():
        m = jnp.zeros((8, 8), jnp.float32)
        for i_ in range(6):
            for j_ in range(6):
                m = m + matP_ref[b, i_ * 6 + j_] * jnp.where(
                    (ri8 == i_) & (ci8 == j_), 1.0, 0.0)
        mp_ref[:, :] = m

    fcx = featc_ref[0, 0:1, :]
    fcy = featc_ref[0, 1:2, :]
    fcz = featc_ref[0, 2:3, :]
    fcm = featc_ref[0, 3:4, :]
    fsx = feats_ref[0, 0:1, :]
    fsy = feats_ref[0, 1:2, :]
    fsz = feats_ref[0, 2:3, :]
    fsm = feats_ref[0, 3:4, :]
    if cand_planes_2d:
        # plane-major fetch output [3K, B*P]: this lane's block is the
        # (3K, P) column slice the BlockSpec already carved out
        candc = candc_ref[:, :]
        cands = cands_ref[:, :]
    else:
        candc = candc_ref[0]
        cands = cands_ref[0]

    def body(i, carry):
        conv = stat_out[b, 7]
        gate = stat_out[b, 9]

        @pl.when((conv == 0.0) & (gate > 0.0))
        def _():
            roll = stat_out[b, 0]
            pitch = stat_out[b, 1]
            yaw = stat_out[b, 2]
            t0 = stat_out[b, 3]
            t1 = stat_out[b, 4]
            t2 = stat_out[b, 5]
            itc = stat_out[b, 6]

            sr = jnp.sin(roll)
            cr = jnp.cos(roll)
            sp = jnp.sin(pitch)
            cp = jnp.cos(pitch)
            sy = jnp.sin(yaw)
            cy = jnp.cos(yaw)
            # R = Rz(yaw) Ry(pitch) Rx(roll)  (geom.se3.euler_to_rot)
            r00 = cy * cp
            r01 = cy * sp * sr - sy * cr
            r02 = cy * sp * cr + sy * sr
            r10 = sy * cp
            r11 = sy * sp * sr + cy * cr
            r12 = sy * sp * cr - cy * sr
            r20 = -sp
            r21 = cp * sr
            r22 = cp * cr

            def world(fx, fy, fz):
                return (r00 * fx + r01 * fy + r02 * fz + t0,
                        r10 * fx + r11 * fy + r12 * fz + t1,
                        r20 * fx + r21 * fy + r22 * fz + t2)

            cxw, cyw, czw = world(fcx, fcy, fcz)
            sxw, syw, szw = world(fsx, fsy, fsz)

            cca, ccb, ccc, cres, cmask = _corr_corner(
                fcx, fcy, fcz, fcm, candc, cxw, cyw, czw, K)
            sca, scb, scc, sres, smask = _corr_surf(
                fsx, fsy, fsz, fsm, cands, sxw, syw, szw, K,
                min_plane_spread=min_plane_spread)

            # rotation factor derivatives (ops/solver._rotation_derivatives)
            dRr = ((0.0, cy * sp * cr + sy * sr, -cy * sp * sr + sy * cr),
                   (0.0, sy * sp * cr - cy * sr, -sy * sp * sr - cy * cr),
                   (0.0, cp * cr, -cp * sr))
            dRp = ((-cy * sp, cy * cp * sr, cy * cp * cr),
                   (-sy * sp, sy * cp * sr, sy * cp * cr),
                   (-cp, -sp * sr, -sp * cr))
            dRy = ((-sy * cp, -sy * sp * sr - cy * cr,
                    -sy * sp * cr + cy * sr),
                   (cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr),
                   (0.0, 0.0, 0.0))

            def jrows(fx, fy, fz, ca, cb, cc, resid, mask):
                def rotdot(dR):
                    gx = dR[0][0] * fx + dR[0][1] * fy + dR[0][2] * fz
                    gy = dR[1][0] * fx + dR[1][1] * fy + dR[1][2] * fz
                    gz = dR[2][0] * fx + dR[2][1] * fy + dR[2][2] * fz
                    return ca * gx + cb * gy + cc * gz

                return jnp.concatenate(
                    [rotdot(dRr), rotdot(dRp), rotdot(dRy),
                     ca, cb, cc, -resid, mask], axis=0)      # (8,P)

            Jc = jrows(fcx, fcy, fcz, cca, ccb, ccc, cres, cmask)
            Js = jrows(fsx, fsy, fsz, sca, scb, scc, sres, smask)
            J = jnp.concatenate([Jc, Js], axis=1)            # (8, Pc+Ps)
            G = lax.dot_general(J, J, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (8,8)

            colv = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            n_corr = jnp.sum(jnp.where((ri8 == 7) & (ci8 == 7), G, 0.0))
            enough = n_corr >= float(min_corr)

            # iteration-0 degeneracy analysis (ref :1346-1377): scalar
            # Jacobi runs ONCE per lane; the projector lands in both the
            # SMEM carry (for the next round's kernel) and the VMEM tile
            @pl.when(itc == 0.0)
            def _():
                def g(a_, b_):
                    return jnp.sum(jnp.where((ri8 == a_) & (ci8 == b_),
                                             G, 0.0))

                a6 = {(i_, j_): g(i_, j_) for i_ in range(6)
                      for j_ in range(i_, 6)}
                w, V = _jacobi6(a6, sweeps=jacobi_sweeps)
                isdeg = jnp.float32(0.0)
                good = []
                for i_ in range(6):
                    gd = jnp.where(w[i_] >= eig_thresh, 1.0, 0.0)
                    good.append(gd)
                    isdeg = jnp.maximum(isdeg, 1.0 - gd)
                m = jnp.zeros((8, 8), jnp.float32)
                for i_ in range(6):
                    for j_ in range(6):
                        pij = jnp.float32(0.0)
                        for k_ in range(6):
                            pij = pij + V[(i_, k_)] * good[k_] * V[(j_, k_)]
                        matP_out[b, i_ * 6 + j_] = pij
                        m = m + pij * jnp.where((ri8 == i_) & (ci8 == j_),
                                                1.0, 0.0)
                mp_ref[:, :] = m
                stat_out[b, 8] = isdeg

            # vectorized (JtJ + 1e-2 I) x = Jtb solve on the (8,8) tile:
            # Gauss-Jordan without pivoting (SPD + Tikhonov shift keeps all
            # pivots >= 1e-2); column 6 of G already holds Jtb, so x falls
            # out as a column — no per-element scalar round trips (those
            # VPU->scalar syncs dominated the first kernel version).
            eyef = jnp.where(ri8 == ci8, 1.0, 0.0)
            keep = jnp.where((ri8 < 6) & (ci8 < 7), 1.0, 0.0)
            A = (G * keep + 1e-2 * eyef * jnp.where(ri8 < 6, 1.0, 0.0)
                 + eyef * jnp.where(ri8 >= 6, 1.0, 0.0))
            for j_ in range(6):
                piv = A[j_:j_ + 1, :]                         # (1,8)
                factor = A[:, j_:j_ + 1] / A[j_:j_ + 1, j_:j_ + 1]
                notj = jnp.where(colv != j_, 1.0, 0.0)        # (8,1)
                A = A - (factor * notj) * piv
            diag = jnp.sum(A * eyef, axis=1, keepdims=True)   # (8,1)
            x_col = (A[:, 6:7] / diag) * jnp.where(colv < 6, 1.0, 0.0)

            isdeg = stat_out[b, 8]
            x_proj = lax.dot_general(mp_ref[:, :], x_col,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            x_used = jnp.where(isdeg > 0.0, x_proj, x_col)    # (8,1)

            deg2 = (180.0 / _PI) ** 2
            rmask = jnp.where(colv < 3, 1.0, 0.0)
            tmask = jnp.where((colv >= 3) & (colv < 6), 1.0, 0.0)
            x2 = x_used * x_used
            d_r = jnp.sqrt(jnp.sum(x2 * rmask) * deg2)
            d_t = jnp.sqrt(jnp.sum(x2 * tmask) * 1.0e4)
            conv_now = jnp.where(
                enough & (d_r < conv_rot_deg) & (d_t < conv_trans_cm),
                1.0, 0.0)

            ef = jnp.where(enough, 1.0, 0.0)
            for i_ in range(6):
                xi = jnp.sum(x_used * jnp.where(colv == i_, 1.0, 0.0))
                stat_out[b, i_] = stat_out[b, i_] + ef * xi
            stat_out[b, 6] = itc + 1.0
            stat_out[b, 7] = conv_now
            stat_out[b, 10] = n_corr

        return carry

    lax.fori_loop(0, iters, body, jnp.int32(0))


@functools.partial(
    jax.jit, static_argnames=("K", "iters", "min_corr", "eig_thresh",
                              "conv_rot_deg", "conv_trans_cm",
                              "jacobi_sweeps", "min_plane_spread",
                              "interpret", "vma"))
def gn_round_pallas(stat, matP, featc, feats, candc, cands, *, K: int,
                    iters: int, min_corr: int = 50,
                    eig_thresh: float = 100.0, conv_rot_deg: float = 0.05,
                    conv_trans_cm: float = 0.05, jacobi_sweeps: int = 6,
                    min_plane_spread: float = 0.0,
                    interpret: bool | None = None,
                    vma: tuple = ()):
    """Run one solve round (iters GN iterations) for every lane.

    stat [B,16], matP [B,36] (see STAT slots); featc [B,4,Pc] / feats
    [B,4,Ps] feature planes (x,y,z,mask rows); candc [B,3K,Pc] / cands
    [B,3K,Ps] candidate planes — OR, when the candidates come from a
    planes_out=True fetch, candc [3K, B*Pc] / cands [3K, B*Ps] (2-D): lane
    b's block is the contiguous column slice [:, b*P:(b+1)*P], so the
    kernel consumes the fetch output with ZERO intervening XLA transpose
    (the [B,P,K,3]->[B,3K,P] reshuffle was ~40 ms/batch at B=256).
    Returns (stat', matP').

    vma: mesh axis names the outputs vary over — required when calling
    inside shard_map(check_vma=True), where pallas outputs must declare
    their varying-manual-axes (jax.ShapeDtypeStruct(vma=...)).
    """
    B, _, Pc = featc.shape
    Ps = feats.shape[2]
    cand_planes_2d = candc.ndim == 2
    if cand_planes_2d:
        assert candc.shape == (3 * K, B * Pc), (candc.shape, (3 * K, B * Pc))
        assert cands.shape == (3 * K, B * Ps), (cands.shape, (3 * K, B * Ps))
        candc_spec = pl.BlockSpec((3 * K, Pc), lambda b: (0, b),
                                  memory_space=pltpu.VMEM)
        cands_spec = pl.BlockSpec((3 * K, Ps), lambda b: (0, b),
                                  memory_space=pltpu.VMEM)
    else:
        candc_spec = pl.BlockSpec((1, 3 * K, Pc), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
        cands_spec = pl.BlockSpec((1, 3 * K, Ps), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(
        _gn_round_kernel, K=K, iters=iters, min_corr=min_corr,
        eig_thresh=eig_thresh, conv_rot_deg=conv_rot_deg,
        conv_trans_cm=conv_trans_cm, jacobi_sweeps=jacobi_sweeps,
        min_plane_spread=min_plane_spread, cand_planes_2d=cand_planes_2d)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, Pc), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, Ps), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            candc_spec,
            cands_spec,
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, STAT), jnp.float32,
                                 vma=frozenset(vma) if vma else None),
            jax.ShapeDtypeStruct((B, 36), jnp.float32,
                                 vma=frozenset(vma) if vma else None),
        ],
        scratch_shapes=[pltpu.VMEM((8, 8), jnp.float32)],
    )(stat, matP, featc, feats, candc, cands)
