"""Gauss-Newton pose update with LOAM's degeneracy projection.

Rebuild of LMOptimization (ref: src/mapOptmization.h:1246-1401; despite the
name it is a plain Gauss-Newton step).  The reference builds the Jacobian
row-by-row through a lidar->camera axis permutation; algebraically each row
is simply

    J_i = [ n_i^T (dR/droll) p_i,  n_i^T (dR/dpitch) p_i,  n_i^T (dR/dyaw) p_i,
            n_x, n_y, n_z ],     b_i = -w_i * d_i

with R = Rz(yaw) Ry(pitch) Rx(roll) (the PCL convention) — the expanded
arx/ary/arz terms at ref :1311-1324 are exactly these products.  We build it
analytically from the rotation factor derivatives, masked over padded
correspondences, and solve the 6x6 normal equations by eigendecomposition
(symmetric PSD), which doubles as the degeneracy analysis:

  * on iteration 0, eigenvalues < 100 mark degenerate directions; the update
    projector P = V diag(lambda >= 100) V^T is cached and applied to every
    subsequent step (ref :1346-1377) — including iteration 0 itself.
  * convergence when |dR| < 0.05 deg and |dt| < 0.05 cm (ref :1388-1400).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


class GNState(NamedTuple):
    pose6: jnp.ndarray        # f32 [6] (roll,pitch,yaw,x,y,z)
    matP: jnp.ndarray         # f32 [6,6] degeneracy projector (iter-0 cached)
    is_degenerate: jnp.ndarray  # bool []
    converged: jnp.ndarray    # bool []
    n_corr: jnp.ndarray       # i32 []


def _rotation_derivatives(roll, pitch, yaw):
    """dR/droll, dR/dpitch, dR/dyaw for R = Rz(y)Ry(p)Rx(r)."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)

    dR_roll = jnp.array(
        [
            [0.0, cy * sp * cr + sy * sr, -cy * sp * sr + sy * cr],
            [0.0, sy * sp * cr - cy * sr, -sy * sp * sr - cy * cr],
            [0.0, cp * cr, -cp * sr],
        ],
        dtype=jnp.float32,
    )
    dR_pitch = jnp.array(
        [
            [-cy * sp, cy * cp * sr, cy * cp * cr],
            [-sy * sp, sy * cp * sr, sy * cp * cr],
            [-cp, -sp * sr, -sp * cr],
        ],
        dtype=jnp.float32,
    )
    dR_yaw = jnp.array(
        [
            [-sy * cp, -sy * sp * sr - cy * cr, -sy * sp * cr + cy * sr],
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [0.0, 0.0, 0.0],
        ],
        dtype=jnp.float32,
    )
    return dR_roll, dR_pitch, dR_yaw


def gn_step(state: GNState, pts_lidar, coeff, resid, mask, iter_count,
            min_correspondences: int = 50,
            eigen_threshold: float = 100.0,
            converge_rot_deg: float = 0.05,
            converge_trans_cm: float = 0.05) -> GNState:
    """One masked Gauss-Newton update.

    pts_lidar: [N,3] correspondence points in the LIDAR frame (laserCloudOri);
    coeff: [N,3] s-weighted residual gradients w.r.t. the world point;
    resid: [N] s-weighted distances; mask: [N] validity.
    """
    pose = state.pose6
    n_corr = jnp.sum(mask).astype(jnp.int32)
    enough = n_corr >= min_correspondences  # ref :1268 bails below 50

    dRr, dRp, dRy = _rotation_derivatives(pose[0], pose[1], pose[2])
    rot_r = jnp.einsum("ij,nj->ni", dRr, pts_lidar, precision=_PREC)
    rot_p = jnp.einsum("ij,nj->ni", dRp, pts_lidar, precision=_PREC)
    rot_y = jnp.einsum("ij,nj->ni", dRy, pts_lidar, precision=_PREC)

    J = jnp.concatenate(
        [
            jnp.sum(coeff * rot_r, axis=-1, keepdims=True),
            jnp.sum(coeff * rot_p, axis=-1, keepdims=True),
            jnp.sum(coeff * rot_y, axis=-1, keepdims=True),
            coeff,
        ],
        axis=-1,
    )  # [N, 6]
    J = jnp.where(mask[:, None], J, 0.0)
    b = jnp.where(mask, -resid, 0.0)

    JtJ = jnp.dot(J.T, J, precision=_PREC, preferred_element_type=jnp.float32)
    Jtb = jnp.dot(J.T, b, precision=_PREC, preferred_element_type=jnp.float32)

    lam, V = jnp.linalg.eigh(JtJ)  # ascending
    lam_safe = jnp.where(jnp.abs(lam) > 1e-9, lam, 1e-9)
    x = jnp.dot(V, jnp.dot(V.T, Jtb, precision=_PREC) / lam_safe, precision=_PREC)

    # Degeneracy analysis cached at iteration 0 (ref :1346-1371).
    good = lam >= eigen_threshold
    matP_new = jnp.dot(V * good[None, :], V.T, precision=_PREC)
    is_deg_new = jnp.any(~good)
    matP = jnp.where(iter_count == 0, matP_new, state.matP)
    is_degenerate = jnp.where(iter_count == 0, is_deg_new, state.is_degenerate)

    x = jnp.where(is_degenerate, jnp.dot(matP, x, precision=_PREC), x)

    delta_r_deg = jnp.sqrt(jnp.sum((x[:3] * (180.0 / jnp.pi)) ** 2))
    delta_t_cm = jnp.sqrt(jnp.sum((x[3:] * 100.0) ** 2))
    converged = enough & (delta_r_deg < converge_rot_deg) & (delta_t_cm < converge_trans_cm)

    pose_new = jnp.where(enough, pose + x, pose)
    return GNState(
        pose6=pose_new,
        matP=matP,
        is_degenerate=is_degenerate,
        converged=converged,
        n_corr=n_corr,
    )
