"""Sliding-window Levenberg-Marquardt pose-graph optimizer.

The JAX replacement for the reference's GTSAM iSAM2 back end
(ref: src/mapOptmization.h:153-159 construction, :1658-1669 updates) with the
same factor types:

  * prior factor on pose 0 (addOdomFactor first branch, ref :1520-1527)
  * between (odometry) factors     (ref :1531-1539)
  * GPS position factors           (addGPSFactor, ref :1543-1634)
  * loop-closure between factors   (performLoopClosure, ref :743-765)

iSAM2's incremental relinearization is replaced by batch LM over a fixed-cap,
masked window — matching trajectories, not internals (SURVEY.md §7).  The
state is poses [K, 6] in pose6 = (roll, pitch, yaw, x, y, z); residuals use
GTSAM-style local coordinates [so3_log(rot err), translation err] whitened by
per-factor diagonal sigmas.  Jacobians come from per-factor jacfwd (tiny
6->12 maps, vmapped over factors) scattered into a dense Hessian — exact
Gauss-Newton structure, one 6K x 6K solve per LM step (K <= a few hundred:
trivial for the MXU).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geom.se3 import euler_to_rot, so3_log

_PREC = jax.lax.Precision.HIGHEST


class PoseGraphData(NamedTuple):
    """Fixed-capacity factor storage (masked)."""

    poses: jnp.ndarray          # f32 [K, 6] initial values
    pose_mask: jnp.ndarray      # bool [K] active variables
    prior_idx: jnp.ndarray      # i32 [Fp]
    prior_meas: jnp.ndarray     # f32 [Fp, 6]
    prior_sigma: jnp.ndarray    # f32 [Fp, 6]
    prior_mask: jnp.ndarray     # bool [Fp]
    btw_i: jnp.ndarray          # i32 [Fb]
    btw_j: jnp.ndarray          # i32 [Fb]
    btw_meas: jnp.ndarray       # f32 [Fb, 6] relative pose6 (i -> j)
    btw_sigma: jnp.ndarray      # f32 [Fb, 6]
    btw_mask: jnp.ndarray       # bool [Fb]
    gps_idx: jnp.ndarray        # i32 [Fg]
    gps_meas: jnp.ndarray       # f32 [Fg, 3]
    gps_sigma: jnp.ndarray      # f32 [Fg, 3]
    gps_mask: jnp.ndarray       # bool [Fg]

    @staticmethod
    def empty(K: int, Fp: int, Fb: int, Fg: int):
        return PoseGraphData(
            poses=jnp.zeros((K, 6), jnp.float32),
            pose_mask=jnp.zeros(K, bool),
            prior_idx=jnp.zeros(Fp, jnp.int32),
            prior_meas=jnp.zeros((Fp, 6), jnp.float32),
            prior_sigma=jnp.ones((Fp, 6), jnp.float32),
            prior_mask=jnp.zeros(Fp, bool),
            btw_i=jnp.zeros(Fb, jnp.int32),
            btw_j=jnp.zeros(Fb, jnp.int32),
            btw_meas=jnp.zeros((Fb, 6), jnp.float32),
            btw_sigma=jnp.ones((Fb, 6), jnp.float32),
            btw_mask=jnp.zeros(Fb, bool),
            gps_idx=jnp.zeros(Fg, jnp.int32),
            gps_meas=jnp.zeros((Fg, 3), jnp.float32),
            gps_sigma=jnp.ones((Fg, 3), jnp.float32),
            gps_mask=jnp.zeros(Fg, bool),
        )


def _local_coords(meas6, pose6):
    """GTSAM-style error of `pose` w.r.t. measurement: [log(Rm^T R), Rm^T(t-tm)]."""
    Rm = euler_to_rot(meas6[0], meas6[1], meas6[2])
    R = euler_to_rot(pose6[0], pose6[1], pose6[2])
    dR = jnp.matmul(Rm.T, R, precision=_PREC)
    dt = jnp.matmul(Rm.T, pose6[3:6] - meas6[3:6], precision=_PREC)
    return jnp.concatenate([so3_log(dR), dt])


def between_residual(pose_i, pose_j, meas6):
    """Error of the relative transform (T_i^-1 T_j) w.r.t. meas."""
    Ri = euler_to_rot(pose_i[0], pose_i[1], pose_i[2])
    Rj = euler_to_rot(pose_j[0], pose_j[1], pose_j[2])
    Rij = jnp.matmul(Ri.T, Rj, precision=_PREC)
    tij = jnp.matmul(Ri.T, pose_j[3:6] - pose_i[3:6], precision=_PREC)
    rel = jnp.concatenate([
        jnp.stack(_rot_to_rpy(Rij)), tij
    ])
    return _local_coords(meas6, rel)


def _rot_to_rpy(R):
    roll = jnp.arctan2(R[2, 1], R[2, 2])
    pitch = jnp.arcsin(jnp.clip(-R[2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(R[1, 0], R[0, 0])
    return roll, pitch, yaw


def _prior_res(pose, meas, sigma):
    return _local_coords(meas, pose) / sigma


def _btw_res(pose_i, pose_j, meas, sigma):
    return between_residual(pose_i, pose_j, meas) / sigma


def _gps_res(pose, meas, sigma):
    return (pose[3:6] - meas) / sigma


def _graph_cost_terms(g: PoseGraphData, poses):
    """All whitened residuals + per-factor Jacobian blocks."""
    # priors
    p_pose = poses[g.prior_idx]
    r_p = jax.vmap(_prior_res)(p_pose, g.prior_meas, g.prior_sigma)
    J_p = jax.vmap(jax.jacfwd(_prior_res))(p_pose, g.prior_meas, g.prior_sigma)
    # betweens
    b_pi = poses[g.btw_i]
    b_pj = poses[g.btw_j]
    r_b = jax.vmap(_btw_res)(b_pi, b_pj, g.btw_meas, g.btw_sigma)
    J_bi = jax.vmap(jax.jacfwd(_btw_res, argnums=0))(
        b_pi, b_pj, g.btw_meas, g.btw_sigma)
    J_bj = jax.vmap(jax.jacfwd(_btw_res, argnums=1))(
        b_pi, b_pj, g.btw_meas, g.btw_sigma)
    # gps
    g_pose = poses[g.gps_idx]
    r_g = jax.vmap(_gps_res)(g_pose, g.gps_meas, g.gps_sigma)
    J_g = jax.vmap(jax.jacfwd(_gps_res))(g_pose, g.gps_meas, g.gps_sigma)

    r_p = jnp.where(g.prior_mask[:, None], r_p, 0.0)
    J_p = jnp.where(g.prior_mask[:, None, None], J_p, 0.0)
    r_b = jnp.where(g.btw_mask[:, None], r_b, 0.0)
    J_bi = jnp.where(g.btw_mask[:, None, None], J_bi, 0.0)
    J_bj = jnp.where(g.btw_mask[:, None, None], J_bj, 0.0)
    r_g = jnp.where(g.gps_mask[:, None], r_g, 0.0)
    J_g = jnp.where(g.gps_mask[:, None, None], J_g, 0.0)
    return (r_p, J_p), (r_b, J_bi, J_bj), (r_g, J_g)


def _assemble(g: PoseGraphData, poses, K):
    """Dense H = J^T J and gradient = J^T r from per-factor blocks."""
    (r_p, J_p), (r_b, J_bi, J_bj), (r_g, J_g) = _graph_cost_terms(g, poses)
    D = K * 6
    H = jnp.zeros((D, D), jnp.float32)
    grad = jnp.zeros((D,), jnp.float32)

    def outer(Ja, Jb):
        return jnp.einsum("fab,fac->fbc", Ja, Jb, precision=_PREC)

    def add_block(H, idx_a, idx_b, blocks):
        # scatter [F,6,6] blocks into H at (idx_a*6, idx_b*6)
        F = blocks.shape[0]
        rows = idx_a[:, None] * 6 + jnp.arange(6)[None, :]
        cols = idx_b[:, None] * 6 + jnp.arange(6)[None, :]
        return H.at[rows[:, :, None], cols[:, None, :]].add(blocks)

    def add_grad(grad, idx, vecs):
        rows = idx[:, None] * 6 + jnp.arange(6)[None, :]
        return grad.at[rows].add(vecs)

    # priors
    H = add_block(H, g.prior_idx, g.prior_idx, outer(J_p, J_p))
    grad = add_grad(grad, g.prior_idx,
                    jnp.einsum("fab,fa->fb", J_p, r_p, precision=_PREC))
    # betweens (4 blocks each)
    H = add_block(H, g.btw_i, g.btw_i, outer(J_bi, J_bi))
    H = add_block(H, g.btw_j, g.btw_j, outer(J_bj, J_bj))
    H = add_block(H, g.btw_i, g.btw_j, outer(J_bi, J_bj))
    H = add_block(H, g.btw_j, g.btw_i, outer(J_bj, J_bi))
    grad = add_grad(grad, g.btw_i,
                    jnp.einsum("fab,fa->fb", J_bi, r_b, precision=_PREC))
    grad = add_grad(grad, g.btw_j,
                    jnp.einsum("fab,fa->fb", J_bj, r_b, precision=_PREC))
    # gps (Jacobian blocks are [F,3,6])
    Hg = jnp.einsum("fab,fac->fbc", J_g, J_g, precision=_PREC)
    H = add_block(H, g.gps_idx, g.gps_idx, Hg)
    grad = add_grad(grad, g.gps_idx,
                    jnp.einsum("fab,fa->fb", J_g, r_g, precision=_PREC))

    cost = (jnp.sum(r_p * r_p) + jnp.sum(r_b * r_b) + jnp.sum(r_g * r_g))
    return H, grad, cost


def _total_cost(g: PoseGraphData, poses):
    (r_p, _), (r_b, _, _), (r_g, _) = _graph_cost_terms(g, poses)
    return jnp.sum(r_p * r_p) + jnp.sum(r_b * r_b) + jnp.sum(r_g * r_g)


@partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(g: PoseGraphData, iterations: int = 10):
    """Levenberg-Marquardt over the masked window.

    Returns (optimized poses [K,6], final cost).  Inactive poses (mask=False)
    are pinned by a unit ridge so H stays invertible.
    """
    K = g.poses.shape[0]
    D = K * 6
    active = jnp.repeat(g.pose_mask, 6)

    def step(carry, _):
        poses, lam, cost = carry
        H, grad, _ = _assemble(g, poses, K)
        # Jacobi-precondition before the f32 Cholesky: factor weights span
        # ~1e-8 (the wide gauge prior) to ~1e6 (tight betweens / fit-scaled
        # loop factors), far beyond f32 solve conditioning — unscaled, the
        # GN step comes out garbage, every LM step is rejected, and the
        # optimizer stalls.  After scaling, uniform relative damping `lam`
        # (floor 1e-6) bounds the condition number even along the
        # global-translation gauge direction.
        pin = jnp.where(active, 0.0, 1.0)
        d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-12)) + pin
        Hs = H / (d[:, None] * d[None, :])
        A = Hs + jnp.diag(lam * jnp.ones_like(d) + pin)
        dy = jax.scipy.linalg.solve(A, -grad / d, assume_a="pos")
        dx = jnp.where(active, dy / d, 0.0)
        new_poses = poses + dx.reshape(K, 6)
        new_cost = _total_cost(g, new_poses)
        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-6),
                        jnp.minimum(lam * 4.0, 1e6))
        return (poses, lam, cost), None

    cost0 = _total_cost(g, g.poses)
    (poses, _, cost), _ = lax.scan(
        step, (g.poses, jnp.float32(1e-4), cost0), None, length=iterations)
    return poses, cost


@jax.jit
def graph_factor_blocks(g: PoseGraphData, poses):
    """Whitened per-factor residuals + Jacobian blocks at `poses` (masked
    entries zeroed) — the square-root-form inputs for host-side f64
    marginal-covariance assembly."""
    return _graph_cost_terms(g, poses)


def pose_marginal_covariances(g: PoseGraphData, poses, idxs,
                              active: int | None = None):
    """6x6 marginal covariances of several poses from ONE factorization.

    The reference reads isam->marginalCovariance(latest) after every update
    (ref: src/mapOptmization.h:1706) to gate GPS factors (poseCovThreshold,
    ref :1596-1599) and to prime the preintegration reset priors
    (ref: src/imuPreintegration.cpp:241-253).  The per-factor Jacobian
    BLOCKS come off-device in f32 (their entries span ~1e-4, the wide xyz
    prior, to ~1e3, tight betweens — individually representable), but the
    Hessian is assembled and inverted on host in f64: in f32, summing the
    1e-8-information prior into 1e6-scale between blocks annihilates the
    only constraint on the global-translation gauge and H goes singular.

    `active` restricts assembly + solve to the first `active` poses (all
    factor endpoints must lie below it, true for the SLAM graph's padded
    storage) — without it, a padded K=512 graph with 10 live keyframes
    would factorize a dense 3072x3072 anyway.  All requested `idxs` share
    one assembly and one factorization (multiple RHS columns).
    """
    import numpy as np

    (r_p, J_p), (r_b, J_bi, J_bj), (r_g, J_g) = jax.tree.map(
        lambda a: np.asarray(a, np.float64),
        graph_factor_blocks(g, jnp.asarray(poses)))
    K = g.poses.shape[0]
    n = K if active is None else min(int(active), K)
    if any(int(i) >= n for i in idxs):
        raise ValueError(f"requested pose index >= active count {n}")
    D = n * 6
    H = np.zeros((D, D))

    def add(ia, ib, Ja, Jb):
        blocks = np.einsum("fab,fac->fbc", Ja, Jb)
        for f in range(len(ia)):
            a, b = ia[f], ib[f]
            if a < n and b < n:
                H[a * 6:(a + 1) * 6, b * 6:(b + 1) * 6] += blocks[f]

    pi = np.asarray(g.prior_idx)
    bi, bj = np.asarray(g.btw_i), np.asarray(g.btw_j)
    gi = np.asarray(g.gps_idx)
    add(pi, pi, J_p, J_p)
    add(bi, bi, J_bi, J_bi)
    add(bj, bj, J_bj, J_bj)
    add(bi, bj, J_bi, J_bj)
    add(bj, bi, J_bj, J_bi)
    add(gi, gi, J_g, J_g)
    active_rows = np.repeat(np.asarray(g.pose_mask)[:n], 6)
    H[np.diag_indices(D)] += np.where(active_rows, 0.0, 1.0)

    cols = np.concatenate([int(i) * 6 + np.arange(6) for i in idxs])
    E = np.zeros((D, len(cols)))
    E[cols, np.arange(len(cols))] = 1.0
    X = np.linalg.solve(H, E)
    return [X[int(i) * 6 + np.arange(6)][:, k * 6:(k + 1) * 6]
            for k, i in enumerate(idxs)]


def pose_marginal_covariance(g: PoseGraphData, poses, idx: int,
                             active: int | None = None):
    """6x6 marginal covariance [rot(3), trans(3)] of pose `idx`."""
    return pose_marginal_covariances(g, poses, [idx], active=active)[0]
