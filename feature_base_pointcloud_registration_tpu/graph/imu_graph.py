"""IMU-preintegration factor chain: the iSAM2-in-imuPreintegration replacement.

The reference maintains a chain graph { ImuFactor(k-1,k), bias BetweenFactor,
pose PriorFactor(k) } optimized by iSAM2 after every lidar correction
(ref: src/imuPreintegration.cpp:296-332), reset every 100 keys with marginal
covariances carried into new priors (ref :234-267).  Here the same chain is a
fixed-cap masked window of 15-dim states (pose6, vel3, bias6) optimized by
batch Gauss-Newton/LM; the reset trick maps to re-priming the window priors.

IMU factor residual (Forster-style, matching gtsam::ImuFactor):
  r_R = Log( dR(b)^T R_i^T R_j )
  r_v = R_i^T (v_j - v_i - g dt) - dv(b)
  r_p = R_i^T (p_j - p_i - v_i dt - 1/2 g dt^2) - dp(b)
whitened by the preintegrated 9x9 covariance; dR/dv/dp are first-order
bias-corrected around the preintegration linearization point.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geom.se3 import euler_to_rot, so3_exp, so3_log
from ..imu.preintegration import PreintState

_PREC = jax.lax.Precision.HIGHEST

# state layout: [roll, pitch, yaw, x, y, z, vx, vy, vz, bax, bay, baz, bgx, bgy, bgz]
STATE_DIM = 15


class ImuChainData(NamedTuple):
    states: jnp.ndarray       # f32 [K, 15] initial values
    state_mask: jnp.ndarray   # bool [K]
    preint: PreintState       # batched [K]; entry k = interval (k-1, k)
    preint_mask: jnp.ndarray  # bool [K] (entry 0 unused)
    pose_meas: jnp.ndarray    # f32 [K, 6] lidar-odometry pose corrections
    pose_sigma: jnp.ndarray   # f32 [K, 6]
    pose_meas_mask: jnp.ndarray  # bool [K]
    prior_state: jnp.ndarray  # f32 [15] prior on key 0
    prior_sigma: jnp.ndarray  # f32 [15]
    bias_sigma: jnp.ndarray   # f32 [6] continuous bias random-walk sigmas
    gravity: jnp.ndarray      # f32 []


def _imu_residual(s_i, s_j, pre: PreintState, gravity):
    """9-dim whitened-later residual of one preintegrated interval."""
    Ri = euler_to_rot(s_i[0], s_i[1], s_i[2])
    Rj = euler_to_rot(s_j[0], s_j[1], s_j[2])
    pi_, pj = s_i[3:6], s_j[3:6]
    vi, vj = s_i[6:9], s_j[6:9]
    ba, bg = s_i[9:12], s_i[12:15]
    g = jnp.stack([0.0 * gravity, 0.0 * gravity, -gravity])

    dba = ba - pre.bias_acc
    dbg = bg - pre.bias_gyr
    dR = jnp.matmul(
        pre.dR, so3_exp(jnp.matmul(pre.dR_dbg, dbg, precision=_PREC)),
        precision=_PREC)
    dv = (pre.dv + jnp.matmul(pre.dv_dba, dba, precision=_PREC)
          + jnp.matmul(pre.dv_dbg, dbg, precision=_PREC))
    dp = (pre.dp + jnp.matmul(pre.dp_dba, dba, precision=_PREC)
          + jnp.matmul(pre.dp_dbg, dbg, precision=_PREC))

    dt = pre.dt
    r_R = so3_log(jnp.matmul(dR.T, jnp.matmul(Ri.T, Rj, precision=_PREC),
                             precision=_PREC))
    r_v = jnp.matmul(Ri.T, vj - vi - g * dt, precision=_PREC) - dv
    r_p = (jnp.matmul(Ri.T, pj - pi_ - vi * dt - 0.5 * g * dt * dt,
                      precision=_PREC) - dp)
    return jnp.concatenate([r_R, r_v, r_p])


def _whiten(pre: PreintState, r):
    """Whiten a 9-dim residual with the preintegrated covariance (Cholesky)."""
    cov = pre.cov + jnp.eye(9) * 1e-10
    L = jnp.linalg.cholesky(cov)
    return jax.scipy.linalg.solve_triangular(L, r, lower=True)


def _imu_res_whitened(s_i, s_j, pre, gravity):
    return _whiten(pre, _imu_residual(s_i, s_j, pre, gravity))


def _bias_res(s_i, s_j, pre, bias_sigma):
    sig = jnp.sqrt(jnp.maximum(pre.dt, 1e-6)) * bias_sigma  # ref :313
    return (s_j[9:15] - s_i[9:15]) / sig


def _pose_prior_res(s, meas, sigma):
    Rm = euler_to_rot(meas[0], meas[1], meas[2])
    R = euler_to_rot(s[0], s[1], s[2])
    dR = jnp.matmul(Rm.T, R, precision=_PREC)
    dt = jnp.matmul(Rm.T, s[3:6] - meas[3:6], precision=_PREC)
    return jnp.concatenate([so3_log(dR), dt]) / sigma


def _init_prior_res(s, prior, sigma):
    return (s - prior) / sigma


def _all_residuals_and_jacs(d: ImuChainData, states):
    K = states.shape[0]
    s_prev = states[jnp.maximum(jnp.arange(K) - 1, 0)]
    s_cur = states

    r_imu = jax.vmap(_imu_res_whitened, in_axes=(0, 0, 0, None))(
        s_prev, s_cur, d.preint, d.gravity)
    Ji = jax.vmap(jax.jacfwd(_imu_res_whitened, argnums=0),
                  in_axes=(0, 0, 0, None))(s_prev, s_cur, d.preint, d.gravity)
    Jj = jax.vmap(jax.jacfwd(_imu_res_whitened, argnums=1),
                  in_axes=(0, 0, 0, None))(s_prev, s_cur, d.preint, d.gravity)

    r_b = jax.vmap(_bias_res, in_axes=(0, 0, 0, None))(
        s_prev, s_cur, d.preint, d.bias_sigma)
    Jbi = jax.vmap(jax.jacfwd(_bias_res, argnums=0), in_axes=(0, 0, 0, None))(
        s_prev, s_cur, d.preint, d.bias_sigma)
    Jbj = jax.vmap(jax.jacfwd(_bias_res, argnums=1), in_axes=(0, 0, 0, None))(
        s_prev, s_cur, d.preint, d.bias_sigma)

    r_pp = jax.vmap(_pose_prior_res)(s_cur, d.pose_meas, d.pose_sigma)
    Jpp = jax.vmap(jax.jacfwd(_pose_prior_res))(s_cur, d.pose_meas, d.pose_sigma)

    r_0 = _init_prior_res(states[0], d.prior_state, d.prior_sigma)
    J_0 = jax.jacfwd(_init_prior_res)(states[0], d.prior_state, d.prior_sigma)

    m_imu = d.preint_mask & d.state_mask
    m_pp = d.pose_meas_mask & d.state_mask

    def mz(r, J, m):
        return (jnp.where(m[:, None], r, 0.0),
                jnp.where(m[:, None, None], J, 0.0))

    r_imu, Ji = mz(r_imu, Ji, m_imu)[0], mz(r_imu, Ji, m_imu)[1]
    Jj = jnp.where(m_imu[:, None, None], Jj, 0.0)
    r_b = jnp.where(m_imu[:, None], r_b, 0.0)
    Jbi = jnp.where(m_imu[:, None, None], Jbi, 0.0)
    Jbj = jnp.where(m_imu[:, None, None], Jbj, 0.0)
    r_pp, Jpp = mz(r_pp, Jpp, m_pp)
    return (r_imu, Ji, Jj), (r_b, Jbi, Jbj), (r_pp, Jpp), (r_0, J_0)


def _cost(d: ImuChainData, states):
    (r_imu, _, _), (r_b, _, _), (r_pp, _), (r_0, _) = \
        _all_residuals_and_jacs(d, states)
    return (jnp.sum(r_imu ** 2) + jnp.sum(r_b ** 2) + jnp.sum(r_pp ** 2)
            + jnp.sum(r_0 ** 2))


def _assemble(d: ImuChainData, states):
    K = states.shape[0]
    D = K * STATE_DIM
    (r_imu, Ji, Jj), (r_b, Jbi, Jbj), (r_pp, Jpp), (r_0, J_0) = \
        _all_residuals_and_jacs(d, states)

    H = jnp.zeros((D, D), jnp.float32)
    grad = jnp.zeros((D,), jnp.float32)
    idx_prev = jnp.maximum(jnp.arange(K) - 1, 0).astype(jnp.int32)
    idx_cur = jnp.arange(K, dtype=jnp.int32)

    def outer(Ja, Jb):
        return jnp.einsum("fab,fac->fbc", Ja, Jb, precision=_PREC)

    def add_block(H, ia, ib, blocks):
        rows = ia[:, None] * STATE_DIM + jnp.arange(STATE_DIM)[None, :]
        cols = ib[:, None] * STATE_DIM + jnp.arange(STATE_DIM)[None, :]
        return H.at[rows[:, :, None], cols[:, None, :]].add(blocks)

    def add_grad(grad, idx, vecs):
        rows = idx[:, None] * STATE_DIM + jnp.arange(STATE_DIM)[None, :]
        return grad.at[rows].add(vecs)

    for (r, Ja, Jb) in ((r_imu, Ji, Jj), (r_b, Jbi, Jbj)):
        H = add_block(H, idx_prev, idx_prev, outer(Ja, Ja))
        H = add_block(H, idx_cur, idx_cur, outer(Jb, Jb))
        H = add_block(H, idx_prev, idx_cur, outer(Ja, Jb))
        H = add_block(H, idx_cur, idx_prev, outer(Jb, Ja))
        grad = add_grad(grad, idx_prev,
                        jnp.einsum("fab,fa->fb", Ja, r, precision=_PREC))
        grad = add_grad(grad, idx_cur,
                        jnp.einsum("fab,fa->fb", Jb, r, precision=_PREC))

    H = add_block(H, idx_cur, idx_cur, outer(Jpp, Jpp))
    grad = add_grad(grad, idx_cur,
                    jnp.einsum("fab,fa->fb", Jpp, r_pp, precision=_PREC))

    H = H.at[:STATE_DIM, :STATE_DIM].add(
        jnp.matmul(J_0.T, J_0, precision=_PREC))
    grad = grad.at[:STATE_DIM].add(jnp.matmul(J_0.T, r_0, precision=_PREC))
    return H, grad


@partial(jax.jit, static_argnames=("iterations",))
def optimize_imu_chain(d: ImuChainData, iterations: int = 5):
    """LM over the masked IMU chain window; returns (states, cost)."""
    K = d.states.shape[0]
    active = jnp.repeat(d.state_mask, STATE_DIM)

    def step(carry, _):
        states, lam, cost = carry
        H, grad = _assemble(d, states)
        # Jacobi preconditioning + relative damping: see
        # pose_graph.optimize_pose_graph for the f32-conditioning rationale.
        pin = jnp.where(active, 0.0, 1.0)
        dg = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-12)) + pin
        Hs = H / (dg[:, None] * dg[None, :])
        A = Hs + jnp.diag(lam * jnp.ones_like(dg) + pin)
        dy = jax.scipy.linalg.solve(A, -grad / dg, assume_a="pos")
        dx = jnp.where(active, dy / dg, 0.0)
        new_states = states + dx.reshape(K, STATE_DIM)
        new_cost = _cost(d, new_states)
        accept = new_cost < cost
        states = jnp.where(accept, new_states, states)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-6),
                        jnp.minimum(lam * 4.0, 1e6))
        return (states, lam, cost), None

    cost0 = _cost(d, d.states)
    (states, _, cost), _ = lax.scan(
        step, (d.states, jnp.float32(1e-4), cost0), None, length=iterations)
    return states, cost


@jax.jit
def chain_factor_blocks(d: ImuChainData, states):
    """Whitened per-factor residual/Jacobian blocks at `states`."""
    return _all_residuals_and_jacs(d, states)


def state_marginal_covariance(d: ImuChainData, states, idx: int):
    """15x15 marginal covariance of state `idx` — the carried prior for the
    window reset (ref: src/imuPreintegration.cpp:241-253 reads
    marginalCovariance(X/V/B(key-1)) into the new priors).  Blocks come
    off-device in f32; the Hessian assembles + solves on host in f64 (see
    pose_graph.pose_marginal_covariance for the f32-cancellation hazard)."""
    import numpy as np

    (r_imu, Ji, Jj), (r_b, Jbi, Jbj), (r_pp, Jpp), (r_0, J_0) = jax.tree.map(
        lambda a: np.asarray(a, np.float64),
        chain_factor_blocks(d, jnp.asarray(states)))
    K = d.states.shape[0]
    D = K * STATE_DIM
    H = np.zeros((D, D))
    S = STATE_DIM
    ip = np.maximum(np.arange(K) - 1, 0)
    ic = np.arange(K)

    def add(ia, ib, Ja, Jb):
        blocks = np.einsum("fab,fac->fbc", Ja, Jb)
        for f in range(len(ia)):
            H[ia[f] * S:(ia[f] + 1) * S, ib[f] * S:(ib[f] + 1) * S] += blocks[f]

    for (Ja, Jb) in ((Ji, Jj), (Jbi, Jbj)):
        add(ip, ip, Ja, Ja)
        add(ic, ic, Jb, Jb)
        add(ip, ic, Ja, Jb)
        add(ic, ip, Jb, Ja)
    add(ic, ic, Jpp, Jpp)
    H[:S, :S] += J_0.T @ J_0
    active = np.repeat(np.asarray(d.state_mask), S)
    H[np.diag_indices(D)] += np.where(active, 0.0, 1.0)

    rows = int(idx) * S + np.arange(S)
    E = np.zeros((D, S))
    E[rows, np.arange(S)] = 1.0
    X = np.linalg.solve(H, E)
    return X[rows]
