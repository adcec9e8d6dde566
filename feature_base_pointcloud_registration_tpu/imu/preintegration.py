"""IMU preintegration on SO(3)xR6, replacing gtsam::PreintegratedImuMeasurements.

The reference delegates all IMU math to GTSAM (ref: src/imuPreintegration.cpp:
52-53,115-116, integrateMeasurement at :283-285,440-441, predict at :324,446).
This module implements the same manifold preintegration (Forster et al.,
"On-Manifold Preintegration", the algorithm GTSAM implements) as a pure
lax.scan over a fixed-shape, masked sample buffer:

  dR <- dR Exp(w dt), dv <- dv + dR a dt, dp <- dp + dv dt + 1/2 dR a dt^2

with first-order bias Jacobians and 9x9 (theta, v, p) covariance propagation,
so a downstream factor-graph optimizer can weight and bias-correct the
preintegrated measurement exactly like gtsam::ImuFactor does.

float64 is unavailable on TPU; following SURVEY.md §7's note, integration
runs in float32 with the scan formulated incrementally (errors stay ~1e-6
per 0.1 s interval, validated against a float64 NumPy oracle in tests).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geom.se3 import so3_exp, so3_log

_PREC = jax.lax.Precision.HIGHEST


def _hat(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def _right_jacobian(w):
    """Right Jacobian of SO(3): Jr(w) = I - (1-cos)/t^2 [w]x + (t-sin)/t^3 [w]x^2."""
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(theta2)
    W = _hat(w)
    W2 = jnp.matmul(W, W, precision=_PREC)
    small = theta < 1e-5
    t2s = jnp.where(small, 1.0, theta2)
    a = jnp.where(small, 0.5, (1.0 - jnp.cos(theta)) / t2s)
    b = jnp.where(small, 1.0 / 6.0, (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta))
    I = jnp.eye(3, dtype=w.dtype)
    return I - a[..., None, None] * W + b[..., None, None] * W2


class NavState(NamedTuple):
    """Pose + velocity (gtsam::NavState equivalent)."""

    R: jnp.ndarray  # f32 [3,3]
    p: jnp.ndarray  # f32 [3]
    v: jnp.ndarray  # f32 [3]

    @staticmethod
    def identity():
        return NavState(jnp.eye(3, dtype=jnp.float32),
                        jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32))


class PreintState(NamedTuple):
    """Preintegrated IMU measurement between two correction times."""

    dR: jnp.ndarray       # [3,3]
    dv: jnp.ndarray       # [3]
    dp: jnp.ndarray       # [3]
    dt: jnp.ndarray       # [] total integration time (deltaTij)
    # first-order bias Jacobians
    dR_dbg: jnp.ndarray   # [3,3]
    dv_dba: jnp.ndarray   # [3,3]
    dv_dbg: jnp.ndarray   # [3,3]
    dp_dba: jnp.ndarray   # [3,3]
    dp_dbg: jnp.ndarray   # [3,3]
    cov: jnp.ndarray      # [9,9] (theta, v, p)
    bias_acc: jnp.ndarray  # [3] linearization point
    bias_gyr: jnp.ndarray  # [3]

    @staticmethod
    def zero(bias_acc=None, bias_gyr=None):
        z3 = jnp.zeros((3, 3), jnp.float32)
        return PreintState(
            dR=jnp.eye(3, dtype=jnp.float32),
            dv=jnp.zeros(3, jnp.float32),
            dp=jnp.zeros(3, jnp.float32),
            dt=jnp.zeros((), jnp.float32),
            dR_dbg=z3, dv_dba=z3, dv_dbg=z3, dp_dba=z3, dp_dbg=z3,
            cov=jnp.zeros((9, 9), jnp.float32),
            bias_acc=(bias_acc if bias_acc is not None
                      else jnp.zeros(3, jnp.float32)),
            bias_gyr=(bias_gyr if bias_gyr is not None
                      else jnp.zeros(3, jnp.float32)),
        )


def integrate_measurement(state: PreintState, acc, gyr, dt,
                          acc_noise_var, gyr_noise_var, int_noise_var):
    """One IMU sample (gtsam integrateMeasurement equivalent)."""
    a = acc - state.bias_acc
    w = gyr - state.bias_gyr
    dRk = so3_exp(w * dt)
    Jr = _right_jacobian(w * dt)
    A_hat = _hat(a)
    dR = state.dR

    dR_new = jnp.matmul(dR, dRk, precision=_PREC)
    dv_new = state.dv + jnp.matmul(dR, a, precision=_PREC) * dt
    dp_new = (state.dp + state.dv * dt
              + 0.5 * jnp.matmul(dR, a, precision=_PREC) * dt * dt)

    dR_Ahat = jnp.matmul(dR, A_hat, precision=_PREC)
    dR_Ahat_dRdbg = jnp.matmul(dR_Ahat, state.dR_dbg, precision=_PREC)

    dp_dba = state.dp_dba + state.dv_dba * dt - 0.5 * dR * dt * dt
    dp_dbg = state.dp_dbg + state.dv_dbg * dt - 0.5 * dR_Ahat_dRdbg * dt * dt
    dv_dba = state.dv_dba - dR * dt
    dv_dbg = state.dv_dbg - dR_Ahat_dRdbg * dt
    dR_dbg = (jnp.matmul(dRk.T, state.dR_dbg, precision=_PREC) - Jr * dt)

    # covariance propagation, state order (theta, v, p)
    Z = jnp.zeros((3, 3), jnp.float32)
    I = jnp.eye(3, dtype=jnp.float32)
    A = jnp.block([
        [dRk.T, Z, Z],
        [-dR_Ahat * dt, I, Z],
        [-0.5 * dR_Ahat * dt * dt, I * dt, I],
    ])
    Jrdt = Jr * dt
    dRdt = dR * dt
    B = jnp.block([
        [Jrdt, Z],
        [Z, dRdt],
        [Z, 0.5 * dRdt * dt],
    ])
    dt_safe = jnp.maximum(dt, 1e-9)
    noise = jnp.concatenate([
        jnp.full(3, gyr_noise_var, jnp.float32) / dt_safe,
        jnp.full(3, acc_noise_var, jnp.float32) / dt_safe,
    ])
    cov = (jnp.matmul(jnp.matmul(A, state.cov, precision=_PREC), A.T,
                      precision=_PREC)
           + jnp.matmul(B * noise[None, :], B.T, precision=_PREC))
    # integration (position) noise, like gtsam integrationCovariance
    cov = cov.at[6:, 6:].add(jnp.eye(3) * int_noise_var * dt)

    return state._replace(
        dR=dR_new, dv=dv_new, dp=dp_new, dt=state.dt + dt,
        dR_dbg=dR_dbg, dv_dba=dv_dba, dv_dbg=dv_dbg,
        dp_dba=dp_dba, dp_dbg=dp_dbg, cov=cov,
    )


@partial(jax.jit, static_argnames=())
def preintegrate(acc, gyr, dt, mask, bias_acc, bias_gyr,
                 acc_noise_var, gyr_noise_var, int_noise_var=1e-8):
    """Integrate a masked buffer of IMU samples into one PreintState.

    acc, gyr: [N,3]; dt: [N]; mask: [N] (invalid samples are skipped).
    """
    init = PreintState.zero(bias_acc, bias_gyr)

    def body(state, xs):
        a, w, d, m = xs
        new = integrate_measurement(state, a, w, d,
                                    acc_noise_var, gyr_noise_var,
                                    int_noise_var)
        out = jax.tree.map(lambda n, o: jnp.where(m, n, o), new, state)
        return out, None

    state, _ = lax.scan(body, init, (acc, gyr, dt, mask))
    return state


def bias_corrected_delta(pre: PreintState, bias_acc, bias_gyr):
    """First-order bias correction of (dR, dv, dp) around the linearization
    point — what gtsam's biasCorrectedDelta does inside predict/ImuFactor."""
    dba = bias_acc - pre.bias_acc
    dbg = bias_gyr - pre.bias_gyr
    dR = jnp.matmul(pre.dR,
                    so3_exp(jnp.matmul(pre.dR_dbg, dbg, precision=_PREC)),
                    precision=_PREC)
    dv = (pre.dv + jnp.matmul(pre.dv_dba, dba, precision=_PREC)
          + jnp.matmul(pre.dv_dbg, dbg, precision=_PREC))
    dp = (pre.dp + jnp.matmul(pre.dp_dba, dba, precision=_PREC)
          + jnp.matmul(pre.dp_dbg, dbg, precision=_PREC))
    return dR, dv, dp


def predict(nav: NavState, bias_acc, bias_gyr, pre: PreintState,
            gravity: float = 9.80511) -> NavState:
    """Propagate a NavState through a preintegrated interval
    (gtsam predict, ref usage: src/imuPreintegration.cpp:324,446)."""
    g = jnp.asarray([0.0, 0.0, -gravity], jnp.float32)
    dR, dv, dp = bias_corrected_delta(pre, bias_acc, bias_gyr)
    R_new = jnp.matmul(nav.R, dR, precision=_PREC)
    v_new = nav.v + g * pre.dt + jnp.matmul(nav.R, dv, precision=_PREC)
    p_new = (nav.p + nav.v * pre.dt + 0.5 * g * pre.dt * pre.dt
             + jnp.matmul(nav.R, dp, precision=_PREC))
    return NavState(R=R_new, p=p_new, v=v_new)


def failure_detection(vel, bias_acc, bias_gyr,
                      vel_limit: float = 30.0, bias_limit: float = 1.0):
    """Reset trigger: |v| > 30 m/s or bias norm > 1
    (ref: src/imuPreintegration.cpp:392-411)."""
    return ((jnp.linalg.norm(vel) > vel_limit)
            | (jnp.linalg.norm(bias_acc) > bias_limit)
            | (jnp.linalg.norm(bias_gyr) > bias_limit))


@jax.jit
def propagate_states(nav: NavState, bias_acc, bias_gyr, acc, gyr, dt, mask,
                     gravity=9.80511):
    """NavState at every IMU sample time (the imuHandler prediction stream,
    ref: src/imuPreintegration.cpp:440-446 per sample).

    acc, gyr: [N,3]; dt: [N]; mask: [N].  Returns NavState with leading [N].
    """
    g = jnp.asarray([0.0, 0.0, -gravity], jnp.float32)
    a_c = acc - bias_acc
    w_c = gyr - bias_gyr

    def body(nav, xs):
        a, w, d, m = xs
        dR = so3_exp(w * d)
        R_new = jnp.matmul(nav.R, dR, precision=_PREC)
        acc_w = jnp.matmul(nav.R, a, precision=_PREC) + g
        p_new = nav.p + nav.v * d + 0.5 * acc_w * d * d
        v_new = nav.v + acc_w * d
        new = NavState(R=R_new, p=p_new, v=v_new)
        out = jax.tree.map(lambda n, o: jnp.where(m, n, o), new, nav)
        return out, out

    _, states = lax.scan(body, nav, (a_c, w_c, dt, mask))
    return states
