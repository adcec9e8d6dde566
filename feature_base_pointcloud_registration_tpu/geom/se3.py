"""SE(3) / Euler-angle core, matching the PCL conventions the reference uses.

Convention (ZYX intrinsic, a.k.a. yaw-pitch-roll extrinsic XYZ):
  pcl::getTransformation(x, y, z, roll, pitch, yaw) builds
      R = Rz(yaw) @ Ry(pitch) @ Rx(roll),  t = (x, y, z)
  and pcl::getTranslationAndEulerAngles inverts it with
      roll  = atan2(R[2,1], R[2,2])
      pitch = asin(-R[2,0])
      yaw   = atan2(R[1,0], R[0,0])
  (used throughout the reference, e.g. src/mapOptmization.h:309,326,414,447).
tf::Matrix3x3::getRPY and tf::createQuaternionFromRPY use the same convention.

Pose vector layout: `pose6 = [roll, pitch, yaw, x, y, z]`, matching the
reference's `transformTobeMapped[6]` (src/mapOptmization.h:131).

All functions are pure jnp, broadcast over leading batch dims, and safe to
jit/vmap.  float32 throughout (the reference's solver is float32 via CV_32F).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU matmuls default to bf16; geometry needs full f32 everywhere.
_PREC = jax.lax.Precision.HIGHEST


def euler_to_rot(roll, pitch, yaw):
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll); broadcasts, returns (..., 3, 3)."""
    roll, pitch, yaw = jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_euler(R):
    """Inverse of euler_to_rot (PCL getTranslationAndEulerAngles extraction)."""
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


def pose6_to_matrix(pose6):
    """[roll,pitch,yaw,x,y,z] -> homogeneous (..., 4, 4)."""
    pose6 = jnp.asarray(pose6)
    R = euler_to_rot(pose6[..., 0], pose6[..., 1], pose6[..., 2])
    t = pose6[..., 3:6]
    batch = pose6.shape[:-1]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def matrix_to_pose6(T):
    roll, pitch, yaw = rot_to_euler(T[..., :3, :3])
    return jnp.stack(
        [roll, pitch, yaw, T[..., 0, 3], T[..., 1, 3], T[..., 2, 3]], axis=-1
    )


def inverse_matrix(T):
    """Rigid-transform inverse: [R t]⁻¹ = [Rᵀ -Rᵀt]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t, precision=_PREC)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def compose_pose6(a, b):
    """pose6 composition: matrix(a) @ matrix(b) -> pose6."""
    return matrix_to_pose6(
        jnp.matmul(pose6_to_matrix(a), pose6_to_matrix(b), precision=_PREC)
    )


def apply_transform(T, pts):
    """Apply (...,4,4) rigid transform to (...,N,3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts, precision=_PREC) + t[..., None, :]


def quat_from_euler(roll, pitch, yaw):
    """tf-convention quaternion (x,y,z,w) from RPY: q = qz(yaw)qy(pitch)qx(roll)."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([x, y, z, w], axis=-1)


def euler_from_quat(q):
    """RPY from quaternion (x,y,z,w), same convention as tf getRPY."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return roll, pitch, yaw


def quat_slerp(q0, q1, t):
    """Spherical linear interpolation between quaternions (x,y,z,w).

    Matches tf::Quaternion::slerp (used in the IMU attitude fusion,
    ref: src/mapOptmization.h:1464).  Falls back to lerp for nearly
    parallel quaternions.
    """
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot_c = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot_c)
    sin_theta = jnp.sin(theta)
    near = sin_theta < 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_theta))
    out = w0 * q0 + w1 * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def so3_exp(w):
    """Rodrigues: axis-angle (...,3) -> rotation matrix (...,3,3)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    small = theta[..., 0] < 1e-8
    safe = jnp.where(theta < 1e-8, 1.0, theta)
    k = w / safe
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], axis=-1),
            jnp.stack([kz, zero, -kx], axis=-1),
            jnp.stack([-ky, kx, zero], axis=-1),
        ],
        axis=-2,
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    th = theta[..., None]
    R = I + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * jnp.matmul(K, K, precision=_PREC)
    return jnp.where(small[..., None, None], I, R)


def so3_log(R):
    """Rotation matrix (...,3,3) -> axis-angle (...,3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    # Small-angle: log(R) ≈ v/2.  Near pi handled via the diagonal route.
    small = theta < 1e-6
    scale = jnp.where(small, 0.5, theta / jnp.where(small, 1.0, 2.0 * sin_t))
    w = v * scale[..., None]
    # Near theta = pi, sin(theta) -> 0 and v -> 0; recover axis from diagonal.
    near_pi = theta > 3.0
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.clip((diag - cos_t[..., None]) / (1.0 - cos_t[..., None] + 1e-12), 0.0, None)
    axis = jnp.sqrt(axis2)
    signs = jnp.sign(
        jnp.stack(
            [
                R[..., 2, 1] - R[..., 1, 2],
                R[..., 0, 2] - R[..., 2, 0],
                R[..., 1, 0] - R[..., 0, 1],
            ],
            axis=-1,
        )
        + 1e-20
    )
    w_pi = axis * signs * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def kabsch(src, dst, weights=None):
    """Weighted rigid alignment: finds (R, t) minimizing Σ w‖R·src + t − dst‖².

    SVD/Kabsch — the batched-scan-pair coarse aligner (BASELINE.json config 1).
    src, dst: (..., N, 3); weights: (..., N) or None.  Returns (...,4,4).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-12)
    mu_s = jnp.sum(src * w[..., None], axis=-2, keepdims=True)
    mu_d = jnp.sum(dst * w[..., None], axis=-2, keepdims=True)
    sc = src - mu_s
    dc = dst - mu_d
    H = jnp.einsum("...ni,...nj->...ij", sc * w[..., None], dc, precision=_PREC)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(jnp.matmul(jnp.swapaxes(Vt, -1, -2), jnp.swapaxes(U, -1, -2), precision=_PREC))
    S = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), H.shape).copy()
    S = S.at[..., 2, 2].set(d)
    R = jnp.matmul(jnp.matmul(jnp.swapaxes(Vt, -1, -2), S, precision=_PREC),
                   jnp.swapaxes(U, -1, -2), precision=_PREC)
    t = mu_d[..., 0, :] - jnp.einsum("...ij,...j->...i", R, mu_s[..., 0, :], precision=_PREC)
    T = jnp.zeros(src.shape[:-2] + (4, 4), dtype=src.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T
