"""IMU frame conversion — the imuConverter equivalent.

Rotates IMU accel/gyro into the lidar frame via the extrinsic rotation and
the orientation quaternion via the RPY extrinsic, with the 9-axis validity
check (ref: include/utility.h:219-253)."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Params

_PRECISION = "highest"


def _quat_mul(a, b):
    """Hamilton product, (x,y,z,w) layout."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def _rot_to_quat(R):
    """Rotation matrix -> quaternion (x,y,z,w); assumes proper rotation."""
    t = R[0, 0] + R[1, 1] + R[2, 2]
    w = jnp.sqrt(jnp.maximum(1.0 + t, 1e-12)) / 2.0
    x = (R[2, 1] - R[1, 2]) / (4.0 * w)
    y = (R[0, 2] - R[2, 0]) / (4.0 * w)
    z = (R[1, 0] - R[0, 1]) / (4.0 * w)
    return jnp.stack([x, y, z, w])


def imu_converter(params: Params, acc, gyr, quat):
    """Convert IMU samples into the lidar frame.

    acc, gyr: [..., 3]; quat: [..., 4] (x,y,z,w) orientation.
    Returns (acc_l, gyr_l, quat_l, valid) — valid mirrors the reference's
    9-axis check (quaternion norm >= 0.1, ref: utility.h:246-250).
    """
    ext_rot = jnp.asarray(params.ext_rot, jnp.float32).reshape(3, 3)
    ext_rpy = jnp.asarray(params.ext_rpy, jnp.float32).reshape(3, 3)

    acc_l = jnp.einsum("ij,...j->...i", ext_rot, acc,
                       precision=_PRECISION)
    gyr_l = jnp.einsum("ij,...j->...i", ext_rot, gyr,
                       precision=_PRECISION)
    q_ext = _rot_to_quat(ext_rpy)
    quat_l = _quat_mul(jnp.broadcast_to(q_ext, quat.shape), quat)
    valid = jnp.linalg.norm(quat_l, axis=-1) >= 0.1
    return acc_l, gyr_l, quat_l, valid
