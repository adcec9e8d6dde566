"""Data model — fixed-shape pytrees replacing the reference's message types.

The reference moves data between stages as a `feature_matching::cloud_info`
message (ref: msg/cloud_info.msg:1-34): ring start/end indices, per-point
column index and range, IMU attitude init, odometry initial guess, reset id,
and three embedded clouds.  Raw input points carry (x, y, z, intensity, ring,
time) (`PointXYZIRT`, ref: src/imageProjection.cpp:8-21).

Here each of those becomes a NamedTuple of fixed-shape jnp arrays with
explicit validity masks (ragged data is padded, never dynamically shaped),
so every stage is jit/vmap/shard_map-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class RawScan(NamedTuple):
    """One raw lidar scan, padded to a fixed max point count.

    Mirrors PointXYZIRT (ref: src/imageProjection.cpp:8-21).
    """

    xyz: jnp.ndarray        # f32 [N, 3]
    intensity: jnp.ndarray  # f32 [N]
    ring: jnp.ndarray       # i32 [N]
    time: jnp.ndarray       # f32 [N] per-point time relative to scan start
    valid: jnp.ndarray      # bool [N]

    @staticmethod
    def from_numpy(xyz, intensity, ring, time, max_points=None):
        n = xyz.shape[0]
        cap = max_points or n
        pad = cap - n
        assert pad >= 0, f"scan has {n} points > cap {cap}"

        def _pad(a, fill=0):
            return np.concatenate([a, np.full((pad,) + a.shape[1:], fill, a.dtype)])

        return RawScan(
            xyz=jnp.asarray(_pad(xyz.astype(np.float32))),
            intensity=jnp.asarray(_pad(intensity.astype(np.float32))),
            ring=jnp.asarray(_pad(ring.astype(np.int32))),
            time=jnp.asarray(_pad(time.astype(np.float32))),
            valid=jnp.asarray(
                np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
            ),
        )


class DeskewInfo(NamedTuple):
    """IMU/odom info attached to one scan for motion compensation and the
    pose initial guess (ref: imuDeskewInfo/odomDeskewInfo,
    src/imageProjection.cpp:323-491)."""

    imu_time: jnp.ndarray      # f32 [Q] imu sample times rel. scan start (+inf pad)
    imu_rot: jnp.ndarray       # f32 [Q, 3] integrated gyro rotation since scan start
    imu_count: jnp.ndarray     # i32 [] index of last valid sample (imuPointerCur)
    imu_available: jnp.ndarray  # bool []
    imu_rpy_init: jnp.ndarray  # f32 [3] attitude at scan start (imuRollInit..)
    odom_available: jnp.ndarray  # bool []
    initial_guess: jnp.ndarray  # f32 [6] pose6 [r,p,y,x,y,z] from preintegration
    odom_incre: jnp.ndarray    # f32 [3] scan-duration translation increment
    odom_deskew_flag: jnp.ndarray  # bool []
    reset_id: jnp.ndarray      # i32 [] imuPreintegrationResetId

    @staticmethod
    def empty(queue_len: int = 512):
        return DeskewInfo(
            imu_time=jnp.full((queue_len,), jnp.inf, jnp.float32),
            imu_rot=jnp.zeros((queue_len, 3), jnp.float32),
            imu_count=jnp.asarray(0, jnp.int32),
            imu_available=jnp.asarray(False),
            imu_rpy_init=jnp.zeros((3,), jnp.float32),
            odom_available=jnp.asarray(False),
            initial_guess=jnp.zeros((6,), jnp.float32),
            odom_incre=jnp.zeros((3,), jnp.float32),
            odom_deskew_flag=jnp.asarray(False),
            reset_id=jnp.asarray(0, jnp.int32),
        )


class CloudInfo(NamedTuple):
    """The inter-stage contract (ref: msg/cloud_info.msg:1-34).

    Compacted range-image cloud plus ring bookkeeping.  `points`/`point_range`
    etc. are padded to n_scan*horizon_scan with `point_valid` masks; the
    compaction order is row-major over the range image exactly like
    cloudExtraction (ref: src/imageProjection.cpp:642-670).
    """

    start_ring_index: jnp.ndarray  # i32 [n_scan]
    end_ring_index: jnp.ndarray    # i32 [n_scan]
    point_col_ind: jnp.ndarray     # i32 [P]
    point_range: jnp.ndarray       # f32 [P]
    point_valid: jnp.ndarray       # bool [P]
    num_points: jnp.ndarray        # i32 []
    points: jnp.ndarray            # f32 [P, 3] deskewed, compacted
    intensity: jnp.ndarray         # f32 [P]
    imu_available: jnp.ndarray     # bool []
    odom_available: jnp.ndarray    # bool []
    imu_rpy_init: jnp.ndarray      # f32 [3]
    initial_guess: jnp.ndarray     # f32 [6] pose6
    reset_id: jnp.ndarray          # i32 []


class ScanFeatures(NamedTuple):
    """LOAM feature sets extracted from one CloudInfo — the payload of
    cloud_corner / cloud_surface (ref: src/featureExtraction.h:306-315)."""

    corner_xyz: jnp.ndarray   # f32 [corner_cap, 3]
    corner_mask: jnp.ndarray  # bool [corner_cap]
    surf_xyz: jnp.ndarray     # f32 [surf_cap, 3]
    surf_mask: jnp.ndarray    # bool [surf_cap]


class FeatureMap(NamedTuple):
    """A (local or global) feature map: corner + surf point sets with masks.
    Replaces laserCloud{Corner,Surf}FromMapDS (ref: src/mapOptmization.h:107-108)."""

    corner_xyz: jnp.ndarray   # f32 [Mc, 3]
    corner_mask: jnp.ndarray  # bool [Mc]
    surf_xyz: jnp.ndarray     # f32 [Ms, 3]
    surf_mask: jnp.ndarray    # bool [Ms]
