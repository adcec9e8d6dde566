"""Front end: raw scan -> deskewed CloudInfo -> downsampled features.

One functional step replacing the reference's ImageProjection ->
FeatureExtraction in-process call chain (ref: src/imageProjection.cpp:182-226
cloudHandler; it invokes featureExtra at :203).  Everything is jitted and
fixed-shape; the returned features are already voxel-downsampled with the
mapping leaf sizes (downsampleCurrentScan, ref: src/mapOptmization.h:981-993)
so they can go straight into register_scan.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import Params
from ..ops.features import extract_features
from ..ops.projection import project_scan
from ..ops.voxel import voxel_downsample
from .cloud_info import CloudInfo, DeskewInfo, RawScan, ScanFeatures


def process_scan(params: Params, scan: RawScan,
                 deskew_info: DeskewInfo | None = None,
                 enable_deskew: bool = True,
                 downsample: bool = True
                 ) -> Tuple[CloudInfo, ScanFeatures]:
    """Project + extract + (optionally) downsample one scan."""
    cloud = project_scan(params, scan, deskew_info, enable_deskew=enable_deskew)
    feats = extract_features(params, cloud, strict=params.strict_feature_pick)
    if downsample:
        feats = downsample_features(params, feats)
    return cloud, feats


def downsample_features(params: Params, feats: ScanFeatures) -> ScanFeatures:
    """downsampleCurrentScan (ref: src/mapOptmization.h:981-993): corner leaf
    mappingCornerLeafSize, surf leaf mappingSurfLeafSize."""
    cx, cm, _ = voxel_downsample(feats.corner_xyz, feats.corner_mask,
                                 params.mapping_corner_leaf_size,
                                 feats.corner_xyz.shape[0])
    sx, sm, _ = voxel_downsample(feats.surf_xyz, feats.surf_mask,
                                 params.mapping_surf_leaf_size,
                                 feats.surf_xyz.shape[0])
    return ScanFeatures(cx, cm, sx, sm)


def make_deskew_info(params: Params, imu_time, imu_gyro, scan_start: float,
                     scan_end: float, imu_rpy=None, initial_guess=None,
                     reset_id: int = 0, odom_incre=None,
                     odom_deskew_flag: bool = False) -> DeskewInfo:
    """Build the per-scan deskew table from raw IMU samples (host-side prep).

    Mirrors imuDeskewInfo (ref: src/imageProjection.cpp:323-393): keep samples
    in [scan_start-0.01, scan_end+0.01], record attitude at scan start,
    forward-Euler integrate gyro into a rotation table relative to scan start.
    Times in the returned table are relative to scan_start.

    `initial_guess` / `odom_incre` / `odom_deskew_flag` carry odomDeskewInfo's
    outputs (ref :395-491) — feed them from `scan_buffer.OdomQueue.deskew_info`
    so positional deskew and the odometry initial guess reach the pipeline.
    """
    import numpy as np

    q = params.imu_queue_len
    imu_time = np.asarray(imu_time, np.float64)
    imu_gyro = np.asarray(imu_gyro, np.float64)

    keep = imu_time >= scan_start - 0.01
    imu_time = imu_time[keep]
    imu_gyro = imu_gyro[keep]

    table_t = np.full(q, np.inf, np.float32)
    table_r = np.zeros((q, 3), np.float32)
    ptr = 0
    rot = np.zeros(3, np.float64)
    prev_t = None
    for i in range(len(imu_time)):
        t = imu_time[i]
        if t > scan_end + 0.01:
            break
        if ptr == 0:
            table_t[0] = t - scan_start
            table_r[0] = 0.0
            prev_t = t
            ptr = 1
            continue
        dt = t - prev_t
        rot = rot + imu_gyro[i] * dt
        if ptr < q:
            table_t[ptr] = t - scan_start
            table_r[ptr] = rot
            ptr += 1
        prev_t = t

    available = ptr > 1  # imuPointerCur-- then <=0 check (ref :385-389)
    return DeskewInfo(
        imu_time=jnp.asarray(table_t),
        imu_rot=jnp.asarray(table_r),
        imu_count=jnp.asarray(max(ptr - 1, 0), jnp.int32),
        imu_available=jnp.asarray(bool(available)),
        imu_rpy_init=jnp.asarray(
            imu_rpy if imu_rpy is not None else np.zeros(3), jnp.float32),
        odom_available=jnp.asarray(initial_guess is not None),
        initial_guess=jnp.asarray(
            initial_guess if initial_guess is not None else np.zeros(6),
            jnp.float32),
        odom_incre=jnp.asarray(
            odom_incre if odom_incre is not None else np.zeros(3),
            jnp.float32),
        odom_deskew_flag=jnp.asarray(bool(odom_deskew_flag)),
        reset_id=jnp.asarray(reset_id, jnp.int32),
    )
