"""Integrated LIO topology — the test.launch process pair, fully wired.

The reference's running system routes every sensor message through its
sensor-facing components before any math sees it:

  * every IMU sample through imuConverter (extrinsic rotation into the lidar
    frame; ref: src/imageProjection.cpp:152, include/utility.h:219-253) in
    BOTH the projection node and the preintegration node
    (src/imuPreintegration.cpp:417);
  * every point cloud through cachePointCloud (>=3 queued, field checks;
    ref: src/imageProjection.cpp:186,229-301);
  * the IMU-rate odometry stream through odomDeskewInfo to produce the
    scan-bracketing initial guess + positional-deskew increment
    (ref: src/imageProjection.cpp:395-491).

LioTopology is that wiring as one host object: ScanBuffer + OdomQueue +
ImuOdometry + SlamPipeline, with the reset-id protocol closed end-to-end.
A caller with a real sensor (ext_rot != I, as in the reference's own
config/params.yaml:37-42) feeds RAW IMU-frame samples to `handle_imu` and
raw clouds to `handle_cloud`; everything else is internal.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..geom.se3 import euler_from_quat
from ..imu.conversion import imu_converter
from .cloud_info import RawScan
from .frontend import make_deskew_info
from .imu_odometry import ImuOdometry
from .scan_buffer import OdomQueue, ScanBuffer
from .slam import SlamPipeline


@dataclasses.dataclass
class LioTopology:
    """The imageProjection + imuPreintegration process pair as one driver."""

    params: Params
    max_keyframes: int = 256
    imu_window: int = 16
    imu_max_samples: int = 128
    history_seconds: float = 5.0   # converted-sample retention for deskew

    def __post_init__(self):
        from ..utils.log import get_logger

        self._log = get_logger()
        self.slam = SlamPipeline(self.params, max_keyframes=self.max_keyframes)
        self.odo = ImuOdometry(self.params, window=self.imu_window,
                               max_samples=self.imu_max_samples)
        self.scan_buffer = ScanBuffer()
        self.odom_queue = OdomQueue()
        # converted (lidar-frame) IMU history for the deskew table
        self._imu_t: list = []
        self._imu_gyr: list = []
        self._imu_rpy: list = []   # attitude from the converted quaternion

    # ------------------------------------------------------------------ imu
    def handle_imu(self, t, acc, gyr, quat=None):
        """Ingest RAW IMU-frame sample(s); scalars or [n]-batches.

        Applies imuConverter (ext_rot / ext_rpy) before anything downstream —
        the reference does this in both nodes' imuHandlers.  `quat` is the
        9-axis orientation (x,y,z,w); None means 6-axis input (attitude
        unavailable for initialization, like a VLP+6-axis rig).
        """
        t = np.atleast_1d(np.asarray(t, np.float64))
        acc = np.asarray(acc, np.float32).reshape(len(t), 3)
        gyr = np.asarray(gyr, np.float32).reshape(len(t), 3)
        has_quat = quat is not None
        if has_quat:
            quat = np.asarray(quat, np.float32).reshape(len(t), 4)
        else:
            quat = np.tile(np.array([0, 0, 0, 1], np.float32), (len(t), 1))

        acc_l, gyr_l, quat_l, valid = imu_converter(
            self.params, jnp.asarray(acc), jnp.asarray(gyr),
            jnp.asarray(quat))
        if has_quat and not bool(jnp.all(valid)):
            # ref: utility.h:246-250 — ros::shutdown on invalid quaternion
            raise RuntimeError(
                "Invalid quaternion, please use a 9-axis IMU!")
        acc_l = np.asarray(acc_l)
        gyr_l = np.asarray(gyr_l)
        r_, p_, y_ = euler_from_quat(quat_l)
        rpy_l = np.stack([np.asarray(r_), np.asarray(p_), np.asarray(y_)],
                         axis=-1).reshape(len(t), 3).astype(np.float32)

        for i in range(len(t)):
            self.odo.handle_imu(float(t[i]), acc_l[i], gyr_l[i])
            self._imu_t.append(float(t[i]))
            self._imu_gyr.append(gyr_l[i])
            self._imu_rpy.append(rpy_l[i] if has_quat else np.zeros(3,
                                                                    np.float32))
        # trim history
        cutoff = float(t[-1]) - self.history_seconds
        while self._imu_t and self._imu_t[0] < cutoff:
            self._imu_t.pop(0)
            self._imu_gyr.pop(0)
            self._imu_rpy.pop(0)

    def _flush_odometry(self):
        """Drain IMU-rate odometry into the OdomQueue (the odomTopic edge,
        ref: src/imuPreintegration.cpp:457-476 publish -> imageProjection
        odometryHandler :176-179)."""
        ts = [s[0] for s in self.odo._pending]
        out = self.odo.flush_imu_odometry()
        if out is None:
            return
        pose6, _ = out
        for t, p6 in zip(ts, np.asarray(pose6)):
            self.odom_queue.push(t, p6, reset_id=self.odo.reset_id)

    # ---------------------------------------------------------------- cloud
    def handle_cloud(self, stamp: float, scan: RawScan, *,
                     has_ring: bool = True, has_time: bool = True,
                     is_dense: bool = True) -> Optional[np.ndarray]:
        """Ingest one raw cloud; returns the mapped pose once the buffer
        emits a scan (cloudHandler, ref: src/imageProjection.cpp:182-226)."""
        buf = self.scan_buffer.push(scan, stamp, has_ring=has_ring,
                                    has_time=has_time, is_dense=is_dense)
        if buf is None:
            return None
        self._flush_odometry()

        t_cur, t_next = buf.time_scan_cur, buf.time_scan_next
        (odom_avail, guess, rid, odom_incre,
         odom_flag) = self.odom_queue.deskew_info(t_cur, t_next)

        # attitude at scan start: last converted 9-axis sample <= t_cur+0.01
        # (imuDeskewInfo, ref :338-345)
        imu_rpy = None
        for i in range(len(self._imu_t) - 1, -1, -1):
            if self._imu_t[i] <= t_cur + 0.01:
                imu_rpy = self._imu_rpy[i]
                break

        if buf.deskew_enabled:
            times = np.asarray(self._imu_t)
            gyros = (np.stack(self._imu_gyr) if self._imu_gyr
                     else np.zeros((0, 3), np.float32))
        else:
            # missing per-point time field: deskew disabled (warned at push)
            times = np.zeros(0)
            gyros = np.zeros((0, 3), np.float32)

        dsk = make_deskew_info(
            self.params, times, gyros, scan_start=t_cur, scan_end=t_next,
            imu_rpy=imu_rpy,
            initial_guess=guess if odom_avail else None,
            odom_incre=odom_incre, odom_deskew_flag=odom_flag,
            reset_id=rid)

        est = self.slam.step(buf.scan, timestamp=t_cur, deskew_info=dsk)
        # the mapping -> preintegration correction edge with the reset id
        # (ref: src/mapOptmization.h:1802 covariance[0] smuggle)
        self.odo.handle_odometry(t_cur, est, reset_id=self.slam.reset_id)
        return est
