"""Full LIO integration (BASELINE config 4 shape): IMU preintegration
odometry feeding initial guesses + deskew info into the SLAM pipeline,
with the reset-id protocol wiring them together."""

import numpy as np
import jax
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.geom import se3
from feature_base_pointcloud_registration_tpu.io.synthetic import (
    SyntheticWorld, simulate_scan)
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import RawScan
from feature_base_pointcloud_registration_tpu.pipeline.frontend import (
    make_deskew_info)
from feature_base_pointcloud_registration_tpu.pipeline.imu_odometry import (
    ImuOdometry)
from feature_base_pointcloud_registration_tpu.pipeline.slam import SlamPipeline

G = 9.80511
PARAMS = Params(map_corner_cap=8192, map_surf_cap=65536, knn_chunk=2048)


def _simulate_platform(duration, imu_hz=100.0):
    """Constant-twist platform: yaw rate + forward velocity in body frame."""
    dt = 1.0 / imu_hz
    n = int(duration * imu_hz)
    w_body = np.array([0.0, 0.0, 0.15])
    v_body0 = np.array([1.2, 0.0, 0.0])

    R = np.eye(3)
    p = np.zeros(3)
    states = []
    imu = []
    for i in range(n):
        t = i * dt
        v_world = R @ v_body0
        # acceleration in world: d/dt (R v_b) = R (w x v_b)
        a_world = R @ np.cross(w_body, v_body0)
        acc_body = R.T @ (a_world - np.array([0, 0, -G]))
        imu.append((t, acc_body, w_body.copy()))
        states.append((t, R.copy(), p.copy(), v_world.copy()))
        p = p + v_world * dt + 0.5 * a_world * dt * dt
        th = np.linalg.norm(w_body) * dt
        k = w_body / np.linalg.norm(w_body)
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = R @ (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K)
    return imu, states


def _rpy(R):
    return np.array([np.arctan2(R[2, 1], R[2, 2]),
                     np.arcsin(np.clip(-R[2, 0], -1, 1)),
                     np.arctan2(R[1, 0], R[0, 0])], np.float32)


def test_full_lio_pipeline():
    world = SyntheticWorld()
    slam = SlamPipeline(PARAMS, max_keyframes=32)
    odo = ImuOdometry(PARAMS, window=16, max_samples=64)

    duration = 2.0
    imu, states = _simulate_platform(duration)
    scan_period = 0.2  # matches mappingProcessInterval gating
    scan_times = np.arange(0.0, duration - 0.05, scan_period)

    gt_by_time = {round(t, 4): (R, p) for (t, R, p, v) in states}

    ests, gts = [], []
    imu_idx = 0
    imu_times = np.array([s[0] for s in imu])
    last_guess = None
    for st in scan_times:
        # feed IMU up to scan time; one batched flush yields the
        # preintegration prediction (>= 10x fewer device dispatches than
        # per-sample propagation at 100 Hz)
        while imu_idx < len(imu) and imu[imu_idx][0] <= st:
            t, acc, gyr = imu[imu_idx]
            odo.handle_imu(t, acc, gyr)
            imu_idx += 1
        out = odo.flush_imu_odometry()
        if out is not None:
            last_guess = out[0][-1]

        R, p = gt_by_time[round(st, 4)]
        scan = simulate_scan(world, np.concatenate([_rpy(R), p]), seed=int(st * 10))
        raw = RawScan.from_numpy(scan["xyz"], scan["intensity"],
                                 scan["ring"], scan["time"])
        raw = raw._replace(valid=jnp.asarray(scan["valid"]))

        # deskew info carries the preintegration guess (odomDeskewInfo role)
        lo = np.searchsorted(imu_times, st - 0.05)
        hi = np.searchsorted(imu_times, st + scan_period + 0.05)
        dsk = make_deskew_info(
            PARAMS,
            imu_times[lo:hi],
            np.stack([imu[i][2] for i in range(lo, hi)]) if hi > lo else
            np.zeros((0, 3)),
            scan_start=st, scan_end=st + scan_period,
            imu_rpy=_rpy(R),
            initial_guess=last_guess,
            reset_id=slam.reset_id,
        )
        est = slam.step(raw, timestamp=float(st), deskew_info=dsk)
        ests.append(est.copy())
        gts.append(np.concatenate([_rpy(R), p]))

        # feed the SLAM pose back as the odometry correction (the
        # mapping/odometry topic, ref: imuPreintegration.cpp:88,144)
        odo.handle_odometry(float(st), est, reset_id=slam.reset_id)

    ests = np.stack(ests)
    gts = np.stack(gts)
    rel_est = np.diff(ests[:, 3:], axis=0)
    rel_gt = np.diff(gts[:, 3:], axis=0)
    rel_err = np.linalg.norm(rel_est - rel_gt, axis=1)
    # with IMU guesses the pipeline must track ~0.24 m/scan motion
    assert rel_err[1:].max() < 0.12, rel_err
    assert slam.n_keyframes >= 2
    assert odo.done_first_opt
