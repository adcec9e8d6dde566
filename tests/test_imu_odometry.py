import numpy as np
import jax
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.pipeline.imu_odometry import (
    ImuOdometry)

G = 9.80511


def _simulate(duration=2.0, imu_hz=100.0, lidar_hz=10.0, seed=0):
    """Platform moving with constant body rates + world acceleration.

    Returns imu samples (lidar-frame) and ground-truth poses at both rates."""
    rng = np.random.RandomState(seed)
    dt = 1.0 / imu_hz
    n = int(duration * imu_hz)
    w_body = np.array([0.02, -0.03, 0.25])
    a_world = np.array([0.4, -0.2, 0.0])
    g_world = np.array([0.0, 0.0, -G])

    R = np.eye(3)
    p = np.zeros(3)
    v = np.zeros(3)
    out = []
    for i in range(n):
        t = i * dt
        acc_body = R.T @ (a_world - g_world)
        out.append((t, acc_body.copy(), w_body.copy(), R.copy(), p.copy(),
                    v.copy()))
        p = p + v * dt + 0.5 * a_world * dt * dt
        v = v + a_world * dt
        th = np.linalg.norm(w_body * dt)
        k = w_body * dt / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = R @ (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K)
    return out


def _rpy_from_R(R):
    return np.array([np.arctan2(R[2, 1], R[2, 2]),
                     np.arcsin(np.clip(-R[2, 0], -1, 1)),
                     np.arctan2(R[1, 0], R[0, 0])])


def test_imu_odometry_tracks_ground_truth():
    params = Params()
    odo = ImuOdometry(params, window=16, max_samples=64)
    sim = _simulate(duration=2.0)
    lidar_period = 0.1

    next_correction = 0.0
    preds = []
    pending_gt = []
    for (t, acc, gyr, R, p, v) in sim:
        if t >= next_correction:
            # one batched flush per scan interval (TPU dispatch grain)
            out = odo.flush_imu_odometry()
            if out is not None:
                assert len(out[0]) == len(pending_gt)
                for (pp, pv), (tg, gp, gv) in zip(zip(*out), pending_gt):
                    preds.append((tg, pp, pv, gp, gv))
            pending_gt = []
            pose6 = np.concatenate([_rpy_from_R(R), p]).astype(np.float32)
            odo.handle_odometry(t, pose6, reset_id=0)
            next_correction += lidar_period
        odo.handle_imu(t, acc, gyr)
        pending_gt.append((t, p, v))

    assert len(preds) > 100
    # prediction error against ground truth (perfect IMU, frequent corrections)
    errs_p = np.array([np.linalg.norm(pp[3:] - gp) for _, pp, _, gp, _ in preds])
    errs_v = np.array([np.linalg.norm(pv - gv) for _, _, pv, _, gv in preds])
    assert np.median(errs_p) < 0.05, np.median(errs_p)
    assert errs_p[-50:].max() < 0.15, errs_p[-50:].max()
    assert np.median(errs_v) < 0.2, np.median(errs_v)


def test_imu_odometry_window_reset():
    params = Params()
    odo = ImuOdometry(params, window=4, max_samples=32)  # tiny window: resets
    sim = _simulate(duration=1.5)
    next_correction = 0.0
    n_corrections = 0
    for (t, acc, gyr, R, p, v) in sim:
        if t >= next_correction:
            pose6 = np.concatenate([_rpy_from_R(R), p]).astype(np.float32)
            odo.handle_odometry(t, pose6, reset_id=0)
            n_corrections += 1
            next_correction += 0.1
        odo.handle_imu(t, acc, gyr)
    # window=4 with ~15 corrections must have gone through >= 3 resets
    assert n_corrections > 3 * odo.window
    assert odo.system_initialized
    assert odo.key < odo.window


def test_imu_odometry_reset_id_protocol():
    """A reset-id bump (loop closure) must re-initialize the filter
    (ref: src/imuPreintegration.cpp:161-172)."""
    params = Params()
    odo = ImuOdometry(params, window=8, max_samples=32)
    sim = _simulate(duration=0.6)
    next_correction = 0.0
    for (t, acc, gyr, R, p, v) in sim:
        if t >= next_correction:
            pose6 = np.concatenate([_rpy_from_R(R), p]).astype(np.float32)
            odo.handle_odometry(t, pose6, reset_id=0)
            next_correction += 0.1
        odo.handle_imu(t, acc, gyr)
    assert odo.done_first_opt
    # bump the reset id -> pipeline must reset and re-init on next correction
    odo.handle_odometry(0.65, np.zeros(6, np.float32), reset_id=1)
    assert not odo.system_initialized
    assert odo.reset_id == 1
    odo.handle_odometry(0.7, np.zeros(6, np.float32), reset_id=1)
    assert odo.system_initialized
