"""EKF + navsat-transform chain (module_navsat analog) unit tests.

The chain replaces robot_localization's ekf_localization_node +
navsat_transform_node (ref: launch/include/module_navsat.launch:1-22):
a 15-state kinematic EKF fused from IMU + odometry, and a datum/anchor
that republishes ENU GPS fixes as map-frame odometry for addGPSFactor
(ref: src/mapOptmization.h:1543-1634, config/params.yaml:5).
"""

import numpy as np

from feature_base_pointcloud_registration_tpu.pipeline.navsat import (
    EkfGps, NavsatTransform)


def _circle_state(t, radius=5.0, speed=2.0):
    om = speed / radius
    th = om * t
    pos = np.array([radius * np.cos(th), radius * np.sin(th), 0.0])
    yaw = th + np.pi / 2
    vel_body = np.array([speed, 0.0, 0.0])
    gyro = np.array([0.0, 0.0, om])
    return pos, yaw, vel_body, gyro


def test_ekf_tracks_circular_drive():
    """IMU attitude/rate at 10 Hz + odometry pose at 2 Hz: the fused
    odometry/navsat stream must interpolate the circle between pose
    updates (the EKF's whole job in the launch graph)."""
    r = np.random.RandomState(0)
    ekf = EkfGps()
    errs_mid = []
    for k in range(120):
        t = 0.1 * k
        pos, yaw, vel_body, gyro = _circle_state(t)
        rpy = np.array([0.0, 0.0, yaw]) + r.normal(0, 0.005, 3)
        ekf.add_imu(t, rpy, gyro + r.normal(0, 0.01, 3))
        ekf.add_velocity(t, vel_body + r.normal(0, 0.02, 3))
        if k % 5 == 0:   # 2 Hz odometry (the LIO stream)
            pose6 = np.concatenate([[0, 0, yaw], pos]) + r.normal(0, 0.01, 6)
            ekf.add_odometry(t, pose6)
        if k % 5 == 3 and k > 20:   # mid-gap: prediction quality
            est, _ = ekf.odometry(t)
            errs_mid.append(np.linalg.norm(est[3:5] - pos[:2]))
    assert np.median(errs_mid) < 0.25, (np.median(errs_mid),
                                        max(errs_mid))
    # covariance must stay finite/PSD under the f32 Joseph updates
    w = np.linalg.eigvalsh(ekf.P[:6, :6].astype(np.float64))
    assert w.min() > 0 and w.max() < 1e4, w


def test_ekf_yaw_wrap_innovation():
    """A measured yaw of +pi-eps against a state of -pi+eps must correct
    by ~0, not ~2*pi (wrapped innovation)."""
    ekf = EkfGps()
    ekf.add_imu(0.0, [0.0, 0.0, -np.pi + 0.01], [0, 0, 0])
    for k in range(5):
        ekf.add_imu(0.1 * (k + 1), [0.0, 0.0, np.pi - 0.01], [0, 0, 0])
    yaw = float(ekf.x[5])
    # equivalent heading, not a wild spin toward +pi through zero
    d = np.arctan2(np.sin(yaw - (np.pi - 0.01)),
                   np.cos(yaw - (np.pi - 0.01)))
    assert abs(d) < 0.05, (yaw, d)


def test_navsat_transform_anchors_and_aligns():
    """ENU fixes that are a rotated/offset copy of the map trajectory must
    come back as map-frame positions after the datum is set from the first
    fix + IMU heading (navsat_transform_node's alignment)."""
    ekf = EkfGps()
    nav = NavsatTransform(ekf)
    dyaw = 0.7          # map frame is rotated 0.7 rad from ENU
    c, s = np.cos(dyaw), np.sin(dyaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    anchor_enu = np.array([500.0, -200.0, 30.0])

    # drive the EKF so its pose is the map-frame truth at anchor time
    t = 0.0
    map_pos0 = np.array([1.0, 2.0, 0.0])
    ekf.add_imu(t, [0, 0, 0.3], [0, 0, 0])
    # near-exact pose measurement: the anchor should sit at the map truth
    # (a single finite-variance update keeps a Kalman-gain fraction of the
    # prior, which is correct EKF behavior but not what this test probes)
    ekf.add_odometry(t, np.concatenate([[0, 0, 0.3], map_pos0]),
                     pos_var=1e-8, rot_var=1e-8)

    # ENU = anchor + R^{-1} (map - map0); imu yaw at anchor = map yaw - dyaw
    out0 = nav.handle_fix(t, anchor_enu, [0.05, 0.05, 0.1],
                          imu_yaw=0.3 - dyaw)
    np.testing.assert_allclose(out0[0], map_pos0, atol=1e-3)

    for k in range(1, 6):
        map_pos = map_pos0 + np.array([0.5 * k, -0.2 * k, 0.0])
        enu = anchor_enu + R.T @ (map_pos - map_pos0)
        xyz_m, cov_m = nav.handle_fix(t + 0.1 * k, enu, [0.05, 0.05, 0.1])
        np.testing.assert_allclose(xyz_m, map_pos, atol=1e-3)
        assert cov_m.shape == (3,) or cov_m.shape == (3, 3)
