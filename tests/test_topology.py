"""Integration tests for the fully-wired LIO topology (round-3 VERDICT
item 3): imu_converter, ScanBuffer, and OdomQueue must be live in the
integrated pipeline, not just unit-tested in isolation.

Mirrored reference semantics: every IMU sample passes imuConverter
(src/imageProjection.cpp:152, utility.h:219-253), every cloud passes
cachePointCloud (:186,229-301), odometry passes odomDeskewInfo (:395-491),
and positional deskew is reachable end-to-end.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.io.synthetic import (
    SyntheticWorld, constant_twist_platform, simulate_scan)
from feature_base_pointcloud_registration_tpu.ops.projection import (
    project_scan)
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
    RawScan)
from feature_base_pointcloud_registration_tpu.pipeline.lio import LioTopology

PARAMS = Params(map_corner_cap=8192, map_surf_cap=65536, knn_chunk=2048)
EXT_ROT = PARAMS.ext_rot  # reference params.yaml:37-42 (non-identity)


def _raw(world, pose, seed):
    s = simulate_scan(world, pose, seed=seed)
    raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"])
    return raw._replace(valid=jnp.asarray(s["valid"]))


def test_imu_converter_is_live_in_topology():
    """Raw sensor-frame samples must come out of the topology in the lidar
    frame; with identity extrinsics the same input stays unconverted."""
    # w has x/y components: the reference ext_rot is a z-rotation, so a
    # pure-z rate would be extrinsic-invariant and prove nothing
    w_body = (0.12, -0.08, 0.1)
    imu, _ = constant_twist_platform(0.2, ext_rot=EXT_ROT, ext_rpy=EXT_ROT,
                                     w_body=w_body)
    ts = np.array([s[0] for s in imu])
    accs = np.stack([s[1] for s in imu])
    gyrs = np.stack([s[2] for s in imu])
    quats = np.stack([s[3] for s in imu])

    topo = LioTopology(PARAMS, max_keyframes=16)
    topo.handle_imu(ts, accs, gyrs, quats)
    # lidar-frame truth: the platform's body rate
    got = np.stack(topo._imu_gyr)
    np.testing.assert_allclose(got, np.tile(w_body, (len(ts), 1)), atol=1e-5)
    # converted attitude at t=0 is identity
    np.testing.assert_allclose(topo._imu_rpy[0], np.zeros(3), atol=1e-5)

    # identity extrinsics on the SAME sensor-frame stream: stays rotated
    ident = dataclasses.replace(
        PARAMS, ext_rot=(1., 0., 0., 0., 1., 0., 0., 0., 1.),
        ext_rpy=(1., 0., 0., 0., 1., 0., 0., 0., 1.))
    topo2 = LioTopology(ident, max_keyframes=16)
    topo2.handle_imu(ts, accs, gyrs, quats)
    got2 = np.stack(topo2._imu_gyr)
    assert np.abs(got2 - got).max() > 0.1  # ext_rot != I materially matters


def test_invalid_quaternion_is_fatal():
    topo = LioTopology(PARAMS, max_keyframes=16)
    bad_quat = np.zeros((1, 4), np.float32)  # norm 0 < 0.1
    try:
        topo.handle_imu(np.array([0.0]), np.zeros((1, 3)), np.zeros((1, 3)),
                        bad_quat)
    except RuntimeError as e:
        assert "9-axis" in str(e)
    else:
        raise AssertionError("expected the 9-axis check to trip")


def test_scan_buffer_and_odom_deskew_reach_pipeline():
    """Clouds pass the ScanBuffer (emit on the 3rd push), the OdomQueue's
    bracketing guess + translation increment land in the DeskewInfo, and
    positional deskew measurably changes the projected cloud."""
    world = SyntheticWorld()
    topo = LioTopology(PARAMS, max_keyframes=16)

    # near-stationary IMU stream so the deskew gate (imuAvailable, ref
    # deskewPoint :551) is open while the rotational term stays ~zero —
    # any point displacement below must come from the POSITIONAL term
    imu_ts = np.arange(0.0, 0.85, 0.02)
    topo.handle_imu(imu_ts,
                    np.tile([0, 0, PARAMS.imu_gravity], (len(imu_ts), 1)),
                    np.full((len(imu_ts), 3), 1e-4, np.float32))

    # a warm IMU-rate odometry stream moving +x at 1.2 m/s, 50 Hz, one
    # reset id — exactly what flush_imu_odometry would enqueue
    for k in range(40):
        t = 0.02 * k
        topo.odom_queue.push(t, np.array([0, 0, 0, 1.2 * t, 0, 0],
                                         np.float32), reset_id=0)

    captured = []
    orig_step = topo.slam.step

    def spy(scan, timestamp, deskew_info=None):
        captured.append(deskew_info)
        return orig_step(scan, timestamp, deskew_info=deskew_info)

    topo.slam.step = spy

    ests = []
    for k in range(4):
        t = 0.2 * k
        pose = np.array([0, 0, 0, 1.2 * t, 0, 0], np.float32)
        est = topo.handle_cloud(t, _raw(world, pose, seed=40 + k))
        ests.append(est)
    # buffer holds 2 back: first two pushes emit nothing
    assert ests[0] is None and ests[1] is None
    assert ests[2] is not None

    dsk = captured[0]
    assert bool(dsk.odom_available)
    assert bool(dsk.odom_deskew_flag)
    # scan 0 spans [0, 0.2]s at 1.2 m/s -> odom_incre ~ (0.24, 0, 0)
    np.testing.assert_allclose(np.array(dsk.odom_incre),
                               [0.24, 0.0, 0.0], atol=0.02)
    np.testing.assert_allclose(np.array(dsk.initial_guess),
                               np.zeros(6), atol=0.02)

    # positional deskew changes the projected points
    raw0 = _raw(world, np.zeros(6, np.float32), seed=40)
    cloud_on = project_scan(PARAMS, raw0, dsk)
    dsk_off = dsk._replace(odom_deskew_flag=jnp.asarray(False))
    cloud_off = project_scan(PARAMS, raw0, dsk_off)
    m = np.array(cloud_on.point_valid) & np.array(cloud_off.point_valid)
    diff = np.linalg.norm(
        np.array(cloud_on.points)[m] - np.array(cloud_off.points)[m],
        axis=1)
    assert diff.max() > 0.05, "positional deskew had no effect"


def test_lio_topology_end_to_end_tracks():
    """Full loop on raw sensor-frame input: conversion + buffering + odom
    deskew + mapping + preintegration corrections stay consistent."""
    world = SyntheticWorld()
    scan_period = 0.2
    n_scans = 6
    duration = (n_scans + 2) * scan_period + 0.3
    imu, states = constant_twist_platform(
        duration, ext_rot=EXT_ROT, ext_rpy=EXT_ROT,
        gravity=PARAMS.imu_gravity,
        w_body=(0.0, 0.0, 0.1), v_body=(0.8, 0.0, 0.0))
    gt_by_time = {round(t, 4): (R, p) for (t, R, p) in states}

    topo = LioTopology(PARAMS, max_keyframes=32, imu_window=16,
                       imu_max_samples=64)
    imu_idx = 0
    errs = []
    for k in range(n_scans + 2):
        st = scan_period * k
        batch = [s for s in imu[imu_idx:] if s[0] <= st]
        imu_idx += len(batch)
        if batch:
            topo.handle_imu(np.array([b[0] for b in batch]),
                            np.stack([b[1] for b in batch]),
                            np.stack([b[2] for b in batch]),
                            np.stack([b[3] for b in batch]))
        R, p = gt_by_time[round(st, 4)]
        rpy = np.array([np.arctan2(R[2, 1], R[2, 2]),
                        np.arcsin(np.clip(-R[2, 0], -1, 1)),
                        np.arctan2(R[1, 0], R[0, 0])], np.float32)
        est = topo.handle_cloud(
            st, _raw(world, np.concatenate([rpy, p]).astype(np.float32),
                     seed=70 + k))
        if est is None:
            continue
        t_proc = topo.slam.time_last_processing
        _, p_gt = gt_by_time[round(t_proc, 4)]
        errs.append(np.linalg.norm(est[3:] - p_gt.astype(np.float32)))
    assert len(errs) >= n_scans - 1
    assert np.max(errs) < 0.15, errs
