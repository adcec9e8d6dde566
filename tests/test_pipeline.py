import numpy as np
import jax
import jax.numpy as jnp
import pytest

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.io.synthetic import (
    SyntheticWorld, build_feature_map, simulate_scan)
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import RawScan
from feature_base_pointcloud_registration_tpu.pipeline.localization import (
    GlobalMap, LocalizationPipeline)
from feature_base_pointcloud_registration_tpu.pipeline.slam import SlamPipeline

PARAMS = Params(map_corner_cap=8192, map_surf_cap=65536, knn_chunk=2048)


def _trajectory(n=6, step=0.8, yaw_rate=0.15):
    """Ground-truth poses walking through the room while turning."""
    poses = []
    for k in range(n):
        yaw = yaw_rate * k
        poses.append(np.array([0.0, 0.0, yaw, step * k - 2.0,
                               0.5 * step * k - 1.0, 0.0], np.float32))
    return poses


def _raw(world, pose, seed):
    s = simulate_scan(world, pose, seed=seed)
    raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"])
    return raw._replace(valid=jnp.asarray(s["valid"]))


def test_localization_pipeline_tracks_trajectory():
    world = SyntheticWorld()
    mcx, mcm, msx, msm = build_feature_map(world, PARAMS.map_corner_cap,
                                           PARAMS.map_surf_cap)
    gm = GlobalMap(mcx, mcm, msx, msm)
    pipe = LocalizationPipeline(PARAMS, gm)

    gt = _trajectory(5)
    # start at the true first pose (the reference's localization mode gets a
    # map-frame initial guess too)
    pipe.pose = gt[0].copy()
    errs = []
    for k, pose_gt in enumerate(gt):
        est = pipe.step(_raw(world, pose_gt, seed=k), timestamp=0.2 * k)
        errs.append(np.linalg.norm(est[3:] - pose_gt[3:]))
    errs = np.array(errs)
    # each scan must be re-localized despite the chained (stale) guess
    assert errs[1:].max() < 0.06, errs
    ate = np.sqrt((errs ** 2).mean())
    assert ate < 0.05, ate


def test_localization_interval_gate():
    world = SyntheticWorld()
    mcx, mcm, msx, msm = build_feature_map(world, PARAMS.map_corner_cap,
                                           PARAMS.map_surf_cap)
    pipe = LocalizationPipeline(PARAMS, GlobalMap(mcx, mcm, msx, msm))
    raw = _raw(world, np.zeros(6, np.float32), seed=0)
    p0 = pipe.step(raw, timestamp=0.0)
    # within mappingProcessInterval: gate must skip processing (ref :279)
    p1 = pipe.step(raw, timestamp=0.05)
    assert pipe.time_last_processing == 0.0
    np.testing.assert_allclose(p0, p1)


def test_slam_pipeline_odometry():
    world = SyntheticWorld()
    params = PARAMS
    pipe = SlamPipeline(params, max_keyframes=32)
    # 10 Hz-like motion: ~0.25 m / 0.04 rad between processed scans (the
    # reference's no-IMU fallback guess is the previous pose too,
    # ref :839-854 — large inter-scan jumps need the IMU/preintegration
    # guesses that test_imu_odometry covers)
    gt = _trajectory(6, step=0.25, yaw_rate=0.04)
    ests = []
    for k, pose_gt in enumerate(gt):
        est = pipe.step(_raw(world, pose_gt, seed=10 + k),
                        timestamp=0.2 * k)
        ests.append(est.copy())
    assert pipe.n_keyframes >= 2
    # scan-to-accumulated-map odometry: drift stays bounded in this small room
    errs = np.array([np.linalg.norm(e[3:] - g[3:])
                     for e, g in zip(ests, gt)])
    # first pose defines the origin; subsequent scans must track incremental
    # motion: compare relative displacements
    rel_est = np.diff(np.stack(ests)[:, 3:], axis=0)
    rel_gt = np.diff(np.stack(gt)[:, 3:], axis=0)
    rel_err = np.linalg.norm(rel_est - rel_gt, axis=1)
    assert rel_err.max() < 0.12, rel_err


def test_slam_map_save_and_relocalize(tmp_path):
    """The PCD checkpoint cycle: SLAM saves a map, localization reloads it
    (ref save :485-521, reload :245-260)."""
    world = SyntheticWorld()
    pipe = SlamPipeline(PARAMS, max_keyframes=32)
    gt = _trajectory(4)
    for k, pose_gt in enumerate(gt):
        pipe.step(_raw(world, pose_gt, seed=20 + k), timestamp=0.2 * k)
    out = str(tmp_path / "map")
    pipe.save_map(out)

    import os
    for f in ("trajectory.pcd", "transformations.pcd", "cloudCorner.pcd",
              "cloudSurf.pcd", "cloudGlobal.pcd"):
        assert os.path.exists(os.path.join(out, f)), f

    gm = GlobalMap.from_pcd_dir(PARAMS, out, corner_cap=16384,
                                surf_cap=65536)
    assert int(np.array(gm.corner_mask).sum()) > 100
    assert int(np.array(gm.surf_mask).sum()) > 1000
