"""Incremental (windowed) pose graph, marginal covariances, GPS covariance
gate, and loop-closure drift correction.

Covers the iSAM2-replacement semantics the reference gets from GTSAM:
  * marginalCovariance reads (ref: src/mapOptmization.h:1706)
  * poseCovThreshold GPS gate (ref :1596-1599)
  * windowed updates with carried-marginal priors (the reference's own
    key==100 reset trick, ref: src/imuPreintegration.cpp:234-267)
  * performLoopClosure correcting accumulated drift + reset-id bump
    (ref: src/mapOptmization.h:676-782, :1768)
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.graph.pose_graph import (
    PoseGraphData, pose_marginal_covariance)
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
    ScanFeatures)
from feature_base_pointcloud_registration_tpu.pipeline.slam import SlamPipeline


def _tiny_feats(rng, n_corner=8, n_surf=32):
    return ScanFeatures(
        corner_xyz=jnp.asarray(rng.uniform(-5, 5, (n_corner, 3)), jnp.float32),
        corner_mask=jnp.ones(n_corner, bool),
        surf_xyz=jnp.asarray(rng.uniform(-5, 5, (n_surf, 3)), jnp.float32),
        surf_mask=jnp.ones(n_surf, bool),
    )


def _insert_keyframe(pipe, pose, t, feats):
    """Drive the keyframe/factor path directly (registration bypassed)."""
    pipe.pose = np.asarray(pose, np.float32).copy()
    pipe._save_keyframe(feats, t)


def test_pose_marginal_covariance_prior_only():
    """A pose held by a single prior has marginal covariance = sigma^2."""
    sigma = np.array([0.1, 0.1, 0.2, 0.5, 0.5, 1.0], np.float32)
    g = PoseGraphData.empty(4, Fp=1, Fb=1, Fg=1)
    g = g._replace(
        pose_mask=jnp.asarray([True, False, False, False]),
        prior_idx=jnp.asarray([0], jnp.int32),
        prior_meas=jnp.zeros((1, 6), jnp.float32),
        prior_sigma=jnp.asarray(sigma[None]),
        prior_mask=jnp.asarray([True]))
    cov = pose_marginal_covariance(g, np.zeros((4, 6), np.float32), 0)
    np.testing.assert_allclose(np.diag(cov), sigma.astype(np.float64) ** 2,
                               rtol=1e-4)


def test_pose_marginal_covariance_gps_shrinks_xy():
    """Adding a tight GPS factor must shrink the x/y marginal variance."""
    sigma = np.full(6, 1.0, np.float32)
    base = PoseGraphData.empty(2, Fp=1, Fb=1, Fg=1)
    base = base._replace(
        pose_mask=jnp.asarray([True, False]),
        prior_idx=jnp.asarray([0], jnp.int32),
        prior_meas=jnp.zeros((1, 6), jnp.float32),
        prior_sigma=jnp.asarray(sigma[None]),
        prior_mask=jnp.asarray([True]))
    cov0 = pose_marginal_covariance(base, np.zeros((2, 6), np.float32), 0)
    with_gps = base._replace(
        gps_idx=jnp.asarray([0], jnp.int32),
        gps_meas=jnp.zeros((1, 3), jnp.float32),
        gps_sigma=jnp.full((1, 3), 0.1, jnp.float32),
        gps_mask=jnp.asarray([True]))
    cov1 = pose_marginal_covariance(with_gps, np.zeros((2, 6), np.float32), 0)
    assert cov1[3, 3] < 0.05 * cov0[3, 3]
    assert cov1[4, 4] < 0.05 * cov0[4, 4]


def _run_chain(opt_window, n_kf=40, seed=3):
    """Insert a noisy odometry chain + periodic GPS through the keyframe
    path; returns the optimized trajectory."""
    rng = np.random.RandomState(seed)
    params = Params(pose_cov_threshold=0.0)  # GPS gate always open
    pipe = SlamPipeline(params, max_keyframes=64, opt_window=opt_window)
    feats = _tiny_feats(rng)
    for k in range(n_kf):
        gt = np.array([0, 0, 0.02 * k, 0.8 * k, 0.1 * k, 0.0], np.float32)
        noisy = gt + rng.normal(0, 0.02, 6).astype(np.float32) * np.array(
            [0.1, 0.1, 0.5, 1, 1, 0.3], np.float32)
        if k % 5 == 0:
            pipe.add_gps(float(k), gt[3:], np.full(3, 0.04))
        _insert_keyframe(pipe, noisy, float(k), feats)
    return pipe.kf_poses[: pipe.n_keyframes].copy(), pipe


def test_windowed_matches_full_batch():
    """A small trailing window must reproduce the full-batch trajectory.

    opt_window=64 on a 40-keyframe run never slides (lo stays 0: the exact
    full solve); opt_window=8 marginalizes almost everything.  The carried
    prior is an approximation, so tolerance — not bit parity."""
    traj_full, _ = _run_chain(opt_window=64)
    traj_win, _ = _run_chain(opt_window=8)
    err = np.linalg.norm(traj_full[:, 3:] - traj_win[:, 3:], axis=1)
    assert err.max() < 0.05, err.max()


def test_window_shapes_stay_fixed():
    """Steady-state keyframes must reuse ONE compiled window executable —
    PoseGraphData shapes must not depend on the keyframe count."""
    _, pipe = _run_chain(opt_window=8, n_kf=20)
    g1, _ = pipe._window_graph_data()
    _insert_keyframe(pipe, pipe.kf_poses[pipe.n_keyframes - 1] + 0.5,
                     99.0, _tiny_feats(np.random.RandomState(0)))
    g2, _ = pipe._window_graph_data()
    for a, b in zip(g1, g2):
        assert a.shape == b.shape


def test_gps_pose_cov_gate():
    """poseCovThreshold (ref :1596-1599): GPS factors are only injected when
    the latest pose's x/y marginal variance exceeds the threshold."""
    rng = np.random.RandomState(0)
    params = Params(pose_cov_threshold=25.0)
    pipe = SlamPipeline(params, max_keyframes=16)
    feats = _tiny_feats(rng)
    # two keyframes > 5 m apart so the trajectory-length gate passes
    _insert_keyframe(pipe, np.zeros(6), 0.0, feats)
    _insert_keyframe(pipe, np.array([0, 0, 0, 6.0, 0, 0], np.float32),
                     1.0, feats)

    # confident pose (tiny covariance): GPS must be rejected
    pipe.pose_cov = np.eye(6) * 1e-4
    pipe.add_gps(2.0, np.array([6.0, 0.0, 0.0]), np.full(3, 0.04))
    pipe._add_gps_factor(2.0)
    assert len(pipe.gps_factors) == 0

    # drifted-uncertain pose: GPS must be accepted
    pipe.pose_cov = np.eye(6) * 100.0
    pipe._add_gps_factor(2.0)
    assert len(pipe.gps_factors) == 1


def test_loop_closure_corrects_drift():
    """Revisit trajectory: the last keyframe carries injected drift; the ICP
    loop factor must pull it back and bump reset_id (ref :676-782, :1768)."""
    rng = np.random.RandomState(7)
    # fine submap leaf: with the default 0.4 m leaf the ICP fitness is
    # dominated by voxel-centroid displacement (~0.01), which per the
    # reference's fitness-variance noise model (ref :750-752) gives the loop
    # factor ~1/12 the stiffness of the 10-link odometry chain — the
    # correction would be real but tiny.  A 2 cm leaf keeps the geometry and
    # makes the single-closure correction visible.
    params = Params(loop_closure_enable_flag=True,
                    history_keyframe_search_time_diff=3.0,
                    history_keyframe_search_num=3,
                    mapping_surf_leaf_size=0.02)
    pipe = SlamPipeline(params, max_keyframes=32, opt_window=32)

    # structured world: two walls + scattered edge posts (enough ICP texture)
    n_w = 600
    wall1 = np.stack([rng.uniform(-8, 8, n_w), np.full(n_w, 6.0),
                      rng.uniform(0, 3, n_w)], -1)
    wall2 = np.stack([np.full(n_w, -7.0), rng.uniform(-8, 8, n_w),
                      rng.uniform(0, 3, n_w)], -1)
    posts = rng.uniform(-6, 6, (120, 3)) * np.array([1, 1, 0.25])
    world = np.concatenate([wall1, wall2, posts]).astype(np.float32)

    def feats_at(gt_pose):
        """World geometry observed from gt_pose, expressed in lidar frame."""
        from feature_base_pointcloud_registration_tpu.geom.se3 import (
            inverse_matrix, pose6_to_matrix)
        T_inv = np.array(inverse_matrix(pose6_to_matrix(
            jnp.asarray(gt_pose.astype(np.float32)))))
        local = world @ T_inv[:3, :3].T + T_inv[:3, 3]
        near = np.linalg.norm(local, axis=1) < 12.0
        pts = local[near]
        n_c = min(len(pts) // 4, 256)
        return ScanFeatures(
            corner_xyz=jnp.asarray(pts[:n_c]),
            corner_mask=jnp.ones(n_c, bool),
            surf_xyz=jnp.asarray(pts[n_c:]),
            surf_mask=jnp.ones(len(pts) - n_c, bool))

    # out-and-back line; keyframes every 1.2 m, 1 s apart
    gts = []
    for k in range(6):
        gts.append(np.array([0, 0, 0, 1.2 * k, 0, 0], np.float32))
    for k in range(5):
        gts.append(np.array([0, 0, 0, 1.2 * (4 - k), 0.4, 0], np.float32))

    drift = np.array([0, 0, 0, 0.4, -0.3, 0.0], np.float32)
    for k, gt in enumerate(gts):
        est = gt + (drift if k == len(gts) - 1 else 0.0)
        _insert_keyframe(pipe, est, float(k), feats_at(gt))

    cur = pipe.n_keyframes - 1

    def rel_err():
        """Gauge-invariant drift metric: the trajectory's endpoint-to-start
        offset vs ground truth.  (The first-pose prior is wide in xyz like
        the reference's, ref :1523-1526, so the graph optimum is defined up
        to a global translation — absolute error is not meaningful.)"""
        rel = pipe.kf_poses[cur, 3:] - pipe.kf_poses[0, 3:]
        rel_gt = gts[-1][3:] - gts[0][3:]
        return np.linalg.norm(rel - rel_gt)

    err_before = rel_err()
    rid_before = pipe.reset_id
    closed = pipe.maybe_close_loop(scan_time=float(len(gts) - 1))
    assert closed, "loop closure must fire on the revisit"
    err_after = rel_err()
    assert err_after < 0.2 * err_before, (err_before, err_after)
    assert err_after < 0.1, err_after
    assert pipe.reset_id == rid_before + 1


def test_full_graph_shapes_stay_fixed():
    """The full-graph solve must reuse ONE compiled executable: factor
    array shapes must not depend on how many loop/GPS factors exist
    (jax-0.9 re-compile hazard on TPU, docs/ROUND_NOTES.md)."""
    _, pipe = _run_chain(opt_window=8, n_kf=12)
    g1 = pipe._graph_data()
    # add more GPS + a loop factor; shapes must not change
    pipe.add_gps(99.0, pipe.kf_poses[0, 3:], np.full(3, 0.04))
    pipe._add_gps_factor(99.0)
    pipe.loop_factors.append(
        (pipe.n_keyframes - 1, 0, np.zeros(6, np.float32),
         np.full(6, 0.1, np.float32)))
    g2 = pipe._graph_data()
    for a, b in zip(g1, g2):
        assert a.shape == b.shape, (a.shape, b.shape)
