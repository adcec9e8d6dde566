import numpy as np
import jax
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.graph.pose_graph import (
    PoseGraphData, optimize_pose_graph)
from feature_base_pointcloud_registration_tpu.geom import se3


def _rel_pose(a, b):
    """true relative pose6 a->b."""
    Ta = se3.pose6_to_matrix(jnp.asarray(a, jnp.float32))
    Tb = se3.pose6_to_matrix(jnp.asarray(b, jnp.float32))
    return np.array(se3.matrix_to_pose6(se3.inverse_matrix(Ta) @ Tb))


def _make_chain(K_active=20, K=32, noise=0.02, seed=0, loop=False):
    rng = np.random.RandomState(seed)
    # ground-truth trajectory: a circle-ish path
    gt = np.zeros((K_active, 6), np.float32)
    for k in range(1, K_active):
        gt[k] = np.array(se3.compose_pose6(
            jnp.asarray(gt[k - 1]),
            jnp.asarray([0.0, 0.0, 0.3, 1.0, 0.0, 0.0], jnp.float32)))

    g = PoseGraphData.empty(K, Fp=4, Fb=64, Fg=8)
    poses_init = gt + rng.normal(0, noise, gt.shape).astype(np.float32) * \
        np.array([1, 1, 1, 5, 5, 5], np.float32)
    poses_init[0] = gt[0]
    poses = np.zeros((K, 6), np.float32)
    poses[:K_active] = poses_init
    pose_mask = np.zeros(K, bool)
    pose_mask[:K_active] = True

    # prior on pose 0 (ref: addOdomFactor first branch)
    prior_mask = np.zeros(4, bool); prior_mask[0] = True
    prior_idx = np.zeros(4, np.int32)
    prior_meas = np.zeros((4, 6), np.float32)
    prior_meas[0] = gt[0]
    prior_sigma = np.ones((4, 6), np.float32) * 1e-2

    # odometry betweens (true relatives — odometry is accurate)
    btw_i = np.zeros(64, np.int32)
    btw_j = np.zeros(64, np.int32)
    btw_meas = np.zeros((64, 6), np.float32)
    btw_mask = np.zeros(64, bool)
    for k in range(1, K_active):
        btw_i[k - 1] = k - 1
        btw_j[k - 1] = k
        btw_meas[k - 1] = _rel_pose(gt[k - 1], gt[k])
        btw_mask[k - 1] = True
    n_btw = K_active - 1
    if loop:
        btw_i[n_btw] = K_active - 1
        btw_j[n_btw] = 0
        btw_meas[n_btw] = _rel_pose(gt[K_active - 1], gt[0])
        btw_mask[n_btw] = True
    btw_sigma = np.tile(np.array([1e-3, 1e-3, 1e-3, 1e-2, 1e-2, 1e-2],
                                 np.float32), (64, 1))

    g = g._replace(
        poses=jnp.asarray(poses), pose_mask=jnp.asarray(pose_mask),
        prior_idx=jnp.asarray(prior_idx), prior_meas=jnp.asarray(prior_meas),
        prior_sigma=jnp.asarray(prior_sigma), prior_mask=jnp.asarray(prior_mask),
        btw_i=jnp.asarray(btw_i), btw_j=jnp.asarray(btw_j),
        btw_meas=jnp.asarray(btw_meas), btw_sigma=jnp.asarray(btw_sigma),
        btw_mask=jnp.asarray(btw_mask),
    )
    return g, gt, K_active


def test_pose_graph_chain_converges():
    g, gt, K_active = _make_chain()
    poses, cost = optimize_pose_graph(g, iterations=15)
    poses = np.array(poses)[:K_active]
    err = np.linalg.norm(poses[:, 3:] - gt[:, 3:], axis=1)
    assert err.max() < 1e-3, err.max()
    assert float(cost) < 1e-4


def test_pose_graph_gps_anchors_drift():
    g, gt, K_active = _make_chain(noise=0.0)
    # corrupt odometry translation scale to create drift, add GPS at ends
    btw_meas = np.array(g.btw_meas)
    btw_meas[:K_active - 1, 3] *= 1.05  # 5% scale drift
    gps_idx = np.zeros(8, np.int32)
    gps_meas = np.zeros((8, 3), np.float32)
    gps_mask = np.zeros(8, bool)
    for n, k in enumerate([3, 6, 9, 12, 15, 19]):
        gps_idx[n] = k
        gps_meas[n] = gt[k, 3:]
        gps_mask[n] = True
    gps_sigma = np.ones((8, 3), np.float32) * 0.01
    g_no_gps = g._replace(btw_meas=jnp.asarray(btw_meas))
    g_gps = g_no_gps._replace(gps_idx=jnp.asarray(gps_idx),
                              gps_meas=jnp.asarray(gps_meas),
                              gps_sigma=jnp.asarray(gps_sigma),
                              gps_mask=jnp.asarray(gps_mask))
    p0, _ = optimize_pose_graph(g_no_gps, iterations=20)
    p1, _ = optimize_pose_graph(g_gps, iterations=20)
    err0 = np.linalg.norm(np.array(p0)[:K_active, 3:] - gt[:, 3:], axis=1)
    err1 = np.linalg.norm(np.array(p1)[:K_active, 3:] - gt[:, 3:], axis=1)
    # without GPS the 5% scale drift accumulates unchecked; GPS bounds it
    assert err0.max() > 0.25, err0.max()
    assert err1.max() < 0.6 * err0.max(), (err0.max(), err1.max())


def test_pose_graph_loop_closure_corrects():
    g, gt, K_active = _make_chain(noise=0.05, loop=True)
    poses, cost = optimize_pose_graph(g, iterations=20)
    poses = np.array(poses)[:K_active]
    err = np.linalg.norm(poses[:, 3:] - gt[:, 3:], axis=1)
    assert err.max() < 1e-2, err.max()
