"""Policy-level SLAM backend tests (round-3 VERDICT items 5 and 7):

 * keyframe capacity: marginalize-and-evict keeps storage bounded while the
   run continues past max_keyframes (the reference is unbounded,
   ref: src/mapOptmization.h:1676-1726 — this is our production policy);
 * full-graph factor overflow never severs the odometry chain (only loop
   factors are dropped, oldest first);
 * ICP hasConverged semantics: max-iterations termination still counts as
   converged (PCL behavior, ref usage src/mapOptmization.h:715);
 * surroundingKeyframeDensity keypose thinning (ref :892).
"""

import numpy as np
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.ops.icp import icp_align
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
    ScanFeatures)
from feature_base_pointcloud_registration_tpu.pipeline.slam import SlamPipeline

PARAMS = Params()


def _tiny_feats(rng, pose):
    """A small keyframe cloud (contents are irrelevant for graph policy)."""
    c = rng.normal(size=(8, 3)).astype(np.float32)
    s = rng.normal(size=(16, 3)).astype(np.float32)
    return ScanFeatures(
        corner_xyz=jnp.asarray(c), corner_mask=jnp.ones(8, bool),
        surf_xyz=jnp.asarray(s), surf_mask=jnp.ones(16, bool))


def _drive_keyframes(pipe, n, step=1.5, start=0):
    """Push keyframes start..start+n-1 along +x through _save_keyframe."""
    rng = np.random.default_rng(0)
    for k in range(start, start + n):
        pipe.pose = np.array([0, 0, 0, step * k, 0, 0], np.float32)
        pipe._save_keyframe(_tiny_feats(rng, pipe.pose), 0.5 * k)


def test_keyframe_eviction_bounds_storage():
    pipe = SlamPipeline(PARAMS, max_keyframes=12, opt_window=4,
                        kf_corner_cap=8, kf_surf_cap=16)
    _drive_keyframes(pipe, 30)
    # capacity never exceeded, pipeline kept accepting keyframes
    assert pipe.n_keyframes <= 12
    assert pipe.n_keyframes >= 12 - 12 // 8
    # surviving poses are the most recent ones, estimates still on the line
    n = pipe.n_keyframes
    xs = pipe.kf_poses[:n, 3]
    assert xs[-1] > 40.0  # 29 * 1.5 = 43.5
    np.testing.assert_allclose(np.diff(xs), 1.5, atol=0.05)
    # the root prior moved onto the first surviving pose
    i, meas, sigma = pipe.prior_factor
    assert i == 0
    np.testing.assert_allclose(meas[3], xs[0], atol=0.05)
    assert np.all(sigma > 0)


def test_eviction_reindexes_and_drops_factors():
    pipe = SlamPipeline(PARAMS, max_keyframes=12, opt_window=4,
                        kf_corner_cap=8, kf_surf_cap=16)
    _drive_keyframes(pipe, 11)
    # factor between old poses (will be dropped) and between recent poses
    # (will be reindexed)
    rel = np.zeros(6, np.float32)
    sig = np.full(6, 0.1, np.float32)
    pipe.loop_factors.append((0, 1, rel, sig))
    pipe.loop_factors.append((9, 10, rel, sig))
    pipe.gps_factors.append((1, np.zeros(3, np.float32),
                             np.ones(3, np.float32)))
    pipe.gps_factors.append((10, np.zeros(3, np.float32),
                             np.ones(3, np.float32)))
    # keyframes 12 and 13: the 13th save finds n == max and evicts 12//8 = 1
    _drive_keyframes(pipe, 2, start=11)
    assert pipe.n_keyframes == 12
    assert len(pipe.loop_factors) == 1
    i, j, *_ = pipe.loop_factors[0]
    assert (i, j) == (8, 9)  # was (9, 10); (0, 1) dropped with the eviction
    assert [f[0] for f in pipe.gps_factors] == [0, 9]  # 1 -> 0, 10 -> 9


def test_factor_overflow_keeps_odometry_chain():
    pipe = SlamPipeline(PARAMS, max_keyframes=8, opt_window=4,
                        kf_corner_cap=8, kf_surf_cap=16, loop_factor_cap=2)
    _drive_keyframes(pipe, 8)
    n = pipe.n_keyframes
    rel = np.zeros(6, np.float32)
    sig = np.full(6, 0.1, np.float32)
    # 12 loop factors >> chain(7) + loop_cap(2) + K(8) budget of Fb = 10
    for k in range(12):
        pipe.loop_factors.append((0, n - 1, rel, sig))
    g = pipe._graph_data()
    bi = np.array(g.btw_i)
    bj = np.array(g.btw_j)
    bm = np.array(g.btw_mask)
    # every chain link j-1 -> j must be present
    chain = {(j - 1, j) for j in range(1, n)}
    present = {(int(i), int(j)) for i, j, m in zip(bi, bj, bm) if m}
    assert chain <= present
    # loop factors trimmed to the remaining capacity
    assert int(bm.sum()) == (n - 1) + min(12, (8 + 2) - (n - 1))


def test_icp_converged_at_max_iterations():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, (256, 3)).astype(np.float32)
    dst = (pts + np.array([0.05, -0.02, 0.01], np.float32))
    mask = jnp.ones(256, bool)
    # 2 iterations cannot reach a 1e-12 epsilon -> terminated by budget;
    # PCL still reports hasConverged() = true (any criterion)
    res = icp_align(jnp.asarray(pts), mask, jnp.asarray(dst), mask,
                    max_iterations=2, transformation_epsilon=1e-12, chunk=256)
    assert bool(res.converged)
    assert int(res.iterations) == 2
    assert float(res.delta) > 1e-12
    assert float(res.fitness) < 0.05

    # no correspondences at all -> NOT converged (PCL: correspondence
    # estimation failure is the only false case)
    far = dst + 1000.0
    res2 = icp_align(jnp.asarray(pts), mask, jnp.asarray(far), mask,
                     max_corr_dist=1.0, max_iterations=2, chunk=256)
    assert not bool(res2.converged)


def test_surrounding_density_thins_keyposes():
    pipe = SlamPipeline(PARAMS, max_keyframes=32, opt_window=4,
                        kf_corner_cap=8, kf_surf_cap=16)
    # 4 tight clusters of 4 poses each, 10 m apart
    poses = []
    for c in range(4):
        for k in range(4):
            poses.append([0, 0, 0, 10.0 * c + 0.05 * k, 0.02 * k, 0])
    pipe.kf_poses[:16] = np.array(poses, np.float32)
    pipe.n_keyframes = 16
    keep = pipe._thin_poses(np.arange(16), leaf=2.0)
    assert len(keep) == 4  # one representative per cluster
    # representatives span all clusters
    assert sorted(k // 4 for k in keep) == [0, 1, 2, 3]
    # leaf=0 disables thinning
    keep_all = pipe._thin_poses(np.arange(16), leaf=0.0)
    assert len(keep_all) == 16
