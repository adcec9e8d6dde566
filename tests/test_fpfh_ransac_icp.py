import numpy as np
import jax
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.geom import se3
from feature_base_pointcloud_registration_tpu.ops.fpfh import (
    estimate_normals, fpfh, match_descriptors)
from feature_base_pointcloud_registration_tpu.ops.icp import icp_align
from feature_base_pointcloud_registration_tpu.ops.ransac import (
    coarse_align_fpfh, ransac_align)


def _structured_cloud(n=512, seed=0):
    """Two planes + an edge + asymmetric blobs — descriptor-rich, unambiguous."""
    rng = np.random.RandomState(seed)
    n1 = n * 2 // 5
    n2 = n * 2 // 5
    n3 = n - n1 - n2
    a = np.stack([rng.uniform(0, 4, n1), rng.uniform(0, 4, n1),
                  np.zeros(n1)], -1)
    b = np.stack([rng.uniform(0, 4, n2), np.zeros(n2),
                  rng.uniform(0, 3, n2)], -1)
    # small dense clusters at asymmetric spots break plane ambiguity
    centers = np.array([[1.0, 3.0, 0.6], [3.2, 1.2, 0.4], [2.0, 2.5, 1.5]])
    blobs = (centers[rng.randint(0, 3, n3)]
             + rng.normal(0, 0.15, (n3, 3)))
    return np.concatenate([a, b, blobs]).astype(np.float32)


def test_normals_on_plane():
    rng = np.random.RandomState(0)
    pts = np.stack([rng.uniform(-5, 5, 256), rng.uniform(-5, 5, 256),
                    np.zeros(256)], -1).astype(np.float32)
    normals, valid = estimate_normals(jnp.asarray(pts), jnp.ones(256, bool),
                                      k=8, chunk=256,
                                      viewpoint=jnp.asarray([0.0, 0.0, 10.0]))
    n = np.array(normals)[np.array(valid)]
    # all normals ~ +z (oriented to viewpoint above)
    assert (np.abs(n[:, 2]) > 0.99).mean() > 0.95
    assert (n[:, 2] > 0).mean() > 0.95


def test_fpfh_descriptor_invariance():
    """FPFH must be (approximately) rigid-invariant."""
    pts = _structured_cloud()
    mask = jnp.ones(len(pts), bool)
    d0, v0 = fpfh(jnp.asarray(pts), mask, k=12, chunk=256)

    T = np.array(se3.pose6_to_matrix(
        jnp.asarray([0.3, -0.2, 1.1, 5.0, -3.0, 2.0], jnp.float32)))
    pts_t = (pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    d1, v1 = fpfh(jnp.asarray(pts_t), mask, k=12, chunk=256)

    d0, d1 = np.array(d0), np.array(d1)
    both = np.array(v0) & np.array(v1)
    # same point index -> same descriptor (rotation-invariant features)
    cos = (d0[both] * d1[both]).sum(-1)
    assert np.median(cos) > 0.99, np.median(cos)

    # matching: on planes thousands of points share identical descriptors so
    # index-exact matches are rare; what RANSAC needs is that the matched
    # descriptor is (near-)equally good — similarity close to the self-match.
    idx, sim = match_descriptors(jnp.asarray(d1), jnp.asarray(v1),
                                 jnp.asarray(d0), jnp.asarray(v0))
    self_sim = (d1 * d0).sum(-1)
    assert (np.array(sim)[both] >= self_sim[both] - 1e-4).mean() > 0.99


def test_ransac_from_true_correspondences():
    rng = np.random.RandomState(1)
    src = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
    T = np.array(se3.pose6_to_matrix(
        jnp.asarray([0.2, 0.1, -0.7, 2.0, 1.0, -0.5], jnp.float32)))
    dst = (src @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    # corrupt 30% of correspondences
    bad = rng.rand(256) < 0.3
    dst_noisy = dst.copy()
    dst_noisy[bad] += rng.uniform(-5, 5, (bad.sum(), 3))
    res = ransac_align(jax.random.PRNGKey(0), jnp.asarray(src),
                       jnp.asarray(dst_noisy), jnp.ones(256, bool),
                       num_hypotheses=256, inlier_threshold=0.2)
    np.testing.assert_allclose(np.array(res.transform), T, atol=2e-3)
    assert int(res.inliers) > 150


def test_coarse_fpfh_ransac_then_icp():
    """Config-3 shape: descriptor match + RANSAC coarse init, ICP refine."""
    pts = _structured_cloud(seed=2)
    gt6 = jnp.asarray([0.1, -0.05, 0.8, 3.0, -2.0, 1.0], jnp.float32)
    T = np.array(se3.pose6_to_matrix(gt6))
    dst = (pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    mask = jnp.ones(len(pts), bool)

    res = coarse_align_fpfh(jax.random.PRNGKey(3), jnp.asarray(pts), mask,
                            jnp.asarray(dst), mask, k=12, chunk=256,
                            num_hypotheses=512, inlier_threshold=0.4)
    T_coarse = np.array(res.transform)
    # coarse: within ~0.5 m / coarse rotation
    err_t_coarse = np.linalg.norm(T_coarse[:3, 3] - T[:3, 3])
    assert err_t_coarse < 1.5, err_t_coarse

    # refine with ICP from the coarse init: apply coarse, then align
    src_coarse = (pts @ T_coarse[:3, :3].T + T_coarse[:3, 3]).astype(np.float32)
    icp = icp_align(jnp.asarray(src_coarse), mask, jnp.asarray(dst), mask,
                    max_corr_dist=2.0, max_iterations=50, chunk=256)
    T_final = np.array(icp.transform) @ T_coarse
    np.testing.assert_allclose(T_final, T, atol=2e-2)
    assert float(icp.fitness) < 0.01


def test_icp_identity_and_fitness():
    pts = _structured_cloud(seed=4)
    mask = jnp.ones(len(pts), bool)
    res = icp_align(jnp.asarray(pts), mask, jnp.asarray(pts), mask,
                    max_corr_dist=5.0, max_iterations=20, chunk=256)
    np.testing.assert_allclose(np.array(res.transform), np.eye(4), atol=1e-4)
    assert float(res.fitness) < 1e-6
