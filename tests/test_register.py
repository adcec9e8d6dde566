import numpy as np
import jax
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.io.synthetic import (
    SyntheticWorld, simulate_scan, build_feature_map)
from feature_base_pointcloud_registration_tpu.ops.projection import project_scan
from feature_base_pointcloud_registration_tpu.ops.features import extract_features
from feature_base_pointcloud_registration_tpu.ops.voxel import voxel_downsample
from feature_base_pointcloud_registration_tpu.ops.register import (
    register_scan, transform_update)
from feature_base_pointcloud_registration_tpu.ops.solver import (
    GNState, gn_step, _rotation_derivatives)
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
    FeatureMap, RawScan, ScanFeatures)
import oracle

PARAMS = Params(map_corner_cap=8192, map_surf_cap=65536, knn_chunk=2048)


def test_jacobian_matches_reference_formulas():
    """Our analytic dR/dangle rows must equal the reference's expanded
    arx/ary/arz terms (ref: src/mapOptmization.h:1311-1332)."""
    rng = np.random.RandomState(0)
    pose = rng.uniform(-0.8, 0.8, 6).astype(np.float32)
    pts = rng.uniform(-10, 10, (20, 3)).astype(np.float32)
    coeff = rng.uniform(-1, 1, (20, 3)).astype(np.float32)

    dRr, dRp, dRy = _rotation_derivatives(
        jnp.float32(pose[0]), jnp.float32(pose[1]), jnp.float32(pose[2]))
    J_rot = np.stack([
        (coeff * (pts @ np.array(dRr).T)).sum(-1),
        (coeff * (pts @ np.array(dRp).T)).sum(-1),
        (coeff * (pts @ np.array(dRy).T)).sum(-1),
    ], -1)

    # reference formulas via the oracle's lm_step internals
    srx, crx = np.sin(pose[1]), np.cos(pose[1])
    sry, cry = np.sin(pose[2]), np.cos(pose[2])
    srz, crz = np.sin(pose[0]), np.cos(pose[0])
    ref = np.zeros((20, 3))
    for i in range(20):
        px, py, pz = pts[i, 1], pts[i, 2], pts[i, 0]
        cx, cy, cz = coeff[i, 1], coeff[i, 2], coeff[i, 0]
        arx = ((crx * sry * srz * px + crx * crz * sry * py - srx * sry * pz) * cx
               + (-srx * srz * px - crz * srx * py - crx * pz) * cy
               + (crx * cry * srz * px + crx * cry * crz * py - cry * srx * pz) * cz)
        ary = (((cry * srx * srz - crz * sry) * px
                + (sry * srz + cry * crz * srx) * py + crx * cry * pz) * cx
               + ((-cry * crz - srx * sry * srz) * px
                  + (cry * srz - crz * srx * sry) * py - crx * sry * pz) * cz)
        arz = (((crz * srx * sry - cry * srz) * px + (-cry * crz - srx * sry * srz) * py) * cx
               + (crx * crz * px - crx * srz * py) * cy
               + ((sry * srz + cry * crz * srx) * px + (crz * sry - cry * srx * srz) * py) * cz)
        ref[i] = [arz, arx, ary]  # (roll, pitch, yaw) order
    np.testing.assert_allclose(J_rot, ref, rtol=1e-4, atol=1e-4)


def _features_and_map(pose_gt, seed=3):
    world = SyntheticWorld()
    s = simulate_scan(world, pose_gt, seed=seed)
    raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"])
    raw = raw._replace(valid=jnp.asarray(s["valid"]))
    cloud = project_scan(PARAMS, raw, None)
    feats = extract_features(PARAMS, cloud)

    # downsampleCurrentScan (ref: mapOptmization.h:981-993)
    cx, cm, _ = voxel_downsample(feats.corner_xyz, feats.corner_mask,
                                 PARAMS.mapping_corner_leaf_size,
                                 PARAMS.corner_cap)
    sx, sm, _ = voxel_downsample(feats.surf_xyz, feats.surf_mask,
                                 PARAMS.mapping_surf_leaf_size,
                                 PARAMS.surf_cap)
    feats_ds = ScanFeatures(cx, cm, sx, sm)

    mcx, mcm, msx, msm = build_feature_map(
        world, PARAMS.map_corner_cap, PARAMS.map_surf_cap)
    fmap = FeatureMap(jnp.asarray(mcx), jnp.asarray(mcm),
                      jnp.asarray(msx), jnp.asarray(msm))
    return feats_ds, fmap


def test_register_recovers_pose():
    pose_gt = np.array([0.0, 0.0, 0.4, 1.5, -2.0, 0.0], np.float32)
    feats, fmap = _features_and_map(pose_gt)
    # perturb the guess
    guess = pose_gt + np.array([0.02, -0.02, 0.05, 0.4, -0.3, 0.15], np.float32)
    res = register_scan(feats, fmap, jnp.asarray(guess), chunk=PARAMS.knn_chunk)
    assert bool(res.valid)
    pose = np.array(res.pose6)
    err_t = np.linalg.norm(pose[3:] - pose_gt[3:])
    err_r = np.linalg.norm(pose[:3] - pose_gt[:3])
    assert err_t < 0.03, (pose, pose_gt)
    assert err_r < 0.01
    assert int(res.n_corr) > 100


def test_register_matches_oracle():
    pose_gt = np.array([0.0, 0.0, -0.3, -1.0, 2.5, 0.0], np.float32)
    feats, fmap = _features_and_map(pose_gt, seed=5)
    guess = pose_gt + np.array([0.01, 0.01, -0.03, 0.2, 0.2, -0.1], np.float32)

    res = register_scan(feats, fmap, jnp.asarray(guess), chunk=PARAMS.knn_chunk)

    corner = np.array(feats.corner_xyz)[np.array(feats.corner_mask)]
    surf = np.array(feats.surf_xyz)[np.array(feats.surf_mask)]
    mc = np.array(fmap.corner_xyz)[np.array(fmap.corner_mask)]
    ms = np.array(fmap.surf_xyz)[np.array(fmap.surf_mask)]
    pose_ref, iters = oracle.register_scan(corner, surf, mc, ms, guess)

    pose = np.array(res.pose6)
    # f32 closed-form eig3/Cramer vs the oracle's f64 LAPACK: per-scan poses
    # agree to ~2 mm / ~1 mrad (trajectory-level RMSE averages well below
    # the 1e-3 m ATE budget)
    assert np.linalg.norm(pose[3:] - pose_ref[3:]) < 3e-3, (pose, pose_ref)
    assert np.linalg.norm(pose[:3] - pose_ref[:3]) < 3e-3


def test_register_gate_on_sparse_scan():
    feats, fmap = _features_and_map(
        np.array([0, 0, 0, 0, 0, 0], np.float32))
    # strip almost all features -> gate must freeze the pose
    empty = ScanFeatures(
        feats.corner_xyz, jnp.zeros_like(feats.corner_mask),
        feats.surf_xyz, jnp.zeros_like(feats.surf_mask))
    guess = jnp.asarray([0.1, 0.0, 0.0, 1.0, 2.0, 3.0], jnp.float32)
    res = register_scan(empty, fmap, guess, chunk=PARAMS.knn_chunk)
    assert not bool(res.valid)
    np.testing.assert_allclose(np.array(res.pose6), np.array(guess))


def test_transform_update_slerp_and_clamp():
    pose = jnp.asarray([0.3, -0.2, 1.0, 1.0, 2.0, 9.0], jnp.float32)
    imu_rpy = jnp.asarray([0.1, 0.05, 0.0], jnp.float32)
    out = transform_update(pose, imu_rpy, jnp.asarray(True),
                           imu_weight=0.05, rotation_tolerance=0.25,
                           z_tolerance=5.0)
    out = np.array(out)
    # slerp(0.05) pulls ~5% toward IMU, then clamp at 0.25
    assert abs(out[0] - min(0.25, 0.3 * 0.95 + 0.1 * 0.05)) < 5e-3
    assert out[5] == 5.0  # z clamped
    # unavailable IMU: angles pass through (still clamped)
    out2 = np.array(transform_update(pose, imu_rpy, jnp.asarray(False),
                                     rotation_tolerance=10.0, z_tolerance=10.0))
    np.testing.assert_allclose(out2[:3], np.array(pose)[:3], atol=1e-6)


def test_register_fast_matches_exact():
    from feature_base_pointcloud_registration_tpu.ops.register import (
        register_scan_fast)
    pose_gt = np.array([0.0, 0.0, 0.25, 2.0, -1.0, 0.0], np.float32)
    feats, fmap = _features_and_map(pose_gt, seed=9)
    guess = pose_gt + np.array([0.015, -0.01, 0.04, 0.3, -0.25, 0.1],
                               np.float32)
    res_exact = register_scan(feats, fmap, jnp.asarray(guess),
                              chunk=PARAMS.knn_chunk)
    res_fast = register_scan_fast(feats, fmap, jnp.asarray(guess),
                                  chunk=PARAMS.knn_chunk, num_candidates=16)
    pe = np.array(res_exact.pose6)
    pf = np.array(res_fast.pose6)
    # 4 mm: fast path computes line/plane fits as rank-masked sums over the
    # K-candidate window (not gathered 5-row means); the f32 association
    # difference wanders a couple mm through 30 chaotic GN gate decisions.
    assert np.linalg.norm(pf[3:] - pe[3:]) < 4e-3, (pe, pf)
    assert np.linalg.norm(pf[:3] - pe[:3]) < 4e-3
    # and both near ground truth
    assert np.linalg.norm(pf[3:] - pose_gt[3:]) < 0.03


def test_register_rounds_grid_matches_exact():
    from feature_base_pointcloud_registration_tpu.ops.register import (
        grid_register_step)
    pose_gt = np.array([0.0, 0.0, 0.25, 2.0, -1.0, 0.0], np.float32)
    feats, fmap = _features_and_map(pose_gt, seed=9)
    guess = pose_gt + np.array([0.015, -0.01, 0.04, 0.3, -0.25, 0.1],
                               np.float32)
    res_exact = register_scan(feats, fmap, jnp.asarray(guess),
                              chunk=PARAMS.knn_chunk)
    res_grid = grid_register_step(fmap, feats, jnp.asarray(guess),
                                  half_extent=(30.0, 30.0, 10.0))
    pe = np.array(res_exact.pose6)
    pg = np.array(res_grid.pose6)
    assert np.linalg.norm(pg[3:] - pe[3:]) < 3e-3, (pe, pg)
    assert np.linalg.norm(pg[:3] - pe[:3]) < 3e-3
    assert np.linalg.norm(pg[3:] - pose_gt[3:]) < 0.03
