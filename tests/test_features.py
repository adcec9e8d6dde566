import numpy as np
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.io.synthetic import (
    SyntheticWorld, simulate_scan)
from feature_base_pointcloud_registration_tpu.ops.projection import project_scan
from feature_base_pointcloud_registration_tpu.ops.features import extract_features
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import RawScan
import oracle

PARAMS = Params()


def _cloud(seed=3, pose=(0.02, -0.01, 0.3, 1.0, 2.0, 0.0)):
    world = SyntheticWorld()
    s = simulate_scan(world, list(pose), seed=seed)
    raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"])
    raw = raw._replace(valid=jnp.asarray(s["valid"]))
    cloud = project_scan(PARAMS, raw, None)
    ref_cloud = oracle.project_scan(s["xyz"], s["ring"], s["time"], s["valid"])
    return cloud, ref_cloud


def test_features_match_oracle():
    cloud, ref_cloud = _cloud()
    feats = extract_features(PARAMS, cloud)
    ref = oracle.extract_features(ref_cloud, PARAMS.edge_threshold,
                                  PARAMS.surf_threshold)

    # --- corners: compare the picked 3D points as sets ---
    ref_corner_pts = np.concatenate([
        ref_cloud["points"][idx] for idx in ref["corner_idx"] if idx
    ]) if any(ref["corner_idx"]) else np.zeros((0, 3))
    ours = np.array(feats.corner_xyz)[np.array(feats.corner_mask)]

    def as_set(a):
        return set(map(tuple, np.round(a, 4)))

    A, B = as_set(ours), as_set(ref_corner_pts)
    # ring-boundary single-point spills may differ; demand near-complete match
    inter = len(A & B)
    assert inter >= 0.99 * max(len(A), len(B)), (len(A), len(B), inter)

    # --- surfaces: reference surf candidates (pre-voxel) vs our voxel input
    # can't be compared directly post-downsample; instead verify our surf
    # points are all near the reference candidate set (and counts similar).
    ref_surf_pts = np.concatenate([
        ref_cloud["points"][idx] for idx in ref["surf_idx"] if idx
    ])
    ours_s = np.array(feats.surf_xyz)[np.array(feats.surf_mask)]
    # every downsampled surf point must be the centroid of real candidates:
    # check nearest ref candidate within half a leaf diagonal
    from scipy.spatial import cKDTree
    tree = cKDTree(ref_surf_pts)
    d, _ = tree.query(ours_s)
    assert np.percentile(d, 99) < PARAMS.odometry_surf_leaf_size, d.max()


def test_feature_counts_sane():
    cloud, _ = _cloud(seed=7, pose=(0.0, 0.0, -0.8, -3.0, 4.0, 0.0))
    feats = extract_features(PARAMS, cloud)
    n_corner = int(np.array(feats.corner_mask).sum())
    n_surf = int(np.array(feats.surf_mask).sum())
    # a cluttered room must give plenty of both (gates in mapOptmization.h:1410)
    assert n_corner > PARAMS.edge_feature_min_valid_num
    assert n_surf > PARAMS.surf_feature_min_valid_num
    assert n_corner <= PARAMS.corner_cap
    assert n_surf <= PARAMS.surf_cap


def test_fast_picking_matches_strict():
    """strict=False truncates the corner stream and drops the surf pass; on
    realistic scans the feature sets are (near-)identical."""
    cloud, _ = _cloud()
    fe = extract_features(PARAMS, cloud, strict=True)
    ff = extract_features(PARAMS, cloud, strict=False)

    def as_set(x, m):
        return set(map(tuple, np.round(np.array(x)[np.array(m)], 4)))

    A = as_set(fe.corner_xyz, fe.corner_mask)
    B = as_set(ff.corner_xyz, ff.corner_mask)
    assert len(A & B) >= 0.98 * max(len(A), len(B)), (len(A), len(B))
    SA = as_set(fe.surf_xyz, fe.surf_mask)
    SB = as_set(ff.surf_xyz, ff.surf_mask)
    assert len(SA & SB) >= 0.99 * max(len(SA), len(SB))
