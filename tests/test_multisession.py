"""Multi-session map merging (BASELINE.json config 5).

Two synthetic sessions over the same world, session B's frame offset and
its trajectory drifted; merging must recover the inter-session transform,
find ICP-verified cross links, and jointly pull both trajectories onto the
shared geometry.
"""

import numpy as np
import jax
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.geom.se3 import (
    pose6_to_matrix)
from feature_base_pointcloud_registration_tpu.pipeline.multisession import (
    Session, align_sessions, load_session, merge_sessions, save_merged_map)


def _make_world(seed=0):
    """Structured world: two walls + scattered posts (ICP/FPFH texture)."""
    rng = np.random.RandomState(seed)
    n_w = 500
    wall1 = np.stack([rng.uniform(-10, 10, n_w), np.full(n_w, 7.0),
                      rng.uniform(0, 3, n_w)], -1)
    wall2 = np.stack([np.full(n_w, -8.0), rng.uniform(-10, 10, n_w),
                      rng.uniform(0, 3, n_w)], -1)
    posts = []
    for _ in range(25):
        c = np.array([rng.uniform(-8, 8), rng.uniform(-8, 5), 0.0])
        z = rng.uniform(0, 2.5, 30)
        posts.append(c + np.stack([rng.normal(0, 0.04, 30),
                                   rng.normal(0, 0.04, 30), z], -1))
    return np.concatenate([wall1, wall2] + posts).astype(np.float32)


def _session(world, gts, *, frame_offset=None, seed=0,
             n_corner=64, cap=1024):
    """Observe `world` from each gt pose; keyframe clouds in lidar frame.
    frame_offset (pose6) shifts the session's stored world frame — the
    un-merged inter-session inconsistency."""
    rng = np.random.RandomState(seed)
    n = len(gts)
    corner = np.zeros((n, n_corner, 3), np.float32)
    corner_m = np.zeros((n, n_corner), bool)
    surf = np.zeros((n, cap, 3), np.float32)
    surf_m = np.zeros((n, cap), bool)
    poses = np.zeros((n, 6), np.float32)
    off_T = (np.array(pose6_to_matrix(jnp.asarray(
        np.asarray(frame_offset, np.float32))))
        if frame_offset is not None else np.eye(4, dtype=np.float32))
    for k, gt in enumerate(gts):
        T = np.array(pose6_to_matrix(jnp.asarray(gt.astype(np.float32))))
        Ti = np.linalg.inv(T)
        local = world @ Ti[:3, :3].T + Ti[:3, 3]
        near = local[np.linalg.norm(local, axis=1) < 14.0]
        near = near + rng.normal(0, 0.005, near.shape)
        rng.shuffle(near)
        nc = min(n_corner, len(near) // 4)
        corner[k, :nc] = near[:nc]
        corner_m[k, :nc] = True
        ns = min(cap, len(near) - nc)
        surf[k, :ns] = near[nc:nc + ns]
        surf_m[k, :ns] = True
        # stored pose = session-frame pose (frame offset applied)
        from feature_base_pointcloud_registration_tpu.geom.se3 import (
            matrix_to_pose6)
        poses[k] = np.array(matrix_to_pose6(jnp.asarray(
            (off_T @ T).astype(np.float32))))
    return Session(poses=poses, times=np.arange(n, dtype=np.float64),
                   corner=corner, corner_mask=corner_m,
                   surf=surf, surf_mask=surf_m)


def _two_sessions():
    world = _make_world()
    gts_a = [np.array([0, 0, 0, -4.0 + 1.5 * k, -2.0, 0.0], np.float32)
             for k in range(7)]
    gts_b = [np.array([0, 0, 0, -4.0 + 1.5 * k, 0.5, 0.0], np.float32)
             for k in range(7)]
    # session B's frame is offset by a yaw + translation
    off = np.array([0, 0, 0.15, 1.2, -0.8, 0.1], np.float32)
    sa = _session(world, gts_a, seed=1)
    sb = _session(world, gts_b, frame_offset=off, seed=2)
    return sa, sb, off, (gts_a, gts_b)


def test_align_sessions_recovers_offset():
    sa, sb, off, _ = _two_sessions()
    key = jax.random.PRNGKey(0)
    # frames differ by `off`: T_ab must be ~inv(off_T)
    r = align_sessions(key, sa, sb, coarse=False)
    off_T = np.array(pose6_to_matrix(jnp.asarray(off)))
    err = r.transform @ off_T - np.eye(4)
    assert np.abs(err[:3, 3]).max() < 0.05, err
    assert np.abs(err[:3, :3]).max() < 0.02, err


def test_merge_sessions_joint_consistency():
    sa, sb, off, (gts_a, gts_b) = _two_sessions()
    key = jax.random.PRNGKey(1)
    res = merge_sessions(key, sa, sb, coarse=False, link_radius=6.0,
                         link_stride=2)
    assert len(res.links) >= 2, "cross-session ICP links must form"
    # B's optimized trajectory must land on its ground truth in A's frame
    gt_b = np.stack(gts_b)
    err = np.linalg.norm(res.poses_b[:, 3:] - gt_b[:, 3:], axis=1)
    assert err.max() < 0.15, err
    # A must stay near its own (already-correct) trajectory
    gt_a = np.stack(gts_a)
    err_a = np.linalg.norm(res.poses_a[:, 3:] - gt_a[:, 3:], axis=1)
    assert err_a.max() < 0.1, err_a


def test_merged_map_roundtrip(tmp_path):
    """save_merged_map writes the reference PCD layout; the localization
    GlobalMap must load it."""
    sa, sb, _, _ = _two_sessions()
    key = jax.random.PRNGKey(2)
    res = merge_sessions(key, sa, sb, coarse=False, link_radius=6.0,
                         link_stride=2)
    out = str(tmp_path / "merged")
    save_merged_map(out, res, sa, sb)
    from feature_base_pointcloud_registration_tpu.config import Params
    from feature_base_pointcloud_registration_tpu.pipeline.localization \
        import GlobalMap
    gm = GlobalMap.from_pcd_dir(
        Params(), out, corner_cap=16384, surf_cap=65536)
    assert int(np.asarray(gm.corner_mask).sum()) > 100
    assert int(np.asarray(gm.surf_mask).sum()) > 1000


def test_session_npz_roundtrip(tmp_path):
    """SlamPipeline.save_map -> load_session preserves keyframe data."""
    import os

    sa, _, _, _ = _two_sessions()
    # fake a minimal pipeline save via direct npz write (the pipeline path
    # is covered by test_pipeline's save_map test)
    d = str(tmp_path / "sess")
    os.makedirs(d)
    np.savez_compressed(os.path.join(d, "keyframes.npz"),
                        poses=sa.poses, times=sa.times,
                        corner=sa.corner, corner_mask=sa.corner_mask,
                        surf=sa.surf, surf_mask=sa.surf_mask)
    s2 = load_session(d)
    np.testing.assert_array_equal(s2.poses, sa.poses)
    np.testing.assert_array_equal(s2.surf_mask, sa.surf_mask)


def test_merge_many_three_sessions():
    """N-session fold: a third pass merges against the accumulated map."""
    world = _make_world()
    offs = [None,
            np.array([0, 0, 0.15, 1.2, -0.8, 0.1], np.float32),
            np.array([0, 0, -0.1, -0.9, 0.7, 0.0], np.float32)]
    ys = [-2.0, 0.5, -0.5]
    sessions = []
    for i, (off, y) in enumerate(zip(offs, ys)):
        gts = [np.array([0, 0, 0, -4.0 + 1.5 * k, y, 0.0], np.float32)
               for k in range(7)]
        sessions.append(_session(world, gts, frame_offset=off, seed=i + 1))

    import jax
    from feature_base_pointcloud_registration_tpu.pipeline.multisession \
        import merge_many

    merged = merge_many(jax.random.PRNGKey(3), sessions, coarse=False,
                        link_radius=6.0, link_stride=2)
    assert merged.n == 21
    # every keyframe's optimized pose must land near its ground truth in
    # session 1's frame (== world frame here)
    gt_all = np.concatenate(
        [[np.array([0, 0, 0, -4.0 + 1.5 * k, y, 0.0], np.float32)
          for k in range(7)] for y in ys])
    err = np.linalg.norm(merged.poses[:, 3:] - gt_all[:, 3:], axis=1)
    assert err.max() < 0.15, err.max()
