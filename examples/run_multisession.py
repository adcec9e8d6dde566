"""Multi-session mapping demo (BASELINE.json config 5): run two SLAM
sessions over the same synthetic world, save both maps, merge them with
cross-session ICP loop factors + joint pose-graph optimization, and verify
the merged map by localizing a held-out scan against it.

    python examples/run_multisession.py [--scans N] [--save-dir DIR]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from feature_base_pointcloud_registration_tpu.utils.cache import (
    enable_persistent_cache)

enable_persistent_cache()


def run_session(params, world, gt_fn, scans, seed0):
    import jax.numpy as jnp
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        simulate_scan)
    from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
        RawScan)
    from feature_base_pointcloud_registration_tpu.pipeline.slam import (
        SlamPipeline)

    pipe = SlamPipeline(params, max_keyframes=128)
    for k in range(scans):
        s = simulate_scan(world, gt_fn(k), seed=seed0 + k)
        raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                 s["time"])
        raw = raw._replace(valid=jnp.asarray(s["valid"]))
        pipe.step(raw, timestamp=0.2 * k)
    return pipe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=10)
    ap.add_argument("--save-dir", default=None)
    args = ap.parse_args()

    import jax
    from feature_base_pointcloud_registration_tpu import Params
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        SyntheticWorld)
    from feature_base_pointcloud_registration_tpu.pipeline.multisession \
        import merge_sessions, save_merged_map, session_from_pipeline

    params = Params(map_corner_cap=8192, map_surf_cap=65536)
    world = SyntheticWorld()

    # two passes over the same world on parallel tracks
    pipe_a = run_session(
        params, world,
        lambda k: np.array([0, 0, 0.03 * k, 0.3 * k - 2.0, -1.5, 0.0],
                           np.float32), args.scans, seed0=100)
    pipe_b = run_session(
        params, world,
        lambda k: np.array([0, 0, -0.02 * k, 0.3 * k - 2.0, 1.0, 0.0],
                           np.float32), args.scans, seed0=500)
    print(f"session A: {pipe_a.n_keyframes} keyframes, "
          f"session B: {pipe_b.n_keyframes} keyframes")

    sess_a = session_from_pipeline(pipe_a)
    sess_b = session_from_pipeline(pipe_b)

    key = jax.random.PRNGKey(0)
    res = merge_sessions(key, sess_a, sess_b, params=params,
                         link_radius=8.0, link_stride=1, coarse=False)
    print(f"merged: {len(res.links)} cross-session links, "
          f"align fitness {res.align_fitness:.4f}")
    for ln in res.links:
        print(f"  link A[{ln.idx_a}] <-> B[{ln.idx_b}] "
              f"correction={ln.correction * 100:.1f} cm")

    out = args.save_dir or os.path.join(tempfile.gettempdir(),
                                        "fbpr_merged_map")
    save_merged_map(out, res, sess_a, sess_b)
    print(f"merged map saved to {out}")

    # verify: localize a held-out scan against the merged map
    import jax.numpy as jnp
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        simulate_scan)
    from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
        RawScan)
    from feature_base_pointcloud_registration_tpu.pipeline.localization \
        import GlobalMap, LocalizationPipeline

    gm = GlobalMap.from_pcd_dir(params, out, corner_cap=16384,
                                surf_cap=131072)
    loc = LocalizationPipeline(params, gm)
    gt = np.array([0, 0, 0.1, -0.5, 0.0, 0.0], np.float32)
    s = simulate_scan(world, gt, seed=9999)
    raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"])
    raw = raw._replace(valid=jnp.asarray(s["valid"]))
    # the merged map lives in session A's odometry frame, whose origin is
    # A's first keyframe (the pipeline anchors it at zero) — express the
    # held-out ground truth there
    a_start = np.zeros(6, np.float32)
    a_start[3:] = np.array([0.3 * 0 - 2.0, -1.5, 0.0], np.float32)
    gt_map = gt - a_start
    guess = gt_map + np.array([0, 0, 0.02, 0.2, -0.15, 0.05], np.float32)
    pose = loc.step(raw, timestamp=0.0, initial_guess=guess)
    err = np.linalg.norm(np.asarray(pose)[3:] - gt_map[3:])
    print(f"held-out localization vs merged map: err={err * 100:.2f} cm")


if __name__ == "__main__":
    main()
