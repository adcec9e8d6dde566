"""SLAM-mode demo: the `test.launch` equivalent — odometry + mapping with
keyframes and factor-graph optimization, saving the PCD map at the end
(which run_localization.py can then reload).

    python examples/run_slam.py [--scans N] [--save-dir DIR] [--loop]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from feature_base_pointcloud_registration_tpu.utils.cache import (
    enable_persistent_cache)

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=20)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--loop", action="store_true",
                    help="enable loop closure")
    args = ap.parse_args()

    import dataclasses
    import jax.numpy as jnp
    from feature_base_pointcloud_registration_tpu import Params
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        SyntheticWorld, simulate_scan)
    from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
        RawScan)
    from feature_base_pointcloud_registration_tpu.pipeline.slam import (
        SlamPipeline)

    params = Params(map_corner_cap=8192, map_surf_cap=65536,
                    loop_closure_enable_flag=args.loop)
    world = SyntheticWorld()
    pipe = SlamPipeline(params, max_keyframes=256)

    for k in range(args.scans):
        gt = np.array([0, 0, 0.04 * k, 0.25 * k - 2.0, 0.12 * k - 1.0, 0.0],
                      np.float32)
        s = simulate_scan(world, gt, seed=100 + k)
        raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                 s["time"])
        raw = raw._replace(valid=jnp.asarray(s["valid"]))
        pose = pipe.step(raw, timestamp=0.2 * k)
        rel = np.linalg.norm(pose[3:] - (gt[3:] - np.array([-2., -1., 0.])))
        print(f"scan {k:3d}: keyframes={pipe.n_keyframes:3d} "
              f"pose=({pose[3]:+7.3f} {pose[4]:+7.3f} {pose[5]:+7.3f})")

    if args.save_dir:
        pipe.save_map(args.save_dir)
        print(f"map saved to {args.save_dir}")


if __name__ == "__main__":
    main()
