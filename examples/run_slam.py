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
    ap.add_argument("--checkpoint-dir", default=None,
                    help="run under the respawn supervisor: checkpoint "
                         "the full pipeline state here and auto-resume "
                         "from it after a crash (or on restart) — the "
                         "roslaunch respawn=true analog")
    ap.add_argument("--checkpoint-every", type=int, default=4,
                    help="scans between checkpoints")
    ap.add_argument("--crash-at", type=int, default=None,
                    help="inject one crash at scan K (supervisor demo)")
    ap.add_argument("--plot", default=None, metavar="PNG",
                    help="export the trajectory/map overview (rviz analog)")
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

    def make_scan(k):
        gt = np.array([0, 0, 0.04 * k, 0.25 * k - 2.0, 0.12 * k - 1.0, 0.0],
                      np.float32)
        s = simulate_scan(world, gt, seed=100 + k)
        raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                 s["time"])
        return raw._replace(valid=jnp.asarray(s["valid"]))

    crashed = {"armed": args.crash_at is not None}

    def step(pipe, k):
        if crashed["armed"] and k == args.crash_at:
            crashed["armed"] = False
            raise RuntimeError(f"injected crash at scan {k}")
        pose = pipe.step(make_scan(k), timestamp=0.2 * k)
        print(f"scan {k:3d}: keyframes={pipe.n_keyframes:3d} "
              f"pose=({pose[3]:+7.3f} {pose[4]:+7.3f} {pose[5]:+7.3f})")

    def build():
        return SlamPipeline(params, max_keyframes=256)

    if args.checkpoint_dir:
        from feature_base_pointcloud_registration_tpu.utils.supervise import (
            run_supervised)

        pipe, n_respawns = run_supervised(
            build, list(range(args.scans)), step, args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every)
        if n_respawns:
            print(f"supervisor: recovered from {n_respawns} crash(es) "
                  f"via {args.checkpoint_dir}")
    else:
        pipe = build()
        for k in range(args.scans):
            step(pipe, k)

    if args.save_dir:
        pipe.save_map(args.save_dir)
        print(f"map saved to {args.save_dir}")

    if args.plot:
        from feature_base_pointcloud_registration_tpu.utils.viz import (
            export_run_plot)
        export_run_plot(pipe, args.plot)
        print(f"run overview written to {args.plot}")


if __name__ == "__main__":
    main()
