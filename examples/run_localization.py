"""Localization-mode demo: the `run.launch` equivalent (ref: launch/run.launch).

Builds (or loads) a global feature map and localizes a stream of synthetic
VLP-16 scans against it, printing per-scan poses and timing.

    python examples/run_localization.py [--map-dir DIR] [--scans N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

from feature_base_pointcloud_registration_tpu.utils.cache import (
    enable_persistent_cache)

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map-dir", default=None,
                    help="directory with cloudCorner.pcd/cloudSurf.pcd "
                         "(default: synthetic ground-truth map)")
    ap.add_argument("--scans", type=int, default=20)
    args = ap.parse_args()

    import jax.numpy as jnp
    from feature_base_pointcloud_registration_tpu import Params
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        SyntheticWorld, build_feature_map, simulate_scan)
    from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
        RawScan)
    from feature_base_pointcloud_registration_tpu.pipeline.localization import (
        GlobalMap, LocalizationPipeline)
    from feature_base_pointcloud_registration_tpu.utils import StageTimer

    params = Params(map_corner_cap=8192, map_surf_cap=65536)
    world = SyntheticWorld()
    if args.map_dir:
        gm = GlobalMap.from_pcd_dir(params, args.map_dir)
    else:
        cx, cm, sx, sm = build_feature_map(world, params.map_corner_cap,
                                           params.map_surf_cap)
        gm = GlobalMap(cx, cm, sx, sm)

    pipe = LocalizationPipeline(params, gm)
    # localization mode gets a map-frame initial guess, like the reference's
    # prebuilt-map workflow (the guess then chains scan to scan)
    pipe.pose = np.array([0, 0, 0.0, -2.0, -1.0, 0.0], np.float32)
    st = StageTimer()
    for k in range(args.scans):
        gt = np.array([0, 0, 0.05 * k, 0.3 * k - 2.0, 0.15 * k - 1.0, 0.0],
                      np.float32)
        s = simulate_scan(world, gt, seed=k)
        raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                 s["time"])
        raw = raw._replace(valid=jnp.asarray(s["valid"]))
        with st.stage("scan"):
            pose = pipe.step(raw, timestamp=0.2 * k)
            st.block(pose if hasattr(pose, "block_until_ready") else [])
        err = np.linalg.norm(pose[3:] - gt[3:])
        print(f"scan {k:3d}: pose=({pose[3]:+7.3f} {pose[4]:+7.3f} "
              f"{pose[5]:+7.3f})  err={err * 100:6.2f} cm")
    print(st.summary())


if __name__ == "__main__":
    main()
