"""Config-driven topology runner — the `roslaunch` analog.

The reference starts its nodes via launch files that load params.yaml and
wire topics (run.launch / test.launch, ref: launch/run.launch:1-21,
launch/test.launch:1-22).  Here the same topology is a driver loop wiring
arrays between pipeline objects, selected by --mode:

  lio           test.launch equivalent: IMU preintegration odometry feeds
                initial guesses + deskew info into the SLAM pipeline; the
                SLAM pose feeds back as the odometry correction with the
                reset-id protocol (the imageProjection + imuPreintegration
                process pair)
  slam          mapping only (laserCloudInfoHandler path, no IMU)
  localization  scan-to-map registration against a prebuilt PCD map dir
                (the fork's active path, ref: src/mapOptmization.h:263-343)

    python examples/run.py --mode lio --scans 20
    python examples/run.py --mode slam --params config/params.yaml \
        --save-dir /tmp/map
    python examples/run.py --mode localization --map-dir /tmp/map
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from feature_base_pointcloud_registration_tpu.utils.cache import (
    enable_persistent_cache)

enable_persistent_cache()

G = 9.80511


def _rpy(R):
    return np.array([np.arctan2(R[2, 1], R[2, 2]),
                     np.arcsin(np.clip(-R[2, 0], -1, 1)),
                     np.arctan2(R[1, 0], R[0, 0])], np.float32)


def _platform(duration, imu_hz=100.0):
    """Constant-twist ground-truth platform + synthetic IMU stream."""
    dt = 1.0 / imu_hz
    n = int(duration * imu_hz)
    w_body = np.array([0.0, 0.0, 0.15])
    v_body0 = np.array([1.2, 0.0, 0.0])
    R, p = np.eye(3), np.zeros(3)
    states, imu = [], []
    for i in range(n):
        t = i * dt
        v_world = R @ v_body0
        a_world = R @ np.cross(w_body, v_body0)
        acc_body = R.T @ (a_world - np.array([0, 0, -G]))
        imu.append((t, acc_body, w_body.copy()))
        states.append((t, R.copy(), p.copy()))
        p = p + v_world * dt + 0.5 * a_world * dt * dt
        th = np.linalg.norm(w_body) * dt
        k = w_body / np.linalg.norm(w_body)
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = R @ (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K)
    return imu, states


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("lio", "slam", "localization"),
                    default="lio")
    ap.add_argument("--params", default=None,
                    help="reference-format params.yaml (keys like N_SCAN, "
                         "edgeThreshold...); built-in defaults when omitted")
    ap.add_argument("--scans", type=int, default=10)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--map-dir", default=None,
                    help="prebuilt map directory for --mode localization")
    ap.add_argument("--loop", action="store_true", help="enable loop closure")
    args = ap.parse_args()

    import jax.numpy as jnp
    from feature_base_pointcloud_registration_tpu.config import Params
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        SyntheticWorld, build_feature_map, simulate_scan)
    from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
        RawScan)
    from feature_base_pointcloud_registration_tpu.utils.timing import (
        StageTimer)

    if args.params:
        params = Params.from_yaml(args.params)
        print(f"params loaded from {args.params}")
    else:
        params = Params()
    import dataclasses
    params = dataclasses.replace(params, map_corner_cap=8192,
                                 map_surf_cap=65536,
                                 loop_closure_enable_flag=args.loop
                                 or params.loop_closure_enable_flag)

    world = SyntheticWorld()
    timer = StageTimer()

    if args.mode == "localization":
        from feature_base_pointcloud_registration_tpu.pipeline.localization \
            import GlobalMap, LocalizationPipeline

        if args.map_dir:
            gm = GlobalMap.from_pcd_dir(params, args.map_dir,
                                        corner_cap=16384, surf_cap=131072)
            print(f"map loaded from {args.map_dir}")
        else:
            mcx, mcm, msx, msm = build_feature_map(world, 16384, 131072)
            gm = GlobalMap(mcx, mcm, msx, msm)
            print("map built from the synthetic world")
        pipe = LocalizationPipeline(params, gm)
        for k in range(args.scans):
            gt = np.array([0, 0, 0.04 * k, 0.3 * k - 2.0, 0.15 * k - 1.0, 0],
                          np.float32)
            s = simulate_scan(world, gt, seed=200 + k)
            raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                     s["time"])
            raw = raw._replace(valid=jnp.asarray(s["valid"]))
            guess = gt + np.array([0, 0, .02, .15, -.1, .05], np.float32)
            with timer.stage("scan"):
                pose = pipe.step(raw, timestamp=0.2 * k, initial_guess=guess)
            err = np.linalg.norm(np.asarray(pose)[3:] - gt[3:])
            print(f"scan {k:3d}: err={err * 100:6.2f} cm")
        print(timer.summary())
        return

    from feature_base_pointcloud_registration_tpu.pipeline.slam import (
        SlamPipeline)

    slam = SlamPipeline(params, max_keyframes=256)

    if args.mode == "slam":
        for k in range(args.scans):
            gt = np.array([0, 0, 0.04 * k, 0.25 * k - 2.0, 0.12 * k - 1.0, 0],
                          np.float32)
            s = simulate_scan(world, gt, seed=100 + k)
            raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                     s["time"])
            raw = raw._replace(valid=jnp.asarray(s["valid"]))
            with timer.stage("scan"):
                pose = slam.step(raw, timestamp=0.2 * k)
            print(f"scan {k:3d}: keyframes={slam.n_keyframes:3d} "
                  f"pose=({pose[3]:+7.3f} {pose[4]:+7.3f} {pose[5]:+7.3f})")
    else:  # lio — the test.launch topology
        from feature_base_pointcloud_registration_tpu.pipeline.frontend \
            import make_deskew_info
        from feature_base_pointcloud_registration_tpu.pipeline.imu_odometry \
            import ImuOdometry

        odo = ImuOdometry(params, window=16, max_samples=64)
        scan_period = max(params.mapping_process_interval, 0.2)
        duration = args.scans * scan_period + 0.3
        imu, states = _platform(duration)
        imu_times = np.array([s[0] for s in imu])
        gt_by_time = {round(t, 4): (R, p) for (t, R, p) in states}
        scan_times = np.arange(0.0, duration - 0.25, scan_period)

        imu_idx = 0
        last_guess = None
        for st in scan_times:
            while imu_idx < len(imu) and imu[imu_idx][0] <= st:
                t, acc, gyr = imu[imu_idx]
                odo.handle_imu(t, acc, gyr)
                imu_idx += 1
            out = odo.flush_imu_odometry()
            if out is not None:
                last_guess = out[0][-1]

            R, p = gt_by_time[round(st, 4)]
            s = simulate_scan(world, np.concatenate([_rpy(R), p]),
                              seed=int(st * 10))
            raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                     s["time"])
            raw = raw._replace(valid=jnp.asarray(s["valid"]))
            lo = np.searchsorted(imu_times, st - 0.05)
            hi = np.searchsorted(imu_times, st + scan_period + 0.05)
            dsk = make_deskew_info(
                params, imu_times[lo:hi],
                np.stack([imu[i][2] for i in range(lo, hi)]) if hi > lo
                else np.zeros((0, 3)),
                scan_start=float(st), scan_end=float(st + scan_period),
                imu_rpy=_rpy(R), initial_guess=last_guess,
                reset_id=slam.reset_id)
            with timer.stage("scan"):
                est = slam.step(raw, timestamp=float(st), deskew_info=dsk)
            odo.handle_odometry(float(st), est, reset_id=slam.reset_id)
            err = np.linalg.norm(est[3:] - p.astype(np.float32))
            print(f"t={st:5.1f}s keyframes={slam.n_keyframes:3d} "
                  f"err={err * 100:6.2f} cm")

    print(timer.summary())
    if args.save_dir:
        slam.save_map(args.save_dir)
        print(f"map saved to {args.save_dir}")


if __name__ == "__main__":
    main()
