"""KITTI raw drive through the FULL feature pipeline: loader -> deskew
info -> projection/features -> scan-to-map SLAM (+ optional GPS factors)
-> ATE vs the oxts track.

This is the reference's KITTI workflow (convert with kitti2bag, play the
bag into the LOAM stack, inspect the trajectory —
ref: README.md:99-123, config/doc/kitti2bag/kitti2bag.py) as one direct
pipeline.  With --data it consumes a real KITTI raw drive directory
(HDL-64E geometry); without it, it generates a raw-format drive by
raycasting the synthetic world (scripts/make_kitti_drive.py — this image
has no network egress and no real KITTI data) and runs the identical
loader + pipeline end-to-end, reporting ATE vs the oxts ground truth.

    python examples/run_kitti_slam.py                    # generated drive
    python examples/run_kitti_slam.py --scans 40 --gps --plot run.png
    python examples/run_kitti_slam.py --data /data/2011_09_26_drive_0001_sync
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from feature_base_pointcloud_registration_tpu.utils.cache import (
    enable_persistent_cache)

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None,
                    help="KITTI raw drive dir; generated drive if omitted")
    ap.add_argument("--scans", type=int, default=40)
    ap.add_argument("--gps", action="store_true",
                    help="add GPS factors from the oxts fixes")
    ap.add_argument("--plot", default=None, metavar="PNG",
                    help="export trajectory/map overview")
    ap.add_argument("--sensor", choices=["hdl64", "vlp16"], default=None,
                    help="lidar geometry (default: hdl64 for --data, "
                         "vlp16 for the generated drive)")
    ap.add_argument("--no-deskew", action="store_true",
                    help="skip the oxts IMU deskew-info path")
    ap.add_argument("--pos-deskew", action="store_true",
                    help="also correct intra-scan TRANSLATION from the oxts "
                         "body velocity (the reference stubs findPosition to "
                         "zero — src/imageProjection.cpp:528-542)")
    ap.add_argument("--no-attitude", action="store_true",
                    help="deskew only: do not feed the oxts attitude into "
                         "the initial-guess / attitude-fusion policies")
    ap.add_argument("--spread", type=float, default=0.0, metavar="M",
                    help="surf_min_planar_spread: reject surf plane fits "
                         "whose 5-NN scatter is near-collinear (middle "
                         "singular value < M meters); 0 = reference parity")
    args = ap.parse_args()

    from feature_base_pointcloud_registration_tpu import Params
    from feature_base_pointcloud_registration_tpu.io import kitti
    from feature_base_pointcloud_registration_tpu.pipeline.frontend import (
        make_deskew_info)
    from feature_base_pointcloud_registration_tpu.pipeline.slam import (
        SlamPipeline)

    if args.data:
        data_dir = args.data
        sensor = args.sensor or "hdl64"
    else:
        from scripts.make_kitti_drive import make_drive

        data_dir = os.path.join(tempfile.gettempdir(), "fbpr_kitti_drive",
                                f"n{args.scans}")
        if not os.path.exists(os.path.join(data_dir, "gt_poses.npy")):
            print(f"generating raw-format drive at {data_dir} ...")
            make_drive(data_dir, n_scans=args.scans)
        sensor = args.sensor or "vlp16"

    # mapping_process_interval=0: process every 10 Hz scan.  The reference
    # default (0.15 s) would skip alternate scans, which is a rate
    # regulator, not SLAM quality — the ATE here should measure the map.
    if sensor == "vlp16":
        geom = dict(n_rings=16, elev_min=-15.0, elev_max=15.0)
        params = Params(n_scan=16, map_corner_cap=8192, map_surf_cap=65536,
                        mapping_process_interval=0.0,
                        surf_min_planar_spread=args.spread)
        max_points = 16 * 1800
    else:
        geom = dict(n_rings=64, elev_min=-24.9, elev_max=2.0)
        params = Params(n_scan=64, horizon_scan=1800, corner_cap=7680,
                        surf_cap=32768, sector_cap=304,
                        map_corner_cap=16384, map_surf_cap=131072,
                        mapping_process_interval=0.0,
                        surf_min_planar_spread=args.spread)
        max_points = 1 << 17

    vdir = os.path.join(data_dir, "velodyne_points", "data")
    odir = os.path.join(data_dir, "oxts")
    times = kitti.load_times(os.path.join(data_dir, "velodyne_points"),
                             len(kitti.scan_files(vdir)))
    gt = kitti.load_oxts_poses(odir)
    imu = kitti.load_oxts_imu(odir)
    gps = kitti.load_oxts_gps(odir)

    pipe = SlamPipeline(params, max_keyframes=256)
    est = []
    n_done = 0
    t0 = time.perf_counter()
    for k, raw in enumerate(kitti.iter_scans(vdir, max_points=max_points,
                                             **geom)):
        if k >= args.scans:
            break
        t = float(times[k]) if len(times) else 0.1 * k
        # oxts IMU stream (10 Hz on KITTI raw): attitude + gyro table for
        # deskew and the rotation initial guess, like the bag replay feeds
        # imuHandler (ref: src/imageProjection.cpp:323-393)
        win = (imu["times"] >= t - 0.15) & (imu["times"] <= t + 0.15)
        dsk = None
        if win.any() and not args.no_deskew:
            # attitude from the sample NEAREST the scan start (the first
            # sample in the window can be 0.1 s stale on 10 Hz oxts)
            ni = int(np.argmin(np.abs(imu["times"] - t)))
            q = imu["quat"][ni]
            # quat (x, y, z, w) -> rpy
            x, y, z, w = q
            rpy0 = np.array([
                np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y)),
                np.arcsin(np.clip(2 * (w * y - z * x), -1, 1)),
                np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))],
                np.float32)
            # positional deskew: scan-duration translation increment in the
            # scan-start body frame, straight from the oxts body velocity
            incre = (imu["vel"][ni] * 0.1 if args.pos_deskew else None)
            dsk = make_deskew_info(params, imu["times"][win],
                                   imu["gyr"][win], t, t + 0.1,
                                   imu_rpy=(None if args.no_attitude
                                            else rpy0),
                                   odom_incre=incre,
                                   odom_deskew_flag=args.pos_deskew)
            if args.no_attitude:
                import jax.numpy as _jnp
                dsk = dsk._replace(imu_available=_jnp.asarray(False))
        if args.gps and len(gps["times"]):
            gi = int(np.argmin(np.abs(gps["times"] - t)))
            if abs(gps["times"][gi] - t) < 0.05:
                pipe.add_gps(t, gps["xyz"][gi], gps["cov"][gi])
        pose = pipe.step(raw, timestamp=t, deskew_info=dsk)
        est.append(pose.copy())
        n_done += 1
        if k % 10 == 0:
            print(f"scan {k:4d}: keyframes={pipe.n_keyframes:3d} "
                  f"pose=({pose[3]:+7.2f} {pose[4]:+7.2f} {pose[5]:+6.2f})")
    dt = time.perf_counter() - t0

    est = np.stack(est)
    n = min(len(est), len(gt))
    err = np.linalg.norm(est[:n, 3:6] - gt[:n, 3:6], axis=1)
    ate = float(np.sqrt((err ** 2).mean()))
    print(f"\n{n_done} scans in {dt:.1f}s ({n_done / dt:.1f} scans/s "
          "host-driven)")
    print(f"ATE vs oxts over {n} scans: {ate * 100:.1f} cm "
          f"(max {err.max() * 100:.1f} cm)")

    if args.plot:
        from feature_base_pointcloud_registration_tpu.utils.viz import (
            export_run_plot)
        export_run_plot(pipe, args.plot, gt_xy=gt[:n, 3:5])
        print(f"overview written to {args.plot}")
    return ate


if __name__ == "__main__":
    main()
