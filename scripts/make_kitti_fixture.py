"""Generate the tiny real-format KITTI raw fixture under tests/data/kitti_mini.

Layout and binary formats follow the KITTI raw spec that kitti2bag consumes
(ref: config/doc/kitti2bag/kitti2bag.py): velodyne .bin = float32
[x, y, z, reflectance] records; oxts .txt = 30 whitespace floats
(lat lon alt roll pitch yaw vn ve vf vl vu ax ay az af al au wx wy wz
wf wl wu pos_accuracy vel_accuracy navstat numsats posmode velmode orimode);
oxts/timestamps.txt = nanosecond datetime lines.  Contents are synthetic.
"""

import os

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "data", "kitti_mini")


def main():
    rng = np.random.default_rng(7)
    vdir = os.path.join(ROOT, "velodyne_points", "data")
    odir = os.path.join(ROOT, "oxts", "data")
    os.makedirs(vdir, exist_ok=True)
    os.makedirs(odir, exist_ok=True)

    # --- 3 velodyne scans: ring structure like an HDL-64 ---
    for s in range(3):
        pts = []
        for ring in range(0, 64, 8):           # 8 rings, 40 azimuths
            elev = np.deg2rad(-24.9 + ring * (26.9 / 63.0))
            az = np.linspace(-np.pi, np.pi, 40, endpoint=False)
            r = 5.0 + 2.0 * np.cos(3 * az) + 0.1 * s
            x = r * np.cos(elev) * np.cos(az)
            y = r * np.cos(elev) * np.sin(az)
            z = r * np.sin(elev)
            refl = rng.uniform(0, 1, len(az))
            pts.append(np.stack([x, y, z, refl], -1))
        arr = np.concatenate(pts).astype(np.float32)
        arr.tofile(os.path.join(vdir, f"{s:010d}.bin"))

    # --- 3 oxts records: drive ~NE at 5 m/s, gentle yaw, 10 Hz ---
    lat0, lon0, alt0 = 49.011212, 8.423308, 112.83
    earth = 6378137.0
    scale = np.cos(np.deg2rad(lat0))
    lines = []
    for s in range(3):
        t = 0.1 * s
        x, y = 5.0 * t, 1.0 * t
        lat = lat0 + np.rad2deg(y / earth)
        lon = lon0 + np.rad2deg(x / (earth * scale))
        alt = alt0 + 0.02 * s
        roll, pitch, yaw = 0.01, -0.005, 0.2 + 0.01 * s
        vn, ve = 1.0, 5.0
        vf, vl, vu = 5.1, 0.0, 0.0
        ax, ay, az_ = 0.1, -0.05, 9.81
        af, al, au = 0.12, -0.04, 9.80
        wx, wy, wz = 0.001, -0.002, 0.1
        wf, wl, wu = 0.0015, -0.0025, 0.0995
        pos_acc, vel_acc = 0.8, 0.05
        rec = [lat, lon, alt, roll, pitch, yaw, vn, ve, vf, vl, vu,
               ax, ay, az_, af, al, au, wx, wy, wz, wf, wl, wu,
               pos_acc, vel_acc, 4, 11, 5, 5, 6]
        lines.append(" ".join(f"{v:.12g}" for v in rec))
        with open(os.path.join(odir, f"{s:010d}.txt"), "w") as fh:
            fh.write(lines[-1] + "\n")

    with open(os.path.join(ROOT, "oxts", "timestamps.txt"), "w") as fh:
        for s in range(3):
            ns = 594360375 + s * 100_000_000
            fh.write(f"2011-09-26 13:02:25.{ns:09d}\n")

    # velodyne timestamps too (same cadence)
    with open(os.path.join(ROOT, "velodyne_points", "timestamps.txt"),
              "w") as fh:
        for s in range(3):
            ns = 594360375 + s * 100_000_000
            fh.write(f"2011-09-26 13:02:25.{ns:09d}\n")
    print(f"fixture written to {ROOT}")


if __name__ == "__main__":
    main()
