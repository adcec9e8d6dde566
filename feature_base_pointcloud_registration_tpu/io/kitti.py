"""KITTI dataset loader (HDL-64E velodyne scans).

Replaces the reference's offline kitti2bag converter (ref:
config/doc/kitti2bag/kitti2bag.py — KITTI raw -> rosbag): here scans load
straight from the velodyne .bin files into RawScan pytrees (ring inferred
from elevation, azimuth-proportional per-point time), plus oxts ground-truth
pose parsing for ATE evaluation.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..pipeline.cloud_info import RawScan
from .. import native

HDL64_RINGS = 64
HDL64_ELEV_MIN = -24.9
HDL64_ELEV_MAX = 2.0


def load_scan(path: str, max_points: int = 1 << 17) -> RawScan:
    """One velodyne .bin -> RawScan (padded to max_points)."""
    d = native.kitti_read_bin(path, n_rings=HDL64_RINGS,
                              elev_min=HDL64_ELEV_MIN,
                              elev_max=HDL64_ELEV_MAX)
    n = len(d["xyz"])
    if n > max_points:
        for k in ("xyz", "intensity", "ring", "time", "valid"):
            d[k] = d[k][:max_points]
        n = max_points
    raw = RawScan.from_numpy(d["xyz"], d["intensity"], d["ring"], d["time"],
                             max_points=max_points)
    import jax.numpy as jnp
    valid = np.zeros(max_points, bool)
    valid[:n] = d["valid"][:n] & (d["ring"][:n] >= 0)
    return raw._replace(valid=jnp.asarray(valid))


def scan_files(velodyne_dir: str):
    return sorted(glob.glob(os.path.join(velodyne_dir, "*.bin")))


def load_oxts_poses(oxts_dir: str):
    """oxts txt files -> [N, 6] pose6 (local ENU tangent frame at the first
    fix; lat/lon via equirectangular approximation like kitti2bag's odometry
    path)."""
    files = sorted(glob.glob(os.path.join(oxts_dir, "*.txt")))
    if not files:
        return np.zeros((0, 6), np.float32)
    earth = 6378137.0
    poses = []
    origin = None
    for f in files:
        v = np.loadtxt(f)
        lat, lon, alt, roll, pitch, yaw = v[:6]
        if origin is None:
            origin = (lat, lon, alt)
        scale = np.cos(np.deg2rad(origin[0]))
        x = earth * np.deg2rad(lon - origin[1]) * scale
        y = earth * np.deg2rad(lat - origin[0])
        z = alt - origin[2]
        poses.append([roll, pitch, yaw, x, y, z])
    return np.asarray(poses, np.float32)
