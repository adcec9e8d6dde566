"""Range-image projection, motion deskew, and row-major compaction.

TPU-native replacement for ImageProjection's hot loop
(ref: src/imageProjection.cpp:583-670 projectPointCloud/cloudExtraction and
:494-580 findRotation/deskewPoint).  The reference iterates points serially
and writes first-come-first-served into a 16x1800 cv::Mat; here the whole
scan is processed as one fused vector program:

  * cell assignment is a closed-form map (ring, atan2 column),
  * "first write wins" (ref :623-624) becomes a segment-min scatter of the
    arrival index over cells,
  * per-point IMU rotation interpolation (ref :494-526) is a vectorized
    searchsorted + lerp over the integrated gyro table,
  * compaction with ring start/end indices (ref :642-670) is a mask sort.

Everything is fixed-shape: output arrays are padded to n_scan*horizon_scan
with validity masks.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Params, FLT_MAX
from ..geom.se3 import euler_to_rot
from ..pipeline.cloud_info import CloudInfo, DeskewInfo, RawScan


def _find_rotation(point_time, imu_time, imu_rot, imu_count):
    """Interpolate integrated gyro rotation at `point_time` (batched).

    Bit-matches findRotation (ref: src/imageProjection.cpp:494-526):
      front = first imu index with imu_time[front] > t, capped at imu_count;
      take rot[front] directly if t > imu_time[front] (ran off the end) or
      front == 0; else lerp between front-1 and front.
    imu_time is padded with +inf beyond imu_count.
    """
    q = imu_time.shape[0]
    # first index where point_time < imu_time[idx]; +inf padding keeps
    # searchsorted consistent with the reference's linear scan.
    front = jnp.searchsorted(imu_time, point_time, side="right")
    front = jnp.minimum(front, imu_count)
    t_front = imu_time[jnp.minimum(front, q - 1)]
    direct = (point_time > t_front) | (front == 0)
    back = jnp.maximum(front - 1, 0)
    t_back = imu_time[back]
    denom = t_front - t_back
    ratio_front = jnp.where(denom > 0, (point_time - t_back) / jnp.where(denom == 0, 1.0, denom), 0.0)
    rot_front = imu_rot[jnp.minimum(front, q - 1)]
    rot_back = imu_rot[back]
    interp = rot_front * ratio_front[..., None] + rot_back * (1.0 - ratio_front)[..., None]
    return jnp.where(direct[..., None], rot_front, interp)


def deskew_points(xyz, rel_time, deskew_info: DeskewInfo, first_idx=None,
                  scan_duration=None):
    """Motion-compensate points into the scan-start lidar frame.

    Vectorized deskewPoint (ref: src/imageProjection.cpp:544-580): per-point
    rotation from the gyro integral table, optional positional interpolation
    (the reference stubs position to zero, :528-542 — we keep the odom-based
    path behind `odom_deskew_flag` for capability parity), referenced to the
    first projected point's transform (firstPointFlag, :562-566).

    xyz: [N,3]; rel_time: [N] seconds since scan start.
    first_idx: index of the reference ("first") point; default 0.
    """
    rot = jax.vmap(
        lambda t: _find_rotation(t, deskew_info.imu_time, deskew_info.imu_rot,
                                 deskew_info.imu_count)
    )(rel_time)  # [N,3] (rotX, rotY, rotZ)

    if scan_duration is not None:
        ratio = rel_time / jnp.maximum(scan_duration, 1e-9)
        # gate on the flag alone: odom_deskew_flag already means "the
        # translation increment is valid" (OdomQueue sets it only when both
        # bracketing odoms exist, ref :449-471); odom_available separately
        # gates the initial-guess policy, and a caller may have a velocity
        # source for deskew without a pose source for guesses (e.g. oxts
        # body velocity in examples/run_kitti_slam.py --pos-deskew)
        pos = jnp.where(
            deskew_info.odom_deskew_flag,
            ratio[:, None] * deskew_info.odom_incre[None, :],
            0.0,
        )
    else:
        pos = jnp.zeros_like(xyz)

    R = euler_to_rot(rot[:, 0], rot[:, 1], rot[:, 2])  # [N,3,3]
    if first_idx is None:
        first_idx = 0
    R0 = R[first_idx]
    p0 = pos[first_idx]
    # transBt = inv(T0) @ Ti  (ref :564,571)
    prec = jax.lax.Precision.HIGHEST
    Rbt = jnp.einsum("ji,njk->nik", R0, R, precision=prec)  # R0^T @ Ri
    tbt = jnp.einsum("ji,nj->ni", R0, pos - p0, precision=prec)
    out = jnp.einsum("nij,nj->ni", Rbt, xyz, precision=prec) + tbt
    return out


@partial(jax.jit, static_argnames=("n_scan", "horizon_scan", "min_range",
                                   "enable_deskew"))
def _project_scan_impl(scan: RawScan, deskew_info: DeskewInfo, *, n_scan,
                       horizon_scan, min_range, enable_deskew):
    N = scan.xyz.shape[0]
    G = n_scan * horizon_scan

    x, y, z = scan.xyz[:, 0], scan.xyz[:, 1], scan.xyz[:, 2]
    rng = jnp.sqrt(x * x + y * y + z * z)

    row = scan.ring
    row_ok = (row >= 0) & (row < n_scan)

    # columnIdn = -round((atan2(x,y)*180/pi - 90)/ang_res) + H/2, wrapped
    # (ref: src/imageProjection.cpp:605-615).
    horizon_angle = jnp.arctan2(x, y) * (180.0 / math.pi)
    ang_res_x = 360.0 / float(horizon_scan)
    col = (-jnp.round((horizon_angle - 90.0) / ang_res_x)).astype(jnp.int32) + horizon_scan // 2
    col = jnp.where(col >= horizon_scan, col - horizon_scan, col)
    col_ok = (col >= 0) & (col < horizon_scan)

    range_ok = rng >= min_range  # ref :620 drops range < 1.0
    gate = scan.valid & row_ok & col_ok & range_ok

    cell = jnp.where(gate, row * horizon_scan + col, G)  # G = dropped

    # Deskew all candidate points relative to the first surviving point
    # (firstPointFlag semantics, ref :562-566).
    if enable_deskew:
        any_valid = jnp.any(gate)
        first_idx = jnp.argmax(gate)  # min index with gate=True
        do = deskew_info.imu_available & any_valid
        # scan duration for the positional interpolation ratio (ref :531
        # relTime / scan duration); the positional term itself stays off
        # unless odom_deskew_flag is set (the reference stubs findPosition
        # to zero, :528-542)
        duration = jnp.max(jnp.where(gate, scan.time, 0.0))
        desk = deskew_points(scan.xyz, scan.time, deskew_info,
                             first_idx=first_idx, scan_duration=duration)
        pts = jnp.where(do, desk, scan.xyz)
    else:
        pts = scan.xyz

    # First-write-wins + compaction as two N-sized stable payload sorts —
    # no scatter, no winner gather, no G-sized grid pass (those three were
    # ~55% of the fused frontend's device time at B=128).
    #   sort 1 (by cell): equal cells keep arrival order, so the first
    #     element of each run is the reference's first-write winner
    #     (ref :623-633); runs are in ascending-cell = row-major order.
    #   sort 2 (winners first): stable, so winners stay in row-major
    #     order = the serial push_back order of cloudExtraction
    #     (ref :642-670).
    cell_s, xs, ys, zs, rngs, ints = lax.sort(
        (cell, pts[:, 0], pts[:, 1], pts[:, 2], rng, scan.intensity),
        num_keys=1, is_stable=True)
    first_in_run = jnp.concatenate(
        [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]])
    is_winner = (cell_s < G) & first_in_run
    num_points = jnp.sum(is_winner).astype(jnp.int32)

    # Demote losers' cells to G so the compacted cell array is globally
    # nondecreasing (winners ascending, then all G) — ring offsets become
    # searchsorted lookups instead of a scatter.
    cell_w = jnp.where(is_winner, cell_s, G)
    _, ccell, cx, cy, cz, crng, cint = lax.sort(
        ((~is_winner).astype(jnp.int32), cell_w, xs, ys, zs, rngs, ints),
        num_keys=1, is_stable=True)

    def fit(a, fill):
        if N >= G:
            return a[:G]
        return jnp.concatenate(
            [a, jnp.full((G - N,), fill, a.dtype)])

    comp_valid = jnp.arange(G) < num_points
    ccell = fit(ccell, G)
    comp_xyz = jnp.where(
        comp_valid[:, None],
        jnp.stack([fit(cx, 0.0), fit(cy, 0.0), fit(cz, 0.0)], -1), 0.0)
    comp_range = jnp.where(comp_valid, fit(crng, 0.0), 0.0)
    comp_intensity = jnp.where(comp_valid, fit(cint, 0.0), 0.0)
    comp_col = jnp.where(comp_valid, ccell % horizon_scan, 0)

    # Ring start/end with the ±5 curvature margins (ref :650,668):
    # count_before[r] = #winners with cell < r*H, via searchsorted on the
    # sorted compacted cell array.
    ring_edges = jnp.searchsorted(
        ccell, jnp.arange(n_scan + 1, dtype=jnp.int32) * horizon_scan,
        side="left").astype(jnp.int32)
    count_before = ring_edges[:-1]
    ring_counts = ring_edges[1:] - ring_edges[:-1]
    start_ring_index = count_before - 1 + 5
    end_ring_index = count_before + ring_counts - 1 - 5

    return CloudInfo(
        start_ring_index=start_ring_index,
        end_ring_index=end_ring_index,
        point_col_ind=comp_col,
        point_range=comp_range,
        point_valid=comp_valid,
        num_points=num_points,
        points=comp_xyz,
        intensity=comp_intensity,
        imu_available=deskew_info.imu_available,
        odom_available=deskew_info.odom_available,
        imu_rpy_init=deskew_info.imu_rpy_init,
        initial_guess=deskew_info.initial_guess,
        reset_id=deskew_info.reset_id,
    )


def project_scan(params: Params, scan: RawScan,
                 deskew_info: DeskewInfo | None = None,
                 enable_deskew: bool = True) -> CloudInfo:
    """Project a raw scan to the (ring, column) grid and compact it.

    Fused equivalent of projectPointCloud + cloudExtraction
    (ref: src/imageProjection.cpp:583-670); deskew applied per point when the
    scan has time stamps and IMU info (ref :635, :544-580).
    """
    if deskew_info is None:
        deskew_info = DeskewInfo.empty(params.imu_queue_len)
        enable_deskew = False
    return _project_scan_impl(
        scan,
        deskew_info,
        n_scan=params.n_scan,
        horizon_scan=params.horizon_scan,
        min_range=1.0,
        enable_deskew=enable_deskew,
    )
