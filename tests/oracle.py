"""NumPy oracle: serial reimplementation of the reference pipeline math.

This mirrors the C++ reference algorithm step-for-step (same loops, same
quirks) so the vectorized TPU kernels can be fuzz-checked against it.  It is
the project's stand-in for "the C++/PCL reference" in ATE comparisons
(BASELINE.md), since ROS/PCL/GTSAM are not available in this environment.

Citations refer to /root/reference (studied, not copied — this is NumPy).
"""

from __future__ import annotations

import numpy as np

FLT_MAX = np.float32(3.4028235e38)


def euler_to_rot(roll, pitch, yaw):
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def pose6_to_matrix(p):
    T = np.eye(4)
    T[:3, :3] = euler_to_rot(p[0], p[1], p[2])
    T[:3, 3] = p[3:6]
    return T


# ---------------------------------------------------------------- projection
def project_scan(xyz, ring, time, valid, n_scan=16, horizon_scan=1800,
                 min_range=1.0, deskew=None):
    """Serial projectPointCloud + cloudExtraction
    (ref: src/imageProjection.cpp:583-670)."""
    G = n_scan * horizon_scan
    range_mat = np.full((n_scan, horizon_scan), FLT_MAX, np.float32)
    full_xyz = np.zeros((G, 3), np.float32)
    ang_res = 360.0 / horizon_scan

    first = True
    R0 = np.eye(3)
    for i in range(xyz.shape[0]):
        if not valid[i]:
            continue
        row = int(ring[i])
        if row < 0 or row >= n_scan:
            continue
        ha = np.arctan2(xyz[i, 0], xyz[i, 1]) * 180.0 / np.pi
        col = int(-round((ha - 90.0) / ang_res)) + horizon_scan // 2
        if col >= horizon_scan:
            col -= horizon_scan
        if col < 0 or col >= horizon_scan:
            continue
        rng = float(np.sqrt((xyz[i] ** 2).sum()))
        if rng < min_range:
            continue
        if range_mat[row, col] != FLT_MAX:
            continue
        range_mat[row, col] = rng
        p = xyz[i]
        if deskew is not None:
            rot = deskew(float(time[i]))
            Ri = euler_to_rot(*rot)
            if first:
                R0 = Ri
                first = False
            p = (R0.T @ Ri) @ p
        full_xyz[col + row * horizon_scan] = p

    # compaction
    start_ring = np.zeros(n_scan, np.int32)
    end_ring = np.zeros(n_scan, np.int32)
    col_ind, rng_out, pts_out = [], [], []
    count = 0
    for i in range(n_scan):
        start_ring[i] = count - 1 + 5
        for j in range(horizon_scan):
            if range_mat[i, j] != FLT_MAX:
                col_ind.append(j)
                rng_out.append(range_mat[i, j])
                pts_out.append(full_xyz[j + i * horizon_scan])
                count += 1
        end_ring[i] = count - 1 - 5
    return dict(
        start_ring_index=start_ring,
        end_ring_index=end_ring,
        point_col_ind=np.array(col_ind, np.int32),
        point_range=np.array(rng_out, np.float32),
        points=np.array(pts_out, np.float32).reshape(-1, 3),
        range_mat=range_mat,
    )


def find_rotation_factory(imu_time, imu_rot):
    """findRotation over an integrated gyro table
    (ref: src/imageProjection.cpp:494-526)."""
    n = len(imu_time) - 1  # imuPointerCur semantics: last valid index

    def f(point_time):
        front = 0
        while front < n:
            if point_time < imu_time[front]:
                break
            front += 1
        if point_time > imu_time[front] or front == 0:
            return imu_rot[front]
        back = front - 1
        rf = (point_time - imu_time[back]) / (imu_time[front] - imu_time[back])
        rb = (imu_time[front] - point_time) / (imu_time[front] - imu_time[back])
        return imu_rot[front] * rf + imu_rot[back] * rb

    return f


# ------------------------------------------------------------------ features
def extract_features(cloud, edge_threshold=1.0, surf_threshold=0.1,
                     n_scan=16):
    """Serial calculateSmoothness + markOccludedPoints + extractFeatures
    (ref: src/featureExtraction.h:109-294), without the per-ring voxel
    downsample (tested separately).  Returns indices of corner picks and
    surface candidates per ring."""
    rng = cloud["point_range"].astype(np.float64)
    col = cloud["point_col_ind"].astype(np.int64)
    start = cloud["start_ring_index"]
    end = cloud["end_ring_index"]
    size = len(rng)

    curv = np.zeros(size)
    picked = np.zeros(size, np.int32)
    label = np.zeros(size, np.int32)
    smooth = np.zeros(size)
    for i in range(5, size - 5):
        d = (rng[i - 5] + rng[i - 4] + rng[i - 3] + rng[i - 2] + rng[i - 1]
             - rng[i] * 10 + rng[i + 1] + rng[i + 2] + rng[i + 3]
             + rng[i + 4] + rng[i + 5])
        curv[i] = d * d
        picked[i] = 0
        label[i] = 0
        smooth[i] = curv[i]

    for i in range(5, size - 6):
        d1, d2 = rng[i], rng[i + 1]
        cd = abs(int(col[i + 1] - col[i]))
        if cd < 10:
            if d1 - d2 > 0.3:
                picked[i - 5:i + 1] = 1
            elif d2 - d1 > 0.3:
                picked[i + 1:i + 7] = 1
        df1 = abs(rng[i - 1] - rng[i])
        df2 = abs(rng[i + 1] - rng[i])
        if df1 > 0.02 * rng[i] and df2 > 0.02 * rng[i]:
            picked[i] = 1

    corner_idx = [[] for _ in range(n_scan)]
    surf_idx = [[] for _ in range(n_scan)]

    for r in range(n_scan):
        for j in range(6):
            sp = int((start[r] * (6 - j) + end[r] * j) / 6)
            ep = int((start[r] * (5 - j) + end[r] * (j + 1)) / 6) - 1
            if sp >= ep:
                continue
            # sort [sp, ep) by curvature; slot ep keeps its own value (the
            # reference's sort range excludes ep but the loops include it).
            seg = sorted(range(sp, ep), key=lambda k: (smooth[k], k))
            order = list(seg) + [ep]  # slot indices sp..ep after "sort"

            largest = 0
            for k in range(len(order) - 1, -1, -1):
                ind = order[k]
                if picked[ind] == 0 and curv[ind] > edge_threshold:
                    largest += 1
                    if largest <= 20:
                        label[ind] = 1
                        corner_idx[r].append(ind)
                    else:
                        break
                    picked[ind] = 1
                    for l in range(1, 6):
                        cd = abs(int(col[ind + l] - col[ind + l - 1]))
                        if cd > 10:
                            break
                        picked[ind + l] = 1
                    for l in range(-1, -6, -1):
                        cd = abs(int(col[ind + l] - col[ind + l + 1]))
                        if cd > 10:
                            break
                        picked[ind + l] = 1

            for k in range(len(order)):
                ind = order[k]
                if picked[ind] == 0 and curv[ind] < surf_threshold:
                    label[ind] = -1
                    picked[ind] = 1
                    for l in range(1, 6):
                        cd = abs(int(col[ind + l] - col[ind + l - 1]))
                        if cd > 10:
                            break
                        picked[ind + l] = 1
                    for l in range(-1, -6, -1):
                        cd = abs(int(col[ind + l] - col[ind + l + 1]))
                        if cd > 10:
                            break
                        picked[ind + l] = 1

            for k in range(sp, ep + 1):
                if label[k] <= 0:
                    surf_idx[r].append(k)

    return dict(curvature=curv, picked=picked, label=label,
                corner_idx=corner_idx, surf_idx=surf_idx)


# --------------------------------------------------------------- voxel grid
def voxel_downsample(pts, leaf):
    keys = np.floor(pts / leaf).astype(np.int64)
    uk, inv = np.unique(keys, axis=0, return_inverse=True)
    cent = np.zeros((len(uk), 3))
    cnt = np.zeros(len(uk))
    np.add.at(cent, inv, pts.astype(np.float64))
    np.add.at(cnt, inv, 1)
    return (cent / cnt[:, None]).astype(np.float32)


# ------------------------------------------------------------- registration
def knn5(query, ref):
    q = query.astype(np.float64)
    r = ref.astype(np.float64)
    d2 = (q * q).sum(-1)[:, None] + (r * r).sum(-1)[None, :] - 2.0 * (q @ r.T)
    part = np.argpartition(d2, 5, axis=1)[:, :5]
    dpart = np.take_along_axis(d2, part, 1)
    order = np.argsort(dpart, axis=1)
    return np.take_along_axis(dpart, order, 1), np.take_along_axis(part, order, 1)


def corner_coeffs(pts_world, map_pts, d2, idx):
    """Serial cornerOptimization math (ref: src/mapOptmization.h:1002-1124)."""
    N = pts_world.shape[0]
    coeff = np.zeros((N, 3))
    resid = np.zeros(N)
    mask = np.zeros(N, bool)
    for i in range(N):
        if d2[i, 4] >= 1.0:
            continue
        nn = map_pts[idx[i]]
        c = nn.mean(0)
        A = ((nn - c).T @ (nn - c)) / 5.0
        w, V = np.linalg.eigh(A)  # ascending
        if w[2] > 3 * w[1]:
            x0, y0, z0 = pts_world[i]
            v = V[:, 2]
            x1, y1, z1 = c + 0.1 * v
            x2, y2, z2 = c - 0.1 * v
            a012 = np.sqrt(
                ((x0 - x1) * (y0 - y2) - (x0 - x2) * (y0 - y1)) ** 2
                + ((x0 - x1) * (z0 - z2) - (x0 - x2) * (z0 - z1)) ** 2
                + ((y0 - y1) * (z0 - z2) - (y0 - y2) * (z0 - z1)) ** 2
            )
            l12 = np.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2 + (z1 - z2) ** 2)
            la = ((y1 - y2) * ((x0 - x1) * (y0 - y2) - (x0 - x2) * (y0 - y1))
                  + (z1 - z2) * ((x0 - x1) * (z0 - z2) - (x0 - x2) * (z0 - z1))) / a012 / l12
            lb = -((x1 - x2) * ((x0 - x1) * (y0 - y2) - (x0 - x2) * (y0 - y1))
                   - (z1 - z2) * ((y0 - y1) * (z0 - z2) - (y0 - y2) * (z0 - z1))) / a012 / l12
            lc = -((x1 - x2) * ((x0 - x1) * (z0 - z2) - (x0 - x2) * (z0 - z1))
                   + (y1 - y2) * ((y0 - y1) * (z0 - z2) - (y0 - y2) * (z0 - z1))) / a012 / l12
            ld2 = a012 / l12
            s = 1 - 0.9 * abs(ld2)
            if s > 0.1:
                coeff[i] = s * np.array([la, lb, lc])
                resid[i] = s * ld2
                mask[i] = True
    return coeff, resid, mask


def surf_coeffs(pts_world, map_pts, d2, idx):
    """Serial surfOptimization math (ref: src/mapOptmization.h:1126-1215)."""
    N = pts_world.shape[0]
    coeff = np.zeros((N, 3))
    resid = np.zeros(N)
    mask = np.zeros(N, bool)
    for i in range(N):
        if d2[i, 4] >= 1.0:
            continue
        A = map_pts[idx[i]]
        b = -np.ones(5)
        n, *_ = np.linalg.lstsq(A, b, rcond=None)
        pa, pb, pc = n
        pd = 1.0
        ps = np.sqrt(pa * pa + pb * pb + pc * pc)
        pa, pb, pc, pd = pa / ps, pb / ps, pc / ps, pd / ps
        ok = True
        for j in range(5):
            if abs(pa * A[j, 0] + pb * A[j, 1] + pc * A[j, 2] + pd) > 0.2:
                ok = False
                break
        if not ok:
            continue
        x, y, z = pts_world[i]
        pd2 = pa * x + pb * y + pc * z + pd
        # s = 1 - 0.9*|pd2| / sqrt(sqrt(|p|))  (ref :1198)
        s = 1 - 0.9 * abs(pd2) / np.sqrt(np.sqrt(np.sqrt(x * x + y * y + z * z)))
        if s > 0.1:
            coeff[i] = s * np.array([pa, pb, pc])
            resid[i] = s * pd2
            mask[i] = True
    return coeff, resid, mask


def lm_step(pose, pts_lidar, coeff, resid, iter_count, state):
    """LMOptimization's GN step with the reference's camera-permuted Jacobian
    (ref: src/mapOptmization.h:1246-1401).  state carries (matP, isDeg)."""
    srx = np.sin(pose[1]); crx = np.cos(pose[1])
    sry = np.sin(pose[2]); cry = np.cos(pose[2])
    srz = np.sin(pose[0]); crz = np.cos(pose[0])

    n = pts_lidar.shape[0]
    if n < 50:
        return pose, False, state
    A = np.zeros((n, 6), np.float32)
    B = np.zeros((n,), np.float32)
    for i in range(n):
        px, py, pz = pts_lidar[i, 1], pts_lidar[i, 2], pts_lidar[i, 0]
        cx, cy, cz = coeff[i, 1], coeff[i, 2], coeff[i, 0]
        arx = ((crx * sry * srz * px + crx * crz * sry * py - srx * sry * pz) * cx
               + (-srx * srz * px - crz * srx * py - crx * pz) * cy
               + (crx * cry * srz * px + crx * cry * crz * py - cry * srx * pz) * cz)
        ary = (((cry * srx * srz - crz * sry) * px
                + (sry * srz + cry * crz * srx) * py + crx * cry * pz) * cx
               + ((-cry * crz - srx * sry * srz) * px
                  + (cry * srz - crz * srx * sry) * py - crx * sry * pz) * cz)
        arz = (((crz * srx * sry - cry * srz) * px + (-cry * crz - srx * sry * srz) * py) * cx
               + (crx * crz * px - crx * srz * py) * cy
               + ((sry * srz + cry * crz * srx) * px + (crz * sry - cry * srx * srz) * py) * cz)
        A[i] = [arz, arx, ary, cz, cx, cy]
        B[i] = -resid[i]

    AtA = A.T @ A
    AtB = A.T @ B
    x = np.linalg.solve(AtA, AtB)

    matP, is_deg = state
    if iter_count == 0:
        w, V = np.linalg.eigh(AtA.astype(np.float64))  # ascending
        good = w >= 100.0
        matP = (V * good[None, :]) @ V.T
        is_deg = bool((~good).any())
    if is_deg:
        x = matP @ x

    pose = pose + x
    dR = np.sqrt(((np.rad2deg(x[:3])) ** 2).sum())
    dT = np.sqrt(((x[3:] * 100) ** 2).sum())
    return pose, (dR < 0.05 and dT < 0.05), (matP, is_deg)


def register_scan(corner, surf, map_corner, map_surf, init_pose,
                  max_iter=30):
    """Serial scan2MapOptimization (ref: src/mapOptmization.h:1403-1442)."""
    pose = np.asarray(init_pose, np.float64).copy()
    state = (np.eye(6), False)
    for it in range(max_iter):
        T = pose6_to_matrix(pose)
        cw = corner @ T[:3, :3].T + T[:3, 3]
        sw = surf @ T[:3, :3].T + T[:3, 3]
        cd2, cidx = knn5(cw, map_corner)
        sd2, sidx = knn5(sw, map_surf)
        ccoef, cres, cmask = corner_coeffs(cw, map_corner, cd2, cidx)
        scoef, sres, smask = surf_coeffs(sw, map_surf, sd2, sidx)
        pts = np.concatenate([corner[cmask], surf[smask]])
        coef = np.concatenate([ccoef[cmask], scoef[smask]])
        res = np.concatenate([cres[cmask], sres[smask]])
        pose, conv, state = lm_step(pose, pts, coef, res, it, state)
        if conv:
            break
    return pose, it + 1
