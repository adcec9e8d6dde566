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
    # float32 like the C++ (pointRange/cloudCurvature are float,
    # ref: src/featureExtraction.h:115-122); the serial left-associative
    # add order here IS the reference's rounding, which the JAX kernel's
    # _curvature_flat reproduces bit-for-bit
    rng = cloud["point_range"].astype(np.float32)
    col = cloud["point_col_ind"].astype(np.int64)
    start = cloud["start_ring_index"]
    end = cloud["end_ring_index"]
    size = len(rng)

    curv = np.zeros(size, np.float32)
    picked = np.zeros(size, np.int32)
    label = np.zeros(size, np.int32)
    smooth = np.zeros(size, np.float32)
    for i in range(5, size - 5):
        d = (rng[i - 5] + rng[i - 4] + rng[i - 3] + rng[i - 2] + rng[i - 1]
             - rng[i] * np.float32(10) + rng[i + 1] + rng[i + 2]
             + rng[i + 3] + rng[i + 4] + rng[i + 5])
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
_tree_cache = {}


def knn5(query, ref, chunk=1024):
    """Exact 5-NN.  Uses a cached scipy cKDTree per map array when scipy is
    available (the map is queried ~60x per oracle solve); falls back to the
    original chunked brute force otherwise.  Both are exact."""
    try:
        from scipy.spatial import cKDTree
    except ImportError:
        return _knn5_brute(query, ref, chunk)
    key = (ref.ctypes.data, ref.shape)
    hit = _tree_cache.get(key)
    if hit is None or hit[0] is not ref:
        hit = (ref, cKDTree(ref.astype(np.float64)))
        _tree_cache.clear()          # one map at a time; avoid stale refs
        _tree_cache[key] = hit
    d, i = hit[1].query(query.astype(np.float64), k=5)
    return d * d, i


def _knn5_brute(query, ref, chunk=1024):
    q = query.astype(np.float64)
    r = ref.astype(np.float64)
    r_norm = (r * r).sum(-1)
    out_d = np.empty((len(q), 5))
    out_i = np.empty((len(q), 5), np.int64)
    for s0 in range(0, len(q), chunk):
        qc = q[s0:s0 + chunk]
        d2 = (qc * qc).sum(-1)[:, None] + r_norm[None, :] - 2.0 * (qc @ r.T)
        part = np.argpartition(d2, 5, axis=1)[:, :5]
        dpart = np.take_along_axis(d2, part, 1)
        order = np.argsort(dpart, axis=1)
        out_d[s0:s0 + chunk] = np.take_along_axis(dpart, order, 1)
        out_i[s0:s0 + chunk] = np.take_along_axis(part, order, 1)
    return out_d, out_i


def corner_coeffs(pts_world, map_pts, d2, idx):
    """cornerOptimization math (ref: src/mapOptmization.h:1002-1124),
    batched with NumPy f64 (independent of the JAX kernels)."""
    N = pts_world.shape[0]
    coeff = np.zeros((N, 3))
    resid = np.zeros(N)
    mask = np.zeros(N, bool)

    nn = map_pts[idx].astype(np.float64)                 # [N,5,3]
    c = nn.mean(1)
    dev = nn - c[:, None, :]
    cov = np.einsum("nki,nkj->nij", dev, dev) / 5.0
    w, V = np.linalg.eigh(cov)                           # ascending
    line_ok = w[:, 2] > 3 * w[:, 1]

    v = V[:, :, 2]
    p0 = pts_world.astype(np.float64)
    p1 = c + 0.1 * v
    p2 = c - 0.1 * v
    d01 = p0 - p1
    d02 = p0 - p2
    cx = d01[:, 0] * d02[:, 1] - d02[:, 0] * d01[:, 1]
    cy = d01[:, 0] * d02[:, 2] - d02[:, 0] * d01[:, 2]
    cz = d01[:, 1] * d02[:, 2] - d02[:, 1] * d01[:, 2]
    a012 = np.sqrt(cx * cx + cy * cy + cz * cz)
    d12 = p1 - p2
    l12 = np.linalg.norm(d12, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        la = (d12[:, 1] * cx + d12[:, 2] * cy) / a012 / l12
        lb = -(d12[:, 0] * cx - d12[:, 2] * cz) / a012 / l12
        lc = -(d12[:, 0] * cy + d12[:, 1] * cz) / a012 / l12
        ld2 = a012 / l12
    s_w = 1 - 0.9 * np.abs(ld2)
    ok = (d2[:, 4] < 1.0) & line_ok & (s_w > 0.1) & (a012 > 1e-12)
    coeff[ok] = (s_w[:, None] * np.stack([la, lb, lc], -1))[ok]
    resid[ok] = (s_w * ld2)[ok]
    mask[ok] = True
    return coeff, resid, mask


def surf_coeffs(pts_world, map_pts, d2, idx):
    """surfOptimization math (ref: src/mapOptmization.h:1126-1215), batched."""
    N = pts_world.shape[0]
    coeff = np.zeros((N, 3))
    resid = np.zeros(N)
    mask = np.zeros(N, bool)

    A = map_pts[idx].astype(np.float64)                  # [N,5,3]
    b = -np.ones((N, 5))
    # least squares per point (colPivHouseholderQr equivalent)
    AtA = np.einsum("nki,nkj->nij", A, A)
    Atb = np.einsum("nki,nk->ni", A, b)
    ok_det = np.abs(np.linalg.det(AtA)) > 1e-12
    # pinv = least-squares solution (colPivHouseholderQr behavior on
    # rank-deficient fits; those get rejected by the 0.2 m plane gate anyway)
    n = np.einsum("nij,nj->ni", np.linalg.pinv(AtA), Atb)

    ps = np.linalg.norm(n, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        pa, pb, pc = (n / np.where(ps > 1e-12, ps, 1)[:, None]).T
        pd = 1.0 / np.where(ps > 1e-12, ps, 1)
    plane_res = np.abs(pa[:, None] * A[:, :, 0] + pb[:, None] * A[:, :, 1]
                       + pc[:, None] * A[:, :, 2] + pd[:, None])
    plane_ok = (plane_res <= 0.2).all(1) & ok_det & (ps > 1e-12)

    x, y, z = pts_world[:, 0], pts_world[:, 1], pts_world[:, 2]
    pd2 = pa * x + pb * y + pc * z + pd
    # ref :1198: sqrt(sqrt(x*x+y*y+z*z)) — the inner arg is the SQUARED norm.
    s_w = 1 - 0.9 * np.abs(pd2) / np.sqrt(np.sqrt(x * x + y * y + z * z))
    ok = (d2[:, 4] < 1.0) & plane_ok & (s_w > 0.1)
    coeff[ok] = (s_w[:, None] * np.stack([pa, pb, pc], -1))[ok]
    resid[ok] = (s_w * pd2)[ok]
    mask[ok] = True
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
    px, py, pz = pts_lidar[:, 1], pts_lidar[:, 2], pts_lidar[:, 0]
    cx, cy, cz = coeff[:, 1], coeff[:, 2], coeff[:, 0]
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
    A = np.stack([arz, arx, ary, cz, cx, cy], -1).astype(np.float64)
    B = (-resid).astype(np.float64)

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
