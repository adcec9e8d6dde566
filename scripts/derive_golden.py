"""Derive the golden-fixture constants committed in tests/test_golden.py.

Each block below is a LITERAL float64 transcription of the reference C++
expressions (cited per block) evaluated on hand-built inputs — independent of
both the repo's JAX kernels and tests/oracle.py.  Run once; the printed
numbers are committed as constants so that a shared misreading between the
oracle and the JAX path cannot survive (VERDICT.md round-2 item 6).

The corner/surf fixtures are additionally hand-checkable in closed form:
see the comments in tests/test_golden.py.
"""

import numpy as np

np.set_printoptions(precision=12, suppress=False)


def corner_ref(p0, nn):
    """cornerOptimization, ref: src/mapOptmization.h:1027-1120 (literal)."""
    d2 = ((nn - p0) ** 2).sum(1)
    d2_sorted = np.sort(d2)
    if not d2_sorted[4] < 1.0:
        return None
    cx_, cy_, cz_ = nn.mean(0)
    dev = nn - nn.mean(0)
    a11 = (dev[:, 0] * dev[:, 0]).sum() / 5
    a12 = (dev[:, 0] * dev[:, 1]).sum() / 5
    a13 = (dev[:, 0] * dev[:, 2]).sum() / 5
    a22 = (dev[:, 1] * dev[:, 1]).sum() / 5
    a23 = (dev[:, 1] * dev[:, 2]).sum() / 5
    a33 = (dev[:, 2] * dev[:, 2]).sum() / 5
    A = np.array([[a11, a12, a13], [a12, a22, a23], [a13, a23, a33]])
    w, V = np.linalg.eigh(A)               # ascending; cv::eigen = descending
    D1 = w[::-1]                           # matD1 row (descending)
    V1 = V[:, ::-1].T                      # matV1 rows (descending)
    if not (D1[0] > 3 * D1[1]):
        return "reject_line"
    x0, y0, z0 = p0
    x1 = cx_ + 0.1 * V1[0, 0]; y1 = cy_ + 0.1 * V1[0, 1]; z1 = cz_ + 0.1 * V1[0, 2]
    x2 = cx_ - 0.1 * V1[0, 0]; y2 = cy_ - 0.1 * V1[0, 1]; z2 = cz_ - 0.1 * V1[0, 2]
    a012 = np.sqrt(((x0-x1)*(y0-y2) - (x0-x2)*(y0-y1))**2
                   + ((x0-x1)*(z0-z2) - (x0-x2)*(z0-z1))**2
                   + ((y0-y1)*(z0-z2) - (y0-y2)*(z0-z1))**2)
    l12 = np.sqrt((x1-x2)**2 + (y1-y2)**2 + (z1-z2)**2)
    la = ((y1-y2)*((x0-x1)*(y0-y2) - (x0-x2)*(y0-y1))
          + (z1-z2)*((x0-x1)*(z0-z2) - (x0-x2)*(z0-z1))) / a012 / l12
    lb = -((x1-x2)*((x0-x1)*(y0-y2) - (x0-x2)*(y0-y1))
           - (z1-z2)*((y0-y1)*(z0-z2) - (y0-y2)*(z0-z1))) / a012 / l12
    lc = -((x1-x2)*((x0-x1)*(z0-z2) - (x0-x2)*(z0-z1))
           + (y1-y2)*((y0-y1)*(z0-z2) - (y0-y2)*(z0-z1))) / a012 / l12
    ld2 = a012 / l12
    s = 1 - 0.9 * abs(ld2)
    if not (s > 0.1):
        return "reject_s"
    return np.array([s * la, s * lb, s * lc]), s * ld2


def surf_ref(p0, nn):
    """surfOptimization, ref: src/mapOptmization.h:1154-1211 (literal)."""
    d2 = ((nn - p0) ** 2).sum(1)
    if not np.sort(d2)[4] < 1.0:
        return None
    matA0 = nn.copy()
    matB0 = -np.ones(5)
    matX0, *_ = np.linalg.lstsq(matA0, matB0, rcond=None)  # colPivHouseholderQr
    pa, pb, pc = matX0
    pd = 1.0
    ps = np.sqrt(pa*pa + pb*pb + pc*pc)
    pa, pb, pc, pd = pa/ps, pb/ps, pc/ps, pd/ps
    for j in range(5):
        if abs(pa*nn[j, 0] + pb*nn[j, 1] + pc*nn[j, 2] + pd) > 0.2:
            return "reject_plane"
    pd2 = pa*p0[0] + pb*p0[1] + pc*p0[2] + pd
    s = 1 - 0.9 * abs(pd2) / np.sqrt(np.sqrt(p0[0]**2 + p0[1]**2 + p0[2]**2))
    if not (s > 0.1):
        return "reject_s"
    return np.array([s * pa, s * pb, s * pc]), s * pd2


def lm_ref(pose, pts_lidar, coeff, resid):
    """LMOptimization iteration 0, ref: src/mapOptmization.h:1259-1385
    (literal, incl. the lidar->camera permutation)."""
    srx = np.sin(pose[1]); crx = np.cos(pose[1])
    sry = np.sin(pose[2]); cry = np.cos(pose[2])
    srz = np.sin(pose[0]); crz = np.cos(pose[0])
    n = len(pts_lidar)
    A = np.zeros((n, 6))
    B = np.zeros(n)
    for i in range(n):
        # lidar -> camera (ref :1285-1293)
        px, py, pz = pts_lidar[i, 1], pts_lidar[i, 2], pts_lidar[i, 0]
        cx_, cy_, cz_ = coeff[i, 1], coeff[i, 2], coeff[i, 0]
        arx = ((crx*sry*srz*px + crx*crz*sry*py - srx*sry*pz) * cx_
               + (-srx*srz*px - crz*srx*py - crx*pz) * cy_
               + (crx*cry*srz*px + crx*cry*crz*py - cry*srx*pz) * cz_)
        ary = (((cry*srx*srz - crz*sry)*px
                + (sry*srz + cry*crz*srx)*py + crx*cry*pz) * cx_
               + ((-cry*crz - srx*sry*srz)*px
                  + (cry*srz - crz*srx*sry)*py - crx*sry*pz) * cz_)
        arz = (((crz*srx*sry - cry*srz)*px + (-cry*crz - srx*sry*srz)*py)*cx_
               + (crx*crz*px - crx*srz*py) * cy_
               + ((sry*srz + cry*crz*srx)*px + (crz*sry - cry*srx*srz)*py)*cz_)
        A[i] = [arz, arx, ary, cz_, cx_, cy_]
        B[i] = -resid[i]
    AtA = A.T @ A
    AtB = A.T @ B
    x = np.linalg.solve(AtA, AtB)
    # iterCount == 0 degeneracy analysis (ref :1346-1377)
    w, V = np.linalg.eigh(AtA)
    is_deg = bool((w < 100.0).any())
    if is_deg:
        P = (V * (w >= 100.0)[None, :]) @ V.T
        x = P @ x
    return pose + x, is_deg, np.sort(w)


def main():
    print("== corner accept (neighbors on the x-axis, query 0.3 m off) ==")
    nn = np.array([[-0.2, 0, 0], [-0.1, 0, 0], [0, 0, 0],
                   [0.1, 0, 0], [0.2, 0, 0]], float)
    p0 = np.array([0.05, 0.3, 0.0])
    coeff, resid = corner_ref(p0, nn)
    print("coeff =", coeff, " resid =", resid)

    print("== corner reject (planar neighborhood, lmax <= 3*lmid) ==")
    nn2 = np.array([[0.1, 0.1, 0], [0.1, -0.1, 0], [-0.1, 0.1, 0],
                    [-0.1, -0.1, 0], [0, 0, 0]], float)
    print(corner_ref(np.array([0.0, 0.0, 0.3]), nn2))

    print("== surf accept (plane z=0.5, query at ||p||^2 = 1) ==")
    nn3 = np.array([[0.3, 0, 0.5], [-0.3, 0, 0.5], [0, 0.3, 0.5],
                    [0, -0.3, 0.5], [0.1, 0.1, 0.5]], float)
    p03 = np.array([0.6, 0.0, 0.8])
    coeff, resid = surf_ref(p03, nn3)
    print("coeff =", coeff, " resid =", resid)

    print("== surf reject (5th neighbor 0.7 m off-plane) ==")
    nn4 = nn3.copy(); nn4[4, 2] = 1.2
    print(surf_ref(np.array([0.6, 0.0, 0.8]), nn4))

    print("== GN step (1000 correspondences, pose [0.1,-0.05,0.2,0.5,-0.3,0.2]) ==")
    rng = np.random.default_rng(12345)
    N = 1000
    pts = rng.uniform(-10.0, 10.0, (N, 3))
    nrm = rng.normal(size=(N, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    s = rng.uniform(0.5, 1.0, N)
    coeff = s[:, None] * nrm
    resid = s * rng.uniform(-0.5, 0.5, N)
    pose = np.array([0.1, -0.05, 0.2, 0.5, -0.3, 0.2])
    pose_new, is_deg, w = lm_ref(pose, pts, coeff, resid)
    print("pose_new =", repr(pose_new))
    print("is_degenerate =", is_deg)
    print("eigs min/max =", w[0], w[-1])

    print("== GN degenerate step (coeffs ~ +z only + tiny noise) ==")
    coeff_z = 0.05 * rng.normal(size=(N, 3))
    coeff_z[:, 2] += 0.8
    resid_z = np.full(N, 0.8 * 0.1)
    pose_new2, is_deg2, w2 = lm_ref(pose, pts, coeff_z, resid_z)
    print("pose_new =", repr(pose_new2))
    print("is_degenerate =", is_deg2)
    print("eigs =", w2)


if __name__ == "__main__":
    main()
