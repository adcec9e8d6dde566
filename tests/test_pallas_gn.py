"""Parity test: fused Pallas GN-round kernel vs the XLA rounds solver.

Same candidate sets, same gates, same math — the fused path may differ only
by the 1e-2 Tikhonov shift in its per-iteration 6x6 solve (<= 1e-4 relative
on non-degenerate directions), the polynomial arccos (2e-8), and reduction
order.  Poses must agree to sub-mm.

CPU CI runs the kernel in Pallas interpret mode on a TINY problem — the
full bench-sized kernel takes tens of minutes to compile under interpret on
this 1-CPU box.  The full-size configuration is validated on real TPU by
bench.py (solver=pallas_fused_gn) where the same comparison ran at
max |pose diff| = 2.4e-5 (docs/ROUND_NOTES.md round 3).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# The FULL-SIZE fused-path test (Pallas fetch + GN kernel at bench shapes)
# only runs on TPU: its interpret-mode compile takes >30 min on this 1-CPU
# box.  The TINY kernel-parity test below always runs — interpret mode,
# jacobi_sweeps=2 (the scalar-unrolled Jacobi is what blows up the
# interpret compile: 2 sweeps ~25 s, 6 sweeps >9.5 min on this host).
_FULL = (jax.default_backend() == "tpu"
         or bool(os.environ.get("FBPR_SLOW_PALLAS")))

from feature_base_pointcloud_registration_tpu.ops.pallas_gn import (
    STAT, gn_round_pallas)
from feature_base_pointcloud_registration_tpu.ops.register import (
    register_rounds_core)
from feature_base_pointcloud_registration_tpu.parallel.batch import (
    batch_register_blocks, batch_register_fused, build_map_block_tables,
    build_map_planar_tables)
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
    FeatureMap, ScanFeatures)

B = 2
PC, PS = 256, 512          # B*PC, B*PS must be multiples of 512
MC, MS = 2048, 4096


def _lines_and_planes(r, n_pts, kind):
    if kind == "corner":
        n_lines = 12
        xy = r.uniform(-8, 8, (n_lines, 2))
        li = r.randint(0, n_lines, n_pts)
        z = r.uniform(-1, 3, n_pts)
        return np.stack([xy[li, 0], xy[li, 1], z], -1).astype(np.float32)
    sx = r.uniform(-10, 10, (n_pts, 2))
    which = r.randint(0, 3, n_pts)
    pts = np.where(
        (which == 0)[:, None],
        np.stack([sx[:, 0], sx[:, 1], np.full(n_pts, -1.5)], -1),
        np.where((which == 1)[:, None],
                 np.stack([sx[:, 0], np.full(n_pts, 10.0), sx[:, 1]], -1),
                 np.stack([np.full(n_pts, -10.0), sx[:, 0], sx[:, 1]], -1)))
    return pts.astype(np.float32)


def _setup():
    r = np.random.RandomState(3)
    mc = _lines_and_planes(r, MC, "corner")
    ms = _lines_and_planes(r, MS, "surf")
    fmap = FeatureMap(jnp.asarray(mc), jnp.ones(MC, bool),
                      jnp.asarray(ms), jnp.ones(MS, bool))

    gt, fc, fs = [], [], []
    for b in range(B):
        pose = np.array([0.01 * b, -0.01, 0.02, 0.3 * b, -0.2, 0.0],
                        np.float32)
        gt.append(pose)
        # scan features = noisy map subsets pulled back to the lidar frame
        from feature_base_pointcloud_registration_tpu.io.synthetic import (
            pose6_to_matrix_np)
        T = np.linalg.inv(pose6_to_matrix_np(pose))
        ci = r.choice(MC, PC, replace=False)
        si = r.choice(MS, PS, replace=False)
        cw = mc[ci] + r.normal(0, 0.01, (PC, 3))
        sw = ms[si] + r.normal(0, 0.01, (PS, 3))
        fc.append((cw @ T[:3, :3].T + T[:3, 3]).astype(np.float32))
        fs.append((sw @ T[:3, :3].T + T[:3, 3]).astype(np.float32))
    feats = ScanFeatures(
        corner_xyz=jnp.asarray(np.stack(fc)),
        corner_mask=jnp.ones((B, PC), bool),
        surf_xyz=jnp.asarray(np.stack(fs)),
        surf_mask=jnp.ones((B, PS), bool))
    gt = np.stack(gt)
    guesses = gt + np.array([[0.01, -0.005, 0.01, 0.1, -0.08, 0.03],
                             [-0.008, 0.01, -0.01, -0.1, 0.06, -0.04]],
                            np.float32)
    center = np.zeros(3, np.float32)
    half = np.array([12.0, 12.0, 5.0], np.float32)
    return feats, jnp.asarray(guesses), gt, fmap, center, half


def test_gn_kernel_matches_rounds_core_same_candidates():
    """Kernel-math parity on the CPU suite: gn_round_pallas (interpret
    mode) vs register_rounds_core fed the IDENTICAL candidate sets via a
    constant fetch.  One round isolates the kernel's correspondence, line/
    plane fits, Jacobian, 6x6 solve and convergence logic from the fetch
    (candidates are fixed per round in both paths; distances recompute per
    iteration from candidate coordinates).

    jacobi_sweeps=2 keeps the interpret compile ~25 s (the 6-sweep unroll
    is >9.5 min on this 1-CPU host); the scene is far from the eigenvalue
    threshold so the rough spectrum still classifies non-degenerate.
    Full-size parity (fetch included, 6 sweeps) runs on TPU below and in
    bench.py's fused-vs-blocks agreement.
    """
    B, PC_, PS_, K, ITERS = 2, 128, 128, 6, 5
    MC_, MS_ = 1024, 1024
    r = np.random.RandomState(7)
    # small-extent dense scene: every feature must find its 5-NN well
    # inside the 1 m correspondence gate, or lanes go correspondence-
    # starved and the comparison tests divergence, not parity
    n_lines = 10
    xy = r.uniform(-4, 4, (n_lines, 2))
    li = r.randint(0, n_lines, MC_)
    mc = np.stack([xy[li, 0], xy[li, 1],
                   r.uniform(-1, 3, MC_)], -1).astype(np.float32)
    sx = r.uniform(-5, 5, (MS_, 2))
    which = r.randint(0, 3, MS_)
    ms = np.where(
        (which == 0)[:, None],
        np.stack([sx[:, 0], sx[:, 1], np.full(MS_, -1.5)], -1),
        np.where((which == 1)[:, None],
                 np.stack([sx[:, 0], np.full(MS_, 5.0), sx[:, 1]], -1),
                 np.stack([np.full(MS_, -5.0), sx[:, 0], sx[:, 1]], -1))
    ).astype(np.float32)

    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        pose6_to_matrix_np)

    gt, fc, fs, guesses = [], [], [], []
    offs = np.array([[0.01, -0.005, 0.008, 0.05, -0.04, 0.02],
                     [-0.006, 0.009, -0.01, -0.05, 0.03, -0.04]], np.float32)
    for b in range(B):
        pose = np.array([0.01 * b, -0.01, 0.02, 0.2 * b, -0.1, 0.0],
                        np.float32)
        gt.append(pose)
        T = np.linalg.inv(pose6_to_matrix_np(pose))
        ci = r.choice(MC_, PC_, replace=False)
        si = r.choice(MS_, PS_, replace=False)
        cw = mc[ci] + r.normal(0, 0.01, (PC_, 3))
        sw = ms[si] + r.normal(0, 0.01, (PS_, 3))
        fc.append((cw @ T[:3, :3].T + T[:3, 3]).astype(np.float32))
        fs.append((sw @ T[:3, :3].T + T[:3, 3]).astype(np.float32))
        guesses.append(pose + offs[b])
    gt = np.stack(gt)
    guesses = np.stack(guesses).astype(np.float32)

    def knn(q, pts):           # exact K-NN, ascending d2, ties by index
        d2 = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :K]
        return (np.take_along_axis(d2, idx, 1).astype(np.float32),
                pts[idx].astype(np.float32))

    ref_poses, krn_poses = [], []
    ref_ncorr, krn_ncorr = [], []
    for b in range(B):
        Rg = pose6_to_matrix_np(guesses[b])
        cw0 = fc[b] @ Rg[:3, :3].T + Rg[:3, 3]
        sw0 = fs[b] @ Rg[:3, :3].T + Rg[:3, 3]
        cd, cnn = knn(cw0, mc)
        sd, snn = knn(sw0, ms)

        feats1 = ScanFeatures(
            corner_xyz=jnp.asarray(fc[b]), corner_mask=jnp.ones(PC_, bool),
            surf_xyz=jnp.asarray(fs[b]), surf_mask=jnp.ones(PS_, bool))
        res = register_rounds_core(
            feats1,
            lambda w, cd=cd, cnn=cnn: (jnp.asarray(cd), jnp.asarray(cnn)),
            lambda w, sd=sd, snn=snn: (jnp.asarray(sd), jnp.asarray(snn)),
            jnp.asarray(guesses[b]),
            num_rounds=1, iters_per_round=ITERS)
        ref_poses.append(np.array(res.pose6))
        ref_ncorr.append(int(res.n_corr))

        # kernel-side plane layouts for the SAME candidates
        featc = jnp.concatenate([jnp.asarray(fc[b].T),
                                 jnp.ones((1, PC_), jnp.float32)])[None]
        featsp = jnp.concatenate([jnp.asarray(fs[b].T),
                                  jnp.ones((1, PS_), jnp.float32)])[None]
        candc = jnp.asarray(
            np.transpose(cnn.reshape(1, PC_, K, 3),
                         (0, 3, 2, 1)).reshape(1, 3 * K, PC_))
        cands = jnp.asarray(
            np.transpose(snn.reshape(1, PS_, K, 3),
                         (0, 3, 2, 1)).reshape(1, 3 * K, PS_))
        stat = jnp.zeros((1, STAT), jnp.float32)
        stat = stat.at[0, 0:6].set(jnp.asarray(guesses[b]))
        stat = stat.at[0, 9].set(1.0)
        matP = jnp.eye(6, dtype=jnp.float32).reshape(1, 36)
        stat, _ = gn_round_pallas(
            stat, matP, featc, featsp, candc, cands, K=K, iters=ITERS,
            jacobi_sweeps=2, interpret=True)
        krn_poses.append(np.array(stat[0, 0:6]))
        krn_ncorr.append(int(stat[0, 10]))

    ref_poses = np.stack(ref_poses)
    krn_poses = np.stack(krn_poses)
    # the comparison is only meaningful with a healthy correspondence set
    assert min(ref_ncorr) > 50 and min(krn_ncorr) > 50, (ref_ncorr,
                                                         krn_ncorr)
    np.testing.assert_allclose(krn_poses, ref_poses, atol=2e-3)
    # both must actually move toward ground truth, not just agree (one
    # short round with init-pose candidates won't fully converge)
    err = np.linalg.norm(krn_poses[:, 3:] - gt[:, 3:], axis=1)
    err0 = np.linalg.norm(guesses[:, 3:] - gt[:, 3:], axis=1)
    assert (err < 0.8 * err0).all(), (err, err0)
    for nr, nk in zip(ref_ncorr, krn_ncorr):
        assert abs(nk - nr) <= 0.05 * nr + 10, (ref_ncorr, krn_ncorr)


def test_spread_gate_kernel_parity():
    """min_plane_spread in the FUSED kernel: parity with
    register_rounds_core(min_plane_spread=...) on identical candidates, and
    the gate actually fires (a noisy collinear surf string in the map whose
    5-NN sets pass the reference's 0.2-m plane check but have middle
    singular value ~ noise << threshold).

    Strengthens the plane validity check of ref src/mapOptmization.h:1182-
    1190 on the flagship Pallas path (round-4 gap: XLA-only knob).
    """
    B_, PC_, PS_, K, ITERS = 1, 128, 128, 6, 5
    SPREAD = 0.05
    r = np.random.RandomState(11)

    # corner map: vertical lines (healthy corner correspondences)
    n_lines = 10
    xy = r.uniform(-4, 4, (n_lines, 2))
    li = r.randint(0, n_lines, 1024)
    mc = np.stack([xy[li, 0], xy[li, 1],
                   r.uniform(-1, 3, 1024)], -1).astype(np.float32)
    # surf map: ground plane + wall + a NOISY COLLINEAR STRING at z=0.5
    # (elevated so string queries' 5-NN are string points only)
    gx, gy = np.meshgrid(np.linspace(-5, 5, 30), np.linspace(-5, 5, 30))
    ground = np.stack([gx.ravel(), gy.ravel(),
                       np.full(gx.size, -1.5)], -1)
    wx, wz = np.meshgrid(np.linspace(-5, 5, 12), np.linspace(-1, 2, 8))
    wall = np.stack([wx.ravel(), np.full(wx.size, 5.0), wz.ravel()], -1)
    string = np.stack([np.linspace(-4, 4, 64), np.zeros(64),
                       np.full(64, 0.5)], -1)
    string += r.normal(0, 0.02, string.shape)   # nearly collinear
    ms = np.concatenate([ground, wall, string]).astype(np.float32)
    n_string0 = ground.shape[0] + wall.shape[0]

    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        pose6_to_matrix_np)

    gt = np.array([0.0, -0.01, 0.02, 0.1, -0.1, 0.0], np.float32)
    guess = gt + np.array([0.008, -0.004, 0.008, 0.05, -0.04, 0.02],
                          np.float32)
    T = np.linalg.inv(pose6_to_matrix_np(gt))
    ci = r.choice(mc.shape[0], PC_, replace=False)
    # surf features: mostly plane/wall, 16 forced string points
    si = np.concatenate([
        r.choice(n_string0, PS_ - 16, replace=False),
        n_string0 + r.choice(64, 16, replace=False)])
    cw = mc[ci] + r.normal(0, 0.01, (PC_, 3))
    sw = ms[si] + r.normal(0, 0.005, (PS_, 3))
    fcb = (cw @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    fsb = (sw @ T[:3, :3].T + T[:3, 3]).astype(np.float32)

    def knn(q, pts):
        d2 = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :K]
        return (np.take_along_axis(d2, idx, 1).astype(np.float32),
                pts[idx].astype(np.float32))

    Rg = pose6_to_matrix_np(guess)
    cd, cnn = knn(fcb @ Rg[:3, :3].T + Rg[:3, 3], mc)
    sd, snn = knn(fsb @ Rg[:3, :3].T + Rg[:3, 3], ms)

    feats1 = ScanFeatures(
        corner_xyz=jnp.asarray(fcb), corner_mask=jnp.ones(PC_, bool),
        surf_xyz=jnp.asarray(fsb), surf_mask=jnp.ones(PS_, bool))

    def core(spread):
        return register_rounds_core(
            feats1,
            lambda w: (jnp.asarray(cd), jnp.asarray(cnn)),
            lambda w: (jnp.asarray(sd), jnp.asarray(snn)),
            jnp.asarray(guess),
            num_rounds=1, iters_per_round=ITERS, min_plane_spread=spread)

    res_off = core(0.0)
    res_on = core(SPREAD)
    # the gate must actually remove the string correspondences
    assert int(res_on.n_corr) <= int(res_off.n_corr) - 10, (
        int(res_on.n_corr), int(res_off.n_corr))

    featc = jnp.concatenate([jnp.asarray(fcb.T),
                             jnp.ones((1, PC_), jnp.float32)])[None]
    featsp = jnp.concatenate([jnp.asarray(fsb.T),
                              jnp.ones((1, PS_), jnp.float32)])[None]
    candc = jnp.asarray(np.transpose(cnn.reshape(1, PC_, K, 3),
                                     (0, 3, 2, 1)).reshape(1, 3 * K, PC_))
    cands = jnp.asarray(np.transpose(snn.reshape(1, PS_, K, 3),
                                     (0, 3, 2, 1)).reshape(1, 3 * K, PS_))
    stat = jnp.zeros((1, STAT), jnp.float32)
    stat = stat.at[0, 0:6].set(jnp.asarray(guess))
    stat = stat.at[0, 9].set(1.0)
    matP = jnp.eye(6, dtype=jnp.float32).reshape(1, 36)
    stat, _ = gn_round_pallas(
        stat, matP, featc, featsp, candc, cands, K=K, iters=ITERS,
        jacobi_sweeps=2, min_plane_spread=SPREAD, interpret=True)

    np.testing.assert_allclose(np.array(stat[0, 0:6]),
                               np.array(res_on.pose6), atol=2e-3)
    assert abs(int(stat[0, 10]) - int(res_on.n_corr)) <= (
        0.05 * int(res_on.n_corr) + 10)


@pytest.mark.skipif(not _FULL, reason=(
    "full-size fused-path parity needs TPU (interpret compile >30 min "
    "at these shapes on a 1-CPU host); set FBPR_SLOW_PALLAS=1 to force"))
def test_fused_matches_blocks_tiny():
    feats, guesses, gt, fmap, center, half = _setup()
    cbt, sbt, origin, dims = build_map_block_tables(
        fmap, center, half, corner_cell_cap=16, surf_cell_cap=16)
    cpt, spt, origin2, dims2 = build_map_planar_tables(
        fmap, center, half, corner_cell_cap=16, surf_cell_cap=16)
    assert dims == dims2

    kw = dict(grid_dims=dims, corner_cell_cap=16, surf_cell_cap=16,
              num_rounds=2, iters_per_round=5, edge_min_valid=10,
              surf_min_valid=100)
    ref = batch_register_blocks(feats, cbt, sbt, origin, guesses, **kw)
    got = batch_register_fused(feats, cpt, spt, origin, guesses, **kw)

    assert np.array(got.valid).all()
    np.testing.assert_allclose(np.array(got.pose6), np.array(ref.pose6),
                               atol=2e-3)
    err = np.linalg.norm(np.array(got.pose6)[:, 3:] - gt[:, 3:], axis=1)
    assert err.max() < 0.03, (err, np.array(ref.pose6), gt)
    nc_ref = np.array(ref.n_corr)
    nc_got = np.array(got.n_corr)
    assert (np.abs(nc_got - nc_ref) <= 0.05 * nc_ref + 10).all(), (
        nc_ref, nc_got)
