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

if jax.default_backend() != "tpu" and not os.environ.get("FBPR_SLOW_PALLAS"):
    pytest.skip(
        "Pallas GN kernel interpret-mode compile takes >30 min on this "
        "1-CPU box even at tiny shapes; parity runs on TPU (bench.py "
        "fused-vs-blocks agreement 2.4e-5).  Set FBPR_SLOW_PALLAS=1 to "
        "force.", allow_module_level=True)

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
