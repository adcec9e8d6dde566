import numpy as np
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.ops.hashgrid import (
    build_block_table, build_grid, build_grid_packed, build_grid_sentinel,
    default_grid_spec, grid_knn, grid_knn_block, grid_knn_oct,
    grid_knn_oct_sentinel, grid_knn_packed, grid_overflow_fraction)
from feature_base_pointcloud_registration_tpu.ops.knn import knn5


def _setup(seed=0, n=8192):
    rng = np.random.RandomState(seed)
    pts = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    mask = np.ones(n, bool)
    mask[n - 500:] = False
    q = jnp.asarray((rng.uniform(-7, 7, (256, 3))).astype(np.float32))
    # dense queries near actual points so the 1 m gate fires
    qd = jnp.asarray((np.asarray(pts[:256])
                      + rng.normal(0, 0.25, (256, 3))).astype(np.float32))
    return pts, jnp.asarray(mask), jnp.concatenate([q, qd])


def test_grid_matches_brute_within_gate():
    pts, mask, q = _setup()
    dims = default_grid_spec((10.0, 10.0, 10.0), 1.0)
    origin = jnp.asarray([-12.0, -12.0, -12.0], jnp.float32)
    g = build_grid(pts, mask, origin, 1.0, dims=dims, cell_cap=16)
    d_b, _ = knn5(q, pts, mask, chunk=2048)
    d_g, nn = grid_knn(q, pts, g, k=5)
    gate = np.array(d_b)[:, 4] < 1.0
    assert gate.sum() > 50
    np.testing.assert_allclose(np.array(d_g)[gate], np.array(d_b)[gate],
                               atol=1e-3)
    # returned nn coordinates must reproduce the distances
    rec = np.sum((np.array(q)[:, None] - np.array(nn)) ** 2, -1)
    ok = np.array(d_g) < 1e30
    np.testing.assert_allclose(rec[ok], np.array(d_g)[ok], atol=1e-4)


def test_all_grid_variants_agree():
    pts, mask, q = _setup(seed=1)
    cell = 2.0
    dims = default_grid_spec((10.0, 10.0, 10.0), cell)
    origin = jnp.asarray([-12.0, -12.0, -12.0], jnp.float32)
    cap = 32

    packed = build_grid_packed(pts, mask, origin, cell, dims=dims,
                               cell_cap=cap)
    sent = build_grid_sentinel(pts, mask, origin, cell, dims=dims,
                               cell_cap=cap)
    block = build_block_table(sent, dims=dims, cell_cap=cap)

    d_o, _ = grid_knn_oct(q, packed, origin, cell, dims=dims, cell_cap=cap)
    d_s, _ = grid_knn_oct_sentinel(q, sent, origin, cell, dims=dims,
                                   cell_cap=cap)
    d_bk, _ = grid_knn_block(q, block, origin, cell, dims=dims, cell_cap=cap)
    d_o, d_s, d_bk = (np.array(x) for x in (d_o, d_s, d_bk))
    real = d_o < 1e30
    np.testing.assert_allclose(d_s[real], d_o[real], atol=1e-4)
    np.testing.assert_allclose(d_bk[real], d_o[real], atol=1e-4)
    # sentinel/block report the same validity pattern
    assert ((d_s > 1e30) == (d_o > 1e30)).all()
    assert ((d_bk > 1e30) == (d_o > 1e30)).all()


def test_octant_covers_gate_radius():
    """Any neighbor within cell_size/2 = 1 m must be found exactly."""
    pts, mask, q = _setup(seed=2)
    cell = 2.0
    dims = default_grid_spec((10.0, 10.0, 10.0), cell)
    origin = jnp.asarray([-12.0, -12.0, -12.0], jnp.float32)
    sent = build_grid_sentinel(pts, mask, origin, cell, dims=dims,
                               cell_cap=64)
    d_b, _ = knn5(q, pts, mask, chunk=2048)
    d_s, _ = grid_knn_oct_sentinel(q, sent, origin, cell, dims=dims,
                                   cell_cap=64)
    gate = np.array(d_b)[:, 4] < 1.0
    np.testing.assert_allclose(np.array(d_s)[gate], np.array(d_b)[gate],
                               atol=1e-3)


def test_overflow_diagnostic():
    rng = np.random.RandomState(3)
    # 200 points crammed in one cell
    pts = jnp.asarray(rng.uniform(0, 0.9, (200, 3)).astype(np.float32))
    mask = jnp.ones(200, bool)
    origin = jnp.zeros(3, jnp.float32)
    frac = grid_overflow_fraction(pts, mask, origin, 1.0, dims=(4, 4, 4),
                                  cell_cap=16)
    np.testing.assert_allclose(float(frac), (200 - 16) / 200, atol=1e-6)
