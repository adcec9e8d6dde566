"""Fused Pallas fetch kernel: parity with brute force + the XLA block path.

On CPU the kernel runs in interpret mode (same program, no Mosaic), so these
tests validate the kernel logic everywhere; the TPU compile path is exercised
by bench.py and the driver's entry() check.
"""

import numpy as np
import jax
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.ops import hashgrid as hg
import pytest

from feature_base_pointcloud_registration_tpu.ops.pallas_fetch import (
    block_cell_of, build_block_table_planar, compact_row_space,
    fused_block_fetch, make_pallas_block_knn)

CELL = 2.0
DIMS = (8, 8, 4)
CAP = 16
ORIGIN = jnp.asarray([-8.0, -8.0, -4.0], jnp.float32)


def _world(seed=0, m=4096):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-7, 7, (m, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 3, m)
    return pts, np.ones(m, bool)


@pytest.mark.parametrize("resident", [False, True])
def test_fused_fetch_matches_bruteforce(resident):
    pts, mask = _world()
    st = hg.build_grid_sentinel(jnp.asarray(pts), jnp.asarray(mask), ORIGIN,
                                CELL, dims=DIMS, cell_cap=CAP)
    tab = build_block_table_planar(st, dims=DIMS)
    if resident:
        tab = compact_row_space(tab)

    rng = np.random.RandomState(1)
    q = rng.uniform(-6, 6, (512, 3)).astype(np.float32)
    q[:, 2] = rng.uniform(-2.5, 2.5, 512)
    knn = make_pallas_block_knn(tab, ORIGIN, CELL, dims=DIMS, cell_cap=CAP,
                                k=8)
    d2, nn = knn(jnp.asarray(q))
    d2, nn = np.asarray(d2), np.asarray(nn)

    # brute force within each query's 2x2x2 block window
    st_np = np.asarray(st).reshape(-1, 3, CAP)
    bc = np.asarray(block_cell_of(jnp.asarray(q), ORIGIN, CELL, dims=DIMS))
    Gx, Gy, Gz = DIMS
    for i in range(0, 512, 37):
        b = bc[i]
        cands = []
        if b < Gx * Gy * Gz:
            bx, by, bz = b // (Gy * Gz), (b // Gz) % Gy, b % Gz
            for dx in (0, 1):
                for dy in (0, 1):
                    for dz in (0, 1):
                        nx, ny, nz = bx + dx, by + dy, bz + dz
                        if nx < Gx and ny < Gy and nz < Gz:
                            row = st_np[(nx * Gy + ny) * Gz + nz]
                            cands.append(row.T)        # [CAP, 3]
        cand = np.concatenate(cands) if cands else np.zeros((0, 3))
        cand = cand[np.abs(cand[:, 0]) < 1e8]          # drop FAR sentinels
        dd = ((cand - q[i]) ** 2).sum(-1)
        k_real = min(8, len(dd))
        want = np.sort(dd)[:k_real]
        got = d2[i][d2[i] < 1e17][:k_real]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # nn coords consistent with reported d2
        back = ((nn[i] - q[i]) ** 2).sum(-1)
        real = d2[i] < 1e17
        np.testing.assert_allclose(back[real], d2[i][real], rtol=1e-4,
                                   atol=1e-5)


@pytest.mark.parametrize("resident", [False, True])
def test_fused_fetch_out_of_grid_and_padding(resident):
    pts, mask = _world()
    st = hg.build_grid_sentinel(jnp.asarray(pts), jnp.asarray(mask), ORIGIN,
                                CELL, dims=DIMS, cell_cap=CAP)
    tab = build_block_table_planar(st, dims=DIMS)
    if resident:
        tab = compact_row_space(tab)
    q = np.full((512, 3), 500.0, np.float32)           # far out of grid
    knn = make_pallas_block_knn(tab, ORIGIN, CELL, dims=DIMS, cell_cap=CAP,
                                k=8)
    d2, nn = knn(jnp.asarray(q))
    assert bool(jnp.all(d2 > 1e17)), "out-of-grid must yield no candidates"
