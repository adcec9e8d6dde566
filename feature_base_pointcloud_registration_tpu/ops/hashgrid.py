"""Spatial hash-grid neighbor index — the production KD-tree replacement.

A KD-tree answers "5 nearest within 1 m" (every accept gate in the reference
caps the 5th-NN at 1 m, ref: src/mapOptmization.h:1027,1154).  On TPU the
equivalent O(1) structure is a dense voxel grid over the local-map volume:

  build:  bucket map points into cells of `cell_size` >= the 1 m gate radius
          (sort by cell id + rank-within-cell scatter -> a [n_cells, cap]
          index table; one sort per local map, amortized over every scan and
          GN iteration registered against it),
  query:  gather the 27-neighborhood's candidate indices (covers every point
          within `cell_size` of the query), compute exact distances, take
          exact top-k among candidates.

Exactness: any true neighbor within cell_size of the query is in the 27
neighborhood, so results match brute force for all gated correspondences
unless a cell overflows `cell_cap` (overflow drops the *latest-sorted*
points; caps are sized for the voxel-downsampled map densities and validated
in tests).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax

from .knn import _extract_topk

_BIG = np.float32(3.0e38)  # numpy, NOT jnp: module import may happen inside a jit
# trace (lazy in-function imports); a jnp scalar created there is a leaked
# tracer captured as this global forever (the round-3..5 order-dependent
# INVALID_ARGUMENT executable-cache wart).  numpy scalars never trace.


def _topk_small(d2, k: int):
    """Smallest-k over the last axis.

    k <= 5 is the correspondence-facing 5-NN (every gate in the reference
    keys off the exact 5-NN set, ref: src/mapOptmization.h:1027,1154) and
    must be EXACT — an occasionally-missed true neighbor would silently
    change the d2[4] < 1.0 gate.  Larger k is candidate *prefetch* only
    (the per-iteration 5-NN within those candidates re-ranks exactly), so
    approx_min_k is safe there and lowers to a fused single-pass
    PartialReduce on TPU (6x faster than k argmin passes at k=16)."""
    if k <= 5:
        return _extract_topk(d2, k)
    vals, pos = lax.approx_min_k(d2, k, recall_target=0.95,
                                 aggregate_to_topk=True)
    return vals, pos.astype(jnp.int32)


class GridIndex(NamedTuple):
    table: jnp.ndarray      # i32 [n_cells, cell_cap] point indices (M = pad)
    origin: jnp.ndarray     # f32 [3]
    cell_size: jnp.ndarray  # f32 []
    dims: tuple             # static (Gx, Gy, Gz)


def build_grid_table_core(pts, mask, origin, cell_size, *, dims, cell_cap):
    """Bucket masked points into the dense cell table; returns the [n_cells,
    cell_cap] int32 index table only (wrap with GridIndex at the call site —
    keeping the static `dims` tuple out of traced pytrees).  Not jitted:
    trace inside an outer jit, or use build_grid_table."""
    M = pts.shape[0]
    Gx, Gy, Gz = dims
    n_cells = Gx * Gy * Gz

    ijk = jnp.floor((pts - origin) / cell_size).astype(jnp.int32)
    in_grid = (mask
               & jnp.all(ijk >= 0, axis=-1)
               & (ijk[:, 0] < Gx) & (ijk[:, 1] < Gy) & (ijk[:, 2] < Gz))
    cell = jnp.where(in_grid,
                     (ijk[:, 0] * Gy + ijk[:, 1]) * Gz + ijk[:, 2],
                     n_cells)  # out-of-grid -> dropped

    order = jnp.argsort(cell)          # sorted by cell, invalid last
    cell_s = cell[order]
    # rank within cell: position minus the first occurrence of this cell id
    first = jnp.searchsorted(cell_s, cell_s, side="left")
    rank = jnp.arange(M, dtype=jnp.int32) - first.astype(jnp.int32)

    slot = cell_s * cell_cap + jnp.minimum(rank, cell_cap - 1)
    keep = (cell_s < n_cells) & (rank < cell_cap)
    slot = jnp.where(keep, slot, n_cells * cell_cap)

    table = jnp.full((n_cells * cell_cap + 1,), M, jnp.int32)
    table = table.at[slot].set(jnp.where(keep, order.astype(jnp.int32), M))
    return table[:-1].reshape(n_cells, cell_cap)


@partial(jax.jit, static_argnames=("dims", "cell_cap"))
def build_grid_table(pts, mask, origin, cell_size, *, dims, cell_cap):
    """Jitted top-level wrapper around build_grid_table_core."""
    return build_grid_table_core(pts, mask, origin, cell_size, dims=dims,
                                 cell_cap=cell_cap)


def build_grid(pts, mask, origin, cell_size, *, dims, cell_cap) -> GridIndex:
    """Convenience wrapper returning a GridIndex."""
    table = build_grid_table(pts, mask, origin, cell_size, dims=dims,
                             cell_cap=cell_cap)
    return GridIndex(table=table, origin=jnp.asarray(origin, jnp.float32),
                     cell_size=jnp.asarray(cell_size, jnp.float32), dims=dims)


def grid_knn(query, pts, grid: GridIndex, k: int = 5):
    """k-NN among the 27-cell candidates.  Returns (d2 [Q,k], nn [Q,k,3]).

    Exact for all neighbors within `cell_size` of the query (the reference's
    gates reject anything farther anyway)."""
    Q = query.shape[0]
    M = pts.shape[0]
    Gx, Gy, Gz = grid.dims
    cap = grid.table.shape[1]

    ijk = jnp.floor((query - grid.origin) / grid.cell_size).astype(jnp.int32)

    offs = jnp.asarray(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         for dz in (-1, 0, 1)], jnp.int32)  # [27,3]
    n_ijk = ijk[:, None, :] + offs[None, :, :]           # [Q,27,3]
    ok = (jnp.all(n_ijk >= 0, axis=-1)
          & (n_ijk[..., 0] < Gx) & (n_ijk[..., 1] < Gy) & (n_ijk[..., 2] < Gz))
    n_cell = (n_ijk[..., 0] * Gy + n_ijk[..., 1]) * Gz + n_ijk[..., 2]
    n_cell = jnp.where(ok, n_cell, 0)

    cand_idx = grid.table[n_cell].reshape(Q, 27 * cap)    # [Q, 27*cap]
    cand_idx = jnp.where(
        jnp.repeat(ok, cap, axis=1).reshape(Q, 27 * cap), cand_idx, M)
    valid = cand_idx < M
    safe = jnp.minimum(cand_idx, M - 1)

    # Gather per coordinate: a [Q, 27*cap, 3] gather gets a (8,128)-tiled
    # layout whose 3-wide last dim pads 42x in HBM; three [Q, 27*cap] gathers
    # tile perfectly.
    cx = pts[:, 0][safe]
    cy = pts[:, 1][safe]
    cz = pts[:, 2][safe]
    dx = query[:, 0:1] - cx
    dy = query[:, 1:2] - cy
    dz = query[:, 2:3] - cz
    d2 = dx * dx + dy * dy + dz * dz
    d2 = jnp.where(valid, d2, _BIG)

    vals, pos = _topk_small(d2, k)
    nn = jnp.stack([
        jnp.take_along_axis(cx, pos, axis=1),
        jnp.take_along_axis(cy, pos, axis=1),
        jnp.take_along_axis(cz, pos, axis=1),
    ], axis=-1)                                           # [Q, k, 3] (small)
    return vals, nn


def make_grid_knn(pts, grid: GridIndex, k: int = 5):
    """knn closure for register_core backed by the grid index."""
    return lambda q: grid_knn(q, pts, grid, k=k)


def default_grid_spec(half_extent, cell_size: float = 1.0, margin: float = 2.0):
    """Static grid dims covering a local-map crop box of +-half_extent."""
    import math

    dims = tuple(
        int(math.ceil(2.0 * (h + margin) / cell_size)) for h in half_extent)
    return dims


def grid_origin(center, half_extent, margin: float = 2.0):
    return (jnp.asarray(center, jnp.float32)
            - jnp.asarray(half_extent, jnp.float32) - margin)


# ---------------------------------------------------------------------------
# Packed-coordinate grid: the TPU-fast variant.
#
# Gathering candidate *indices* and then their coordinates costs ~14M random
# element gathers per query set — XLA lowers those to scalar loads on TPU
# (measured 83 ms for 8192 queries).  Packing each cell's point coordinates
# into its table row turns the whole lookup into [Q, 27] row gathers of
# contiguous 4*cap floats (planar x/y/z/valid layout), which XLA emits as
# efficient sliced DMAs.
# ---------------------------------------------------------------------------


def build_grid_packed_core(pts, mask, origin, cell_size, *, dims, cell_cap):
    """Packed cell table [n_cells, 4*cell_cap]: planar (x*cap|y*cap|z*cap|valid*cap)."""
    M = pts.shape[0]
    Gx, Gy, Gz = dims
    n_cells = Gx * Gy * Gz

    ijk = jnp.floor((pts - origin) / cell_size).astype(jnp.int32)
    in_grid = (mask
               & jnp.all(ijk >= 0, axis=-1)
               & (ijk[:, 0] < Gx) & (ijk[:, 1] < Gy) & (ijk[:, 2] < Gz))
    cell = jnp.where(in_grid,
                     (ijk[:, 0] * Gy + ijk[:, 1]) * Gz + ijk[:, 2],
                     n_cells)

    order = jnp.argsort(cell)
    cell_s = cell[order]
    first = jnp.searchsorted(cell_s, cell_s, side="left")
    rank = jnp.arange(M, dtype=jnp.int32) - first.astype(jnp.int32)
    keep = (cell_s < n_cells) & (rank < cell_cap)
    rank_c = jnp.minimum(rank, cell_cap - 1)

    p_sorted = pts[order]
    base = cell_s * (4 * cell_cap)
    flat = jnp.zeros((n_cells * 4 * cell_cap + 1,), jnp.float32)
    drop = n_cells * 4 * cell_cap
    for axis in range(3):
        slot = jnp.where(keep, base + axis * cell_cap + rank_c, drop)
        flat = flat.at[slot].set(jnp.where(keep, p_sorted[:, axis], 0.0))
    slot = jnp.where(keep, base + 3 * cell_cap + rank_c, drop)
    flat = flat.at[slot].set(jnp.where(keep, 1.0, 0.0))
    return flat[:-1].reshape(n_cells, 4 * cell_cap)


@partial(jax.jit, static_argnames=("dims", "cell_cap"))
def build_grid_packed(pts, mask, origin, cell_size, *, dims, cell_cap):
    return build_grid_packed_core(pts, mask, origin, cell_size, dims=dims,
                                  cell_cap=cell_cap)


def grid_knn_packed(query, packed, origin, cell_size, *, dims, cell_cap,
                    k: int = 5):
    """k-NN among 27-cell candidates from the packed table.

    Returns (d2 [Q,k], nn [Q,k,3]) — same contract as grid_knn, ~50x less
    gather cost (contiguous row slices instead of element gathers)."""
    Q = query.shape[0]
    Gx, Gy, Gz = dims
    cap = cell_cap

    ijk = jnp.floor((query - origin) / cell_size).astype(jnp.int32)
    offs = jnp.asarray(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         for dz in (-1, 0, 1)], jnp.int32)
    n_ijk = ijk[:, None, :] + offs[None, :, :]
    ok = (jnp.all(n_ijk >= 0, axis=-1)
          & (n_ijk[..., 0] < Gx) & (n_ijk[..., 1] < Gy) & (n_ijk[..., 2] < Gz))
    n_cell = (n_ijk[..., 0] * Gy + n_ijk[..., 1]) * Gz + n_ijk[..., 2]
    n_cell = jnp.where(ok, n_cell, 0)

    rows = packed[n_cell]                       # [Q, 27, 4*cap] row gathers
    rows = rows.reshape(Q, 27, 4, cap)
    cx = rows[:, :, 0, :].reshape(Q, 27 * cap)
    cy = rows[:, :, 1, :].reshape(Q, 27 * cap)
    cz = rows[:, :, 2, :].reshape(Q, 27 * cap)
    valid = rows[:, :, 3, :].reshape(Q, 27 * cap) > 0.5
    valid = valid & jnp.repeat(ok, cap, axis=1)

    dx = query[:, 0:1] - cx
    dy = query[:, 1:2] - cy
    dz = query[:, 2:3] - cz
    d2 = dx * dx + dy * dy + dz * dz
    d2 = jnp.where(valid, d2, _BIG)

    vals, pos = _topk_small(d2, k)
    nn = jnp.stack([
        jnp.take_along_axis(cx, pos, axis=1),
        jnp.take_along_axis(cy, pos, axis=1),
        jnp.take_along_axis(cz, pos, axis=1),
    ], axis=-1)
    return vals, nn


def make_packed_grid_knn(packed, origin, cell_size, *, dims, cell_cap,
                         k: int = 5):
    return lambda q: grid_knn_packed(q, packed, origin, cell_size, dims=dims,
                                     cell_cap=cell_cap, k=k)


# ---------------------------------------------------------------------------
# Octant lookup: 2x2x2 cells of size >= 2 * gate radius.
#
# With cell_size = 2 m, picking the 8-cell block whose corner is chosen by
# the query's octant within its cell guarantees >= 1 m of margin on every
# axis — exactly the reference's correspondence gate — while touching 8
# contiguous rows instead of 27 and ~256 candidates instead of 432.
# ---------------------------------------------------------------------------


def grid_knn_oct(query, packed, origin, cell_size, *, dims, cell_cap,
                 k: int = 5):
    """k-NN among the 2x2x2-octant candidates (cell_size >= 2 * gate radius).

    Same contract as grid_knn_packed; exact for neighbors within
    cell_size/2 of the query."""
    Q = query.shape[0]
    Gx, Gy, Gz = dims
    cap = cell_cap

    rel = (query - origin) / cell_size
    ijk = jnp.floor(rel).astype(jnp.int32)
    frac = rel - ijk
    base = ijk - (frac < 0.5).astype(jnp.int32)   # block corner cell

    offs = jnp.asarray(
        [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        jnp.int32)                                 # [8,3]
    n_ijk = base[:, None, :] + offs[None, :, :]    # [Q,8,3]
    ok = (jnp.all(n_ijk >= 0, axis=-1)
          & (n_ijk[..., 0] < Gx) & (n_ijk[..., 1] < Gy) & (n_ijk[..., 2] < Gz))
    n_cell = (n_ijk[..., 0] * Gy + n_ijk[..., 1]) * Gz + n_ijk[..., 2]
    n_cell = jnp.where(ok, n_cell, 0)

    rows = packed[n_cell]                          # [Q, 8, 4*cap]
    rows = rows.reshape(Q, 8, 4, cap)
    cx = rows[:, :, 0, :].reshape(Q, 8 * cap)
    cy = rows[:, :, 1, :].reshape(Q, 8 * cap)
    cz = rows[:, :, 2, :].reshape(Q, 8 * cap)
    valid = rows[:, :, 3, :].reshape(Q, 8 * cap) > 0.5
    valid = valid & jnp.repeat(ok, cap, axis=1)

    dx = query[:, 0:1] - cx
    dy = query[:, 1:2] - cy
    dz = query[:, 2:3] - cz
    d2 = dx * dx + dy * dy + dz * dz
    d2 = jnp.where(valid, d2, _BIG)

    vals, pos = _topk_small(d2, k)
    nn = jnp.stack([
        jnp.take_along_axis(cx, pos, axis=1),
        jnp.take_along_axis(cy, pos, axis=1),
        jnp.take_along_axis(cz, pos, axis=1),
    ], axis=-1)
    return vals, nn


def make_oct_grid_knn(packed, origin, cell_size, *, dims, cell_cap,
                      k: int = 5):
    return lambda q: grid_knn_oct(q, packed, origin, cell_size, dims=dims,
                                  cell_cap=cell_cap, k=k)


def grid_overflow_fraction(pts, mask, origin, cell_size, *, dims, cell_cap):
    """Diagnostic: fraction of in-grid points dropped by cell_cap overflow."""
    M = pts.shape[0]
    Gx, Gy, Gz = dims
    n_cells = Gx * Gy * Gz
    ijk = jnp.floor((pts - origin) / cell_size).astype(jnp.int32)
    in_grid = (mask & jnp.all(ijk >= 0, axis=-1)
               & (ijk[:, 0] < Gx) & (ijk[:, 1] < Gy) & (ijk[:, 2] < Gz))
    cell = jnp.where(in_grid,
                     (ijk[:, 0] * Gy + ijk[:, 1]) * Gz + ijk[:, 2], n_cells)
    counts = jnp.zeros((n_cells + 1,), jnp.int32).at[cell].add(1)[:-1]
    dropped = jnp.sum(jnp.maximum(counts - cell_cap, 0))
    total = jnp.maximum(jnp.sum(in_grid), 1)
    return dropped / total


# ---------------------------------------------------------------------------
# v2 packed layout: 3 coordinate planes only, far-sentinel padding.
#
# Invalid slots store FAR (1e9 m): their distances dominate every real
# candidate, so no validity plane or mask is needed — 25% less gather
# traffic and fewer VPU ops.  Out-of-grid neighbors index a dedicated
# all-sentinel row (n_cells).
# ---------------------------------------------------------------------------

_FAR = np.float32(1.0e9)  # numpy, not jnp: see _BIG


def build_grid_sentinel_core(pts, mask, origin, cell_size, *, dims, cell_cap):
    """Packed [n_cells+1, 3*cell_cap] planar (x|y|z) table, FAR-padded."""
    M = pts.shape[0]
    Gx, Gy, Gz = dims
    n_cells = Gx * Gy * Gz

    ijk = jnp.floor((pts - origin) / cell_size).astype(jnp.int32)
    in_grid = (mask
               & jnp.all(ijk >= 0, axis=-1)
               & (ijk[:, 0] < Gx) & (ijk[:, 1] < Gy) & (ijk[:, 2] < Gz))
    cell = jnp.where(in_grid,
                     (ijk[:, 0] * Gy + ijk[:, 1]) * Gz + ijk[:, 2],
                     n_cells)

    order = jnp.argsort(cell)
    cell_s = cell[order]
    first = jnp.searchsorted(cell_s, cell_s, side="left")
    rank = jnp.arange(M, dtype=jnp.int32) - first.astype(jnp.int32)
    keep = (cell_s < n_cells) & (rank < cell_cap)
    rank_c = jnp.minimum(rank, cell_cap - 1)

    p_sorted = pts[order]
    base = cell_s * (3 * cell_cap)
    total = (n_cells + 1) * 3 * cell_cap
    flat = jnp.full((total + 1,), _FAR, jnp.float32)
    drop = total
    for axis in range(3):
        slot = jnp.where(keep, base + axis * cell_cap + rank_c, drop)
        flat = flat.at[slot].set(jnp.where(keep, p_sorted[:, axis], _FAR))
    return flat[:-1].reshape(n_cells + 1, 3 * cell_cap)


@partial(jax.jit, static_argnames=("dims", "cell_cap"))
def build_grid_sentinel(pts, mask, origin, cell_size, *, dims, cell_cap):
    return build_grid_sentinel_core(pts, mask, origin, cell_size, dims=dims,
                                    cell_cap=cell_cap)


def grid_knn_oct_sentinel(query, packed, origin, cell_size, *, dims,
                          cell_cap, k: int = 5):
    """Octant k-NN over the sentinel-padded table (fastest lookup)."""
    Q = query.shape[0]
    Gx, Gy, Gz = dims
    cap = cell_cap
    n_cells = Gx * Gy * Gz

    rel = (query - origin) / cell_size
    ijk = jnp.floor(rel).astype(jnp.int32)
    frac = rel - ijk
    base = ijk - (frac < 0.5).astype(jnp.int32)

    offs = jnp.asarray(
        [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        jnp.int32)
    n_ijk = base[:, None, :] + offs[None, :, :]
    ok = (jnp.all(n_ijk >= 0, axis=-1)
          & (n_ijk[..., 0] < Gx) & (n_ijk[..., 1] < Gy) & (n_ijk[..., 2] < Gz))
    n_cell = (n_ijk[..., 0] * Gy + n_ijk[..., 1]) * Gz + n_ijk[..., 2]
    n_cell = jnp.where(ok, n_cell, n_cells)   # sentinel row

    rows = packed[n_cell]                      # [Q, 8, 3*cap]
    rows = rows.reshape(Q, 8, 3, cap)
    cx = rows[:, :, 0, :].reshape(Q, 8 * cap)
    cy = rows[:, :, 1, :].reshape(Q, 8 * cap)
    cz = rows[:, :, 2, :].reshape(Q, 8 * cap)

    dx = query[:, 0:1] - cx
    dy = query[:, 1:2] - cy
    dz = query[:, 2:3] - cz
    d2 = dx * dx + dy * dy + dz * dz          # sentinels -> ~1e18

    vals, pos = _topk_small(d2, k)
    nn = jnp.stack([
        jnp.take_along_axis(cx, pos, axis=1),
        jnp.take_along_axis(cy, pos, axis=1),
        jnp.take_along_axis(cz, pos, axis=1),
    ], axis=-1)
    # report sentinel hits as BIG so downstream validity gates (d2 < 1e37
    # for candidate masks, < 1.0 for correspondence) behave unchanged
    vals = jnp.where(vals > 1e17, _BIG, vals)
    return vals, nn


def make_oct_sentinel_knn(packed, origin, cell_size, *, dims, cell_cap,
                          k: int = 5):
    return lambda q: grid_knn_oct_sentinel(q, packed, origin, cell_size,
                                           dims=dims, cell_cap=cell_cap, k=k)


# ---------------------------------------------------------------------------
# Block table: one row per block corner holding the full 2x2x2 candidate set.
#
# The octant fetch costs 8 medium row-gathers per query; duplicating each
# cell's data into its 8 enclosing blocks (one-time, amortized over the map
# lifetime) turns the fetch into ONE contiguous multi-KB row gather per
# query — the layout XLA's TPU gather handles at near-bandwidth.
# Memory: 8x the sentinel table (tens of MB for local-map sizes).
# ---------------------------------------------------------------------------


def build_block_table_core(sentinel_table, *, dims, cell_cap):
    """[n_cells+1, 3*cap] sentinel table -> [n_cells+1, 8*3*cap] block rows.

    Row b = concat of rows {b + (dx,dy,dz)} for dx,dy,dz in {0,1}; block
    corners whose neighbors fall outside the grid take the sentinel row.
    The extra row (index n_cells) is all-sentinel for out-of-grid queries.
    """
    Gx, Gy, Gz = dims
    n_cells = Gx * Gy * Gz
    row_w = sentinel_table.shape[1]          # 3*cap

    cid = jnp.arange(n_cells, dtype=jnp.int32)
    cx = cid // (Gy * Gz)
    cy = (cid // Gz) % Gy
    cz = cid % Gz

    rows = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                nx, ny, nz = cx + dx, cy + dy, cz + dz
                ok = (nx < Gx) & (ny < Gy) & (nz < Gz)
                nc = jnp.where(ok, (nx * Gy + ny) * Gz + nz, n_cells)
                rows.append(sentinel_table[nc])          # [n_cells, row_w]
    block = jnp.concatenate(rows, axis=1)                # [n_cells, 8*row_w]
    sent_row = jnp.full((1, 8 * row_w), _FAR, sentinel_table.dtype)
    return jnp.concatenate([block, sent_row], axis=0)


@partial(jax.jit, static_argnames=("dims", "cell_cap"))
def build_block_table(sentinel_table, *, dims, cell_cap):
    return build_block_table_core(sentinel_table, dims=dims,
                                  cell_cap=cell_cap)


def grid_knn_block(query, block_table, origin, cell_size, *, dims, cell_cap,
                   k: int = 5):
    """Octant k-NN via one block-row gather per query (fastest fetch)."""
    Q = query.shape[0]
    Gx, Gy, Gz = dims
    cap = cell_cap
    n_cells = Gx * Gy * Gz

    rel = (query - origin) / cell_size
    ijk = jnp.floor(rel).astype(jnp.int32)
    frac = rel - ijk
    base = ijk - (frac < 0.5).astype(jnp.int32)
    ok = (jnp.all(base >= 0, axis=-1)
          & (base[:, 0] < Gx) & (base[:, 1] < Gy) & (base[:, 2] < Gz))
    bcell = jnp.where(ok,
                      (base[:, 0] * Gy + base[:, 1]) * Gz + base[:, 2],
                      n_cells)

    rows = block_table[bcell]                       # [Q, 8*3*cap] one gather
    rows = rows.reshape(Q, 8, 3, cap)
    cx = rows[:, :, 0, :].reshape(Q, 8 * cap)
    cy = rows[:, :, 1, :].reshape(Q, 8 * cap)
    cz = rows[:, :, 2, :].reshape(Q, 8 * cap)

    dx = query[:, 0:1] - cx
    dy = query[:, 1:2] - cy
    dz = query[:, 2:3] - cz
    d2 = dx * dx + dy * dy + dz * dz

    vals, pos = _topk_small(d2, k)
    # Extract the k selected coordinates with a one-hot contraction over the
    # window instead of take_along_axis: XLA lowers [Q,k] element gathers on
    # the [Q, 8*cap] planes to scalar loads (~3x the cost of the whole rest
    # of the fetch); the one-hot einsum rides the MXU at full tile width.
    W = 8 * cap
    oh = (pos[:, :, None] == jnp.arange(W, dtype=pos.dtype)).astype(cx.dtype)
    coords = jnp.stack([cx, cy, cz], axis=-1)            # [Q, W, 3]
    nn = jnp.einsum("qkw,qwc->qkc", oh, coords)          # [Q, k, 3]
    vals = jnp.where(vals > 1e17, _BIG, vals)
    return vals, nn


def make_block_grid_knn(block_table, origin, cell_size, *, dims, cell_cap,
                        k: int = 5):
    return lambda q: grid_knn_block(q, block_table, origin, cell_size,
                                    dims=dims, cell_cap=cell_cap, k=k)
