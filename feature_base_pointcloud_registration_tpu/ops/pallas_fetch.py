"""Fused candidate fetch: Pallas TPU kernel for the hash-grid hot path.

The XLA block fetch (ops.hashgrid.grid_knn_block) materializes the gathered
[Q, 8*cap] candidate window to HBM and re-reads it for d2 + top-k (measured
~50 ms/round for the surf table at B=32 on v5e).  This kernel fuses the whole
fetch: each query's block row is DMA'd HBM->VMEM (double-buffered waves of
16 rows), d2 and an exact top-K run on the VPU while the next wave's rows
are in flight, and only the [Q, K] winners ever touch HBM again.

Replaces the reference's per-query FLANN kdtree->nearestKSearch(5) calls
(ref: src/mapOptmization.h:1020,1143) for the batched TPU path.

Table layout: PLANE-MAJOR block rows reshaped to [n_cells+1, S, 128] with
S = 3*8*cap/128, i.e. row = [ x(8 cells x cap) | y | z ] split into 128-lane
tiles — single-row slices of a 3-D memref keep the (8,128) tiling legal, and
each coordinate plane is a contiguous run of S/3 tiles (no sublane shuffles).
Invalid slots hold FAR=1e9 m, so no validity plane is needed; downstream
gates treat d2 > 1e17 as no-candidate.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.float32(3.0e38)  # numpy, NOT jnp: module import may happen inside a jit
# trace (lazy in-function imports); a jnp scalar created there is a leaked
# tracer captured as this global forever (the round-3..5 order-dependent
# INVALID_ARGUMENT executable-cache wart).  numpy scalars never trace.
_FAR = 1.0e9

_WAVE = int(os.environ.get('FBPR_FETCH_WAVE', '128'))  # rows per DMA wave (double-buffered)
_TILE = int(os.environ.get('FBPR_FETCH_TILE', '512'))  # queries per program
# dedup consecutive same-row DMAs (queries presorted by row) + log-step
# forward fill in compute; 0 (default) = DMA every row unconditionally.
# Measured SLOWER when on: the 3-array log-step fill burns more VPU passes
# than the skipped DMA issues cost (1.32 vs 1.45 ms/scan at B=128).
_DEDUP = os.environ.get('FBPR_FETCH_DEDUP', '0') == '1'


def build_block_table_planar(sentinel_table, *, dims, compact: bool = True):
    """[n_cells+1, 3*cap] sentinel table -> [n_cells+1, S, 128] plane-major
    block rows (cap must be a multiple of 16).

    Row b covers cells b+(0..1)^3; out-of-grid neighbors take the sentinel
    row (index n_cells).  With compact=True (default) each row's VALID
    points are packed to the front and the row width shrinks from 8*cap to
    Wb = max-over-blocks valid count rounded up to 128: the fetch kernel's
    d2/top-K cost scales with the row width, and per-cell caps sized for
    the densest single cell leave most of an 8-cell row as FAR padding
    (measured 384 -> 256 surf, 256 -> 128 corner on the bench map).  The
    candidate SET per query is unchanged — only slot order within the row.
    S = 3*Wb/128; pass W = Wb (= table.shape[1]//3*128) to the kernel.
    """
    Gx, Gy, Gz = dims
    n_cells = Gx * Gy * Gz
    cap = sentinel_table.shape[1] // 3
    assert (24 * cap) % 128 == 0, f"cell_cap {cap} must be a multiple of 16"

    cid = jnp.arange(n_cells, dtype=jnp.int32)
    cx = cid // (Gy * Gz)
    cy = (cid // Gz) % Gy
    cz = cid % Gz

    neighbor_rows = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                nx, ny, nz = cx + dx, cy + dy, cz + dz
                ok = (nx < Gx) & (ny < Gy) & (nz < Gz)
                nc = jnp.where(ok, (nx * Gy + ny) * Gz + nz, n_cells)
                neighbor_rows.append(sentinel_table[nc])   # [n_cells, 3*cap]
    if compact:
        X = jnp.concatenate([r[:, 0:cap] for r in neighbor_rows], axis=1)
        Y = jnp.concatenate([r[:, cap:2 * cap] for r in neighbor_rows],
                            axis=1)
        Z = jnp.concatenate([r[:, 2 * cap:3 * cap] for r in neighbor_rows],
                            axis=1)
        invalid = (X >= 1e8).astype(jnp.int32)
        _, X, Y, Z = jax.lax.sort((invalid, X, Y, Z), dimension=1,
                                  num_keys=1)
        max_valid = int(jnp.max(jnp.sum(1 - invalid, axis=1)))
        Wb = max(128, -(-max_valid // 128) * 128)
        if Wb < 8 * cap:
            X, Y, Z = X[:, :Wb], Y[:, :Wb], Z[:, :Wb]
        else:
            Wb = 8 * cap
        block = jnp.concatenate([X, Y, Z], axis=1)         # [n_cells, 3*Wb]
        sent = jnp.full((1, 3 * Wb), _FAR, sentinel_table.dtype)
        table = jnp.concatenate([block, sent], axis=0)
        return table.reshape(table.shape[0], (3 * Wb) // 128, 128)
    planes = []
    for axis in range(3):                                  # plane-major
        for r in neighbor_rows:
            planes.append(r[:, axis * cap:(axis + 1) * cap])
    block = jnp.concatenate(planes, axis=1)                # [n_cells, 24*cap]
    sent = jnp.full((1, 24 * cap), _FAR, sentinel_table.dtype)
    table = jnp.concatenate([block, sent], axis=0)
    return table.reshape(table.shape[0], (24 * cap) // 128, 128)


def _fetch_kernel(bcell_ref, qx_ref, qy_ref, qz_ref, bcv_ref, table_ref,
                  d2_ref, nnx_ref, nny_ref, nnz_ref,
                  buf, sems, *, S3: int, K: int, planes_out: bool = False):
    """One program: _TILE queries; waves of _WAVE row-DMAs, fused compute.

    buf: [2, _WAVE, 3*S3, 128] VMEM; table rows are [3*S3, 128] with the x/y/z
    planes at tile ranges [0:S3], [S3:2*S3], [2*S3:3*S3].

    Sentinel rows (invalid/padded/out-of-grid queries — callers map them to
    the last table row) issue NO DMA: their d2 is forced to _BIG in-kernel.
    At typical feature-padding ratios this removes most of the per-query DMA
    traffic, which is what bounds the fetch (row 3 finding).
    """
    n_waves = _TILE // _WAVE
    W = S3 * 128
    sentinel = table_ref.shape[0] - 1

    def dma(slot, wave, r):
        row = bcell_ref[wave * _WAVE + r, 0]
        # duplicate-row dedup: with queries PRE-SORTED by block row (see
        # batch_register_fused's per-lane presort) consecutive slots mostly
        # share a row; only the first slot of each run issues a DMA, the
        # rest forward-fill from it in the compute phase.  Slot 0 of every
        # wave always counts as fresh so fills never cross a wave.
        if r == 0 or not _DEDUP:
            pred = row != sentinel
        else:
            prev = bcell_ref[wave * _WAVE + r - 1, 0]
            pred = (row != sentinel) & (row != prev)
        return pred, pltpu.make_async_copy(
            table_ref.at[row], buf.at[slot, r], sems.at[slot, r])

    def start_wave(slot, wave):
        for r in range(_WAVE):
            pred, cp = dma(slot, wave, r)

            @pl.when(pred)
            def _():
                cp.start()

    def wait_wave(slot, wave):
        for r in range(_WAVE):
            pred, cp = dma(slot, wave, r)

            @pl.when(pred)
            def _():
                cp.wait()

    start_wave(0, 0)

    def wave_body(w, carry):
        slot = w % 2

        @pl.when(w + 1 < n_waves)
        def _():
            start_wave((w + 1) % 2, w + 1)

        # Wave-level sentinel skip: padded/invalid queries all map to the
        # sentinel row and the caller pre-sorts queries by row, so whole
        # waves at the tail of each lane are sentinel-only.  Their DMAs were
        # never started; skip the compute too and just write "no candidate".
        # (Exact test — a live query anywhere in the wave disables the skip,
        # so mid-batch out-of-grid queries at a later-round pose are safe.)
        qsl = pl.ds(w * _WAVE, _WAVE)
        any_live = jnp.min(bcv_ref[qsl, :]) != sentinel

        @pl.when(jnp.logical_not(any_live))
        def _():
            d2_ref[qsl, :] = jnp.full((_WAVE, K), 3.0e38, jnp.float32)
            if planes_out:
                zeros = jnp.zeros((K, _WAVE), jnp.float32)
                nnx_ref[:, qsl] = zeros
                nny_ref[:, qsl] = zeros
                nnz_ref[:, qsl] = zeros
            else:
                zeros = jnp.zeros((_WAVE, K), jnp.float32)
                nnx_ref[qsl, :] = zeros
                nny_ref[qsl, :] = zeros
                nnz_ref[qsl, :] = zeros

        @pl.when(any_live)
        def _():
            compute_wave(w, slot)
        return carry

    def compute_wave(w, slot):
        wait_wave(slot, w)

        rows = buf[slot]                                   # [WAVE, 3*S3, 128]
        X = rows[:, 0 * S3:1 * S3, :].reshape(_WAVE, W)    # minor-dim collapse
        Y = rows[:, 1 * S3:2 * S3, :].reshape(_WAVE, W)
        Z = rows[:, 2 * S3:3 * S3, :].reshape(_WAVE, W)
        qsl = pl.ds(w * _WAVE, _WAVE)

        if _DEDUP:
            # forward-fill slots whose DMA was deduped (same row as the slot
            # above): log-step "copy last fresh row downward"
            bcw = bcv_ref[qsl, :]                          # (WAVE,1) i32
            rows_w = lax.broadcasted_iota(jnp.int32, (_WAVE, 1), 0)
            prevv = jnp.concatenate([bcw[0:1], bcw[:-1]], axis=0)
            need = ((rows_w != 0) & (bcw == prevv)).astype(jnp.float32)
            sft = 1
            while sft < _WAVE:
                Xs = jnp.concatenate([X[:sft], X[:-sft]], axis=0)
                Ys = jnp.concatenate([Y[:sft], Y[:-sft]], axis=0)
                Zs = jnp.concatenate([Z[:sft], Z[:-sft]], axis=0)
                ns = jnp.concatenate([need[:sft], need[:-sft]], axis=0)
                X = jnp.where(need > 0, Xs, X)
                Y = jnp.where(need > 0, Ys, Y)
                Z = jnp.where(need > 0, Zs, Z)
                need = need * ns
                sft *= 2
        qx = qx_ref[qsl, :]                                # [WAVE, 1]
        qy = qy_ref[qsl, :]
        qz = qz_ref[qsl, :]
        dx = X - qx
        dy = Y - qy
        dz = Z - qz
        d2 = dx * dx + dy * dy + dz * dz                   # [WAVE, W]
        # sentinel slots hold stale buffers: force their d2 to "no candidate"
        sent = bcv_ref[qsl, :] == (table_ref.shape[0] - 1)  # [WAVE, 1]
        d2 = jnp.where(sent, 3.0e38, d2)

        cols = lax.broadcasted_iota(jnp.int32, (_WAVE, W), 1)

        ds_, xs_, ys_, zs_ = [], [], [], []
        d2m = d2
        for _k in range(K):                                # unrolled: K small
            m = jnp.min(d2m, axis=1, keepdims=True)        # [WAVE, 1]
            first = jnp.min(jnp.where(d2m == m, cols, W), axis=1,
                            keepdims=True)                 # first occurrence
            oh = (cols == first).astype(jnp.float32)
            ds_.append(m)                                  # [WAVE, 1]
            xs_.append(jnp.sum(X * oh, axis=1, keepdims=True))
            ys_.append(jnp.sum(Y * oh, axis=1, keepdims=True))
            zs_.append(jnp.sum(Z * oh, axis=1, keepdims=True))
            d2m = jnp.where(cols == first, 3.0e38, d2m)

        d2_ref[qsl, :] = jnp.concatenate(ds_, axis=1)      # [WAVE, K]
        if planes_out:
            # plane-major candidate output ([K, Q]): the [WAVE, K] -> [K,
            # WAVE] relayout happens HERE, on a VMEM-resident 128x8 tile,
            # instead of as an XLA transpose of the full [B, P, K, 3]
            # tensor through HBM (measured ~40 ms/batch of fusion glue at
            # B=256 — the round-5 e2e lever).
            nnx_ref[:, qsl] = jnp.concatenate(xs_, axis=1).T
            nny_ref[:, qsl] = jnp.concatenate(ys_, axis=1).T
            nnz_ref[:, qsl] = jnp.concatenate(zs_, axis=1).T
        else:
            nnx_ref[qsl, :] = jnp.concatenate(xs_, axis=1)
            nny_ref[qsl, :] = jnp.concatenate(ys_, axis=1)
            nnz_ref[qsl, :] = jnp.concatenate(zs_, axis=1)

    lax.fori_loop(0, n_waves, wave_body, jnp.int32(0), unroll=False)


@partial(jax.jit, static_argnames=("W", "K", "vma", "planes_out"))
def fused_block_fetch(table_planar, bcell, query, *, W: int, K: int = 8,
                      vma: tuple = (), planes_out: bool = False):
    """query [Q,3], bcell [Q] int32 row ids -> (d2 [Q,K], nn [Q,K,3]).

    Q must be a multiple of 256 (pad queries; point padded bcell rows at the
    sentinel row).  W = candidates per block row = table_planar.shape[1]
    // 3 * 128 (8*cell_cap uncompacted, the packed row width otherwise);
    table_planar from build_block_table_planar ([rows, 3*W/128, 128]).
    vma: mesh axes the outputs vary over (shard_map check_vma support).

    planes_out=True returns (d2 [Q,K], (nnx, nny, nnz) each [K,Q]) — the
    plane-major layout gn_round_pallas consumes directly (concatenate the
    three on axis 0 for cand [3K, Q]; lane b's block is columns
    [b*P:(b+1)*P]), skipping the [B,P,K,3]->[B,3K,P] XLA transpose.

    query may also be a (qx, qy, qz) tuple of [Q] arrays — preferred, it
    avoids materializing the tile-padded [Q,3] layout.
    """
    if isinstance(query, tuple):
        qx, qy, qz = (q[:, None] for q in query)
    else:
        qx, qy, qz = query[:, 0:1], query[:, 1:2], query[:, 2:3]
    Q = qx.shape[0]
    assert Q % _TILE == 0, Q
    assert W % 128 == 0, W
    S3 = W // 128
    assert table_planar.shape[1] == 3 * S3, (table_planar.shape, W)
    grid = (Q // _TILE,)

    if planes_out:
        nn_spec = pl.BlockSpec((K, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        nn_shape = jax.ShapeDtypeStruct((K, Q), jnp.float32,
                                        vma=frozenset(vma) if vma else None)
    else:
        nn_spec = pl.BlockSpec((_TILE, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        nn_shape = jax.ShapeDtypeStruct((Q, K), jnp.float32,
                                        vma=frozenset(vma) if vma else None)

    kernel = partial(_fetch_kernel, S3=S3, K=K, planes_out=planes_out)
    d2, nnx, nny, nnz = pl.pallas_call(
        kernel,
        # Mosaic is TPU-only; on CPU (tests, virtual meshes) run interpreted.
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),        # bcell (vector)
            pl.BlockSpec(memory_space=pltpu.HBM),          # table stays HBM
        ],
        out_specs=[
            pl.BlockSpec((_TILE, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            nn_spec,
            nn_spec,
            nn_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, K), jnp.float32,
                                 vma=frozenset(vma) if vma else None),
            nn_shape,
            nn_shape,
            nn_shape,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, _WAVE, 3 * S3, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _WAVE)),
        ],
    )(bcell[:, None], qx, qy, qz,
      bcell[:, None], table_planar)

    d2 = jnp.where(d2 > 1e17, _BIG, d2)
    if planes_out:
        return d2, (nnx, nny, nnz)
    nn = jnp.stack([nnx, nny, nnz], axis=-1)
    return d2, nn


_RESIDENT_GROUP = int(os.environ.get('FBPR_RFETCH_GROUP', '32'))
_RESIDENT_VMEM_CAP = int(os.environ.get(
    'FBPR_RFETCH_VMEM_CAP', str(10 * 1024 * 1024)))


class PlanarTable(NamedTuple):
    """Row-compacted planar block table for the VMEM-resident fetch.

    table: [Rp+1, 3*W/128, 128] — populated block rows only, sentinel last.
    rows_index: [n_cells+1] i32 — raw block-cell id -> compact row
    (unpopulated and sentinel cells -> Rp).
    """
    table: object
    rows_index: object


def compact_row_space(table_planar):
    """Drop unpopulated block rows.  [R, S, 128] -> PlanarTable.

    Most of a map grid's cells are empty (the grid covers the bounding box;
    the cloud covers surfaces): on the bench map ~2.3k of 6.3k block rows
    hold any candidate.  The resident fetch keeps the whole table in VMEM,
    so row compaction is what makes it fit (~16 MB/core, pallas guide).
    """
    R = table_planar.shape[0]
    S = table_planar.shape[1]
    S3 = S // 3
    # a row is populated iff any x-plane slot is valid (< FAR)
    xplanes = table_planar[:, 0:S3, :].reshape(R, S3 * 128)
    pop = jnp.any(xplanes < 1e8, axis=1)
    pop = pop.at[R - 1].set(False)              # old sentinel row drops
    idx = np.where(np.asarray(pop))[0]
    Rp = len(idx)
    rows_index = np.full(R, Rp, np.int32)
    rows_index[idx] = np.arange(Rp, dtype=np.int32)
    compact = jnp.concatenate(
        [table_planar[jnp.asarray(idx)],
         jnp.full((1, S, 128), _FAR, table_planar.dtype)], axis=0)
    return PlanarTable(table=compact, rows_index=jnp.asarray(rows_index))


def _resident_kernel(bcell_ref, qx_ref, qy_ref, qz_ref, table_ref,
                     d2_ref, nnx_ref, nny_ref, nnz_ref, *, S3: int, K: int,
                     planes_out: bool = False):
    """One program: _TILE queries against the VMEM-resident table.

    No DMA machinery at all: each query's block row is a dynamic-slice
    VMEM load (scalar row id from SMEM).  The per-slot conditional DMA
    start/wait chains of _fetch_kernel were its measured bottleneck
    (~60 ms/batch of scalar-unit work at B=128); here the scalar unit only
    computes G load addresses per group.  Padded/out-of-grid queries read
    the sentinel row (all FAR) and fall out as d2 > 1e17 downstream —
    no validity plane, no stale-buffer forcing.
    """
    G = _RESIDENT_GROUP
    W = S3 * 128
    sentinel = table_ref.shape[0] - 1

    for g in range(_TILE // G):
        base = g * G
        live = jnp.int32(0)
        for j in range(G):
            live = live | jnp.where(bcell_ref[base + j, 0] != sentinel, 1, 0)
        qsl = pl.ds(base, G)

        @pl.when(live == 0)
        def _():
            d2_ref[qsl, :] = jnp.full((G, K), 3.0e38, jnp.float32)
            if planes_out:
                zeros = jnp.zeros((K, G), jnp.float32)
                nnx_ref[:, qsl] = zeros
                nny_ref[:, qsl] = zeros
                nnz_ref[:, qsl] = zeros
            else:
                zeros = jnp.zeros((G, K), jnp.float32)
                nnx_ref[qsl, :] = zeros
                nny_ref[qsl, :] = zeros
                nnz_ref[qsl, :] = zeros

        @pl.when(live != 0)
        def _():
            rows = [table_ref[bcell_ref[base + j, 0]] for j in range(G)]
            R = jnp.stack(rows)                            # [G, 3*S3, 128]
            X = R[:, 0 * S3:1 * S3, :].reshape(G, W)
            Y = R[:, 1 * S3:2 * S3, :].reshape(G, W)
            Z = R[:, 2 * S3:3 * S3, :].reshape(G, W)
            qx = qx_ref[qsl, :]                            # [G, 1]
            qy = qy_ref[qsl, :]
            qz = qz_ref[qsl, :]
            dx = X - qx
            dy = Y - qy
            dz = Z - qz
            d2 = dx * dx + dy * dy + dz * dz               # [G, W]
            cols = lax.broadcasted_iota(jnp.int32, (G, W), 1)

            ds_, xs_, ys_, zs_ = [], [], [], []
            d2m = d2
            for _k in range(K):
                m = jnp.min(d2m, axis=1, keepdims=True)    # [G, 1]
                first = jnp.min(jnp.where(d2m == m, cols, W), axis=1,
                                keepdims=True)
                oh = (cols == first).astype(jnp.float32)
                ds_.append(m)
                xs_.append(jnp.sum(X * oh, axis=1, keepdims=True))
                ys_.append(jnp.sum(Y * oh, axis=1, keepdims=True))
                zs_.append(jnp.sum(Z * oh, axis=1, keepdims=True))
                d2m = jnp.where(cols == first, 3.0e38, d2m)

            d2_ref[qsl, :] = jnp.concatenate(ds_, axis=1)  # [G, K]
            if planes_out:
                nnx_ref[:, qsl] = jnp.concatenate(xs_, axis=1).T
                nny_ref[:, qsl] = jnp.concatenate(ys_, axis=1).T
                nnz_ref[:, qsl] = jnp.concatenate(zs_, axis=1).T
            else:
                nnx_ref[qsl, :] = jnp.concatenate(xs_, axis=1)
                nny_ref[qsl, :] = jnp.concatenate(ys_, axis=1)
                nnz_ref[qsl, :] = jnp.concatenate(zs_, axis=1)


@partial(jax.jit, static_argnames=("W", "K", "vma", "planes_out"))
def fused_resident_fetch(table_compact, bcell, query, *, W: int, K: int = 8,
                         vma: tuple = (), planes_out: bool = False):
    """Resident-table variant of fused_block_fetch: same contract, but
    `table_compact` (from compact_row_space) lives whole in VMEM and
    `bcell` holds COMPACT row ids (route through PlanarTable.rows_index).
    planes_out and tuple-query as in fused_block_fetch."""
    if isinstance(query, tuple):
        qx, qy, qz = (q[:, None] for q in query)
    else:
        qx, qy, qz = query[:, 0:1], query[:, 1:2], query[:, 2:3]
    Q = qx.shape[0]
    assert Q % _TILE == 0, Q
    assert W % 128 == 0, W
    S3 = W // 128
    assert table_compact.shape[1] == 3 * S3, (table_compact.shape, W)
    grid = (Q // _TILE,)

    if planes_out:
        nn_spec = pl.BlockSpec((K, _TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        nn_shape = jax.ShapeDtypeStruct((K, Q), jnp.float32,
                                        vma=frozenset(vma) if vma else None)
    else:
        nn_spec = pl.BlockSpec((_TILE, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        nn_shape = jax.ShapeDtypeStruct((Q, K), jnp.float32,
                                        vma=frozenset(vma) if vma else None)

    kernel = partial(_resident_kernel, S3=S3, K=K, planes_out=planes_out)
    d2, nnx, nny, nnz = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),         # whole table
        ],
        out_specs=[
            pl.BlockSpec((_TILE, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            nn_spec,
            nn_spec,
            nn_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, K), jnp.float32,
                                 vma=frozenset(vma) if vma else None),
            nn_shape,
            nn_shape,
            nn_shape,
        ],
    )(bcell[:, None], qx, qy, qz,
      table_compact)

    d2 = jnp.where(d2 > 1e17, _BIG, d2)
    if planes_out:
        return d2, (nnx, nny, nnz)
    nn = jnp.stack([nnx, nny, nnz], axis=-1)
    return d2, nn


def block_cell_of(query, origin, cell_size, *, dims):
    """Block-corner row id per query (octant rule; out-of-grid -> sentinel)."""
    return block_cell_of_xyz(query[..., 0], query[..., 1], query[..., 2],
                             origin, cell_size, dims=dims)


def block_cell_of_xyz(qx, qy, qz, origin, cell_size, *, dims):
    """block_cell_of on component arrays (any shape).

    Component-wise on purpose: a [Q,3] layout puts the 3-wide axis on the
    128-lane dimension (42x tile padding), and the floor/convert/compare/
    reduce chain over it measured ~14 ms/batch per round at B=256.  The
    same chain on three [Q] arrays is clean full-width VPU work.
    """
    Gx, Gy, Gz = dims
    n_cells = Gx * Gy * Gz

    def base_of(q, o):
        rel = (q - o) / cell_size
        ijk = jnp.floor(rel).astype(jnp.int32)
        return ijk - (rel - ijk < 0.5).astype(jnp.int32)

    bx = base_of(qx, origin[0])
    by = base_of(qy, origin[1])
    bz = base_of(qz, origin[2])
    ok = ((bx >= 0) & (by >= 0) & (bz >= 0)
          & (bx < Gx) & (by < Gy) & (bz < Gz))
    return jnp.where(ok, (bx * Gy + by) * Gz + bz, n_cells).astype(jnp.int32)


def make_pallas_block_knn(table_planar, origin, cell_size, *, dims, cell_cap,
                          k: int = 8):
    """Fetch closure (query [Q,3] -> (d2 [Q,k], nn [Q,k,3])) on the fused
    kernel; same contract as ops.hashgrid.make_block_grid_knn.  Accepts a
    raw planar table (DMA-wave kernel) or a PlanarTable (resident kernel)."""
    if isinstance(table_planar, PlanarTable):
        W = table_planar.table.shape[1] // 3 * 128

        def f(q):
            bcell = block_cell_of(q, origin, cell_size, dims=dims)
            return fused_resident_fetch(
                table_planar.table, table_planar.rows_index[bcell], q,
                W=W, K=k)

        return f
    W = table_planar.shape[1] // 3 * 128

    def f(q):
        bcell = block_cell_of(q, origin, cell_size, dims=dims)
        return fused_block_fetch(table_planar, bcell, q, W=W, K=k)

    return f
