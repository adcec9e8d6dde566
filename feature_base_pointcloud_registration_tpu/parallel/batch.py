"""Batched + sharded registration: the TPU scaling axis.

The reference scales with OpenMP threads inside one scan (ref:
src/mapOptmization.h:1007,1130; numberOfCores=4).  The TPU equivalent
(SURVEY.md §2 parallelism note) is throughput over *batches of scans*:

  * `batch_register` — vmap of register_scan over a leading batch dim; one
    program, all scans advance their GN iterations in lock-step on one chip.
  * `shard_register` — shard_map over a device mesh: the batch is split on
    the `data` axis (each device registers its shard against the replicated
    local map); convergence stats reduce with psum over ICI.

Both work with a shared local map (offline mapping against one city block)
or per-scan maps (batched leading dim on the map too).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.register import (RegisterResult, register_scan, register_scan_fast,
                            register_scan_fast_grid)
from ..pipeline.cloud_info import FeatureMap, ScanFeatures


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data mesh over all (or given) devices."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


@partial(jax.jit, static_argnames=("chunk", "max_iterations"))
def batch_register(features: ScanFeatures, local_map: FeatureMap,
                   init_poses, *, chunk: int = 4096,
                   max_iterations: int = 30) -> RegisterResult:
    """vmap register_scan over a batch.

    features: ScanFeatures with leading batch dim [B, ...];
    local_map: shared map (no batch dim) or per-scan maps ([B, ...]);
    init_poses: [B, 6].
    """
    map_axes = FeatureMap(
        corner_xyz=0 if local_map.corner_xyz.ndim == 3 else None,
        corner_mask=0 if local_map.corner_mask.ndim == 2 else None,
        surf_xyz=0 if local_map.surf_xyz.ndim == 3 else None,
        surf_mask=0 if local_map.surf_mask.ndim == 2 else None,
    )
    fn = jax.vmap(
        lambda f, m, p: register_scan(
            f, m, p, chunk=chunk, max_iterations=max_iterations),
        in_axes=(0, map_axes, 0),
    )
    return fn(features, local_map, init_poses)


def shard_register(mesh: Mesh, features: ScanFeatures, local_map: FeatureMap,
                   init_poses, *, chunk: int = 4096,
                   max_iterations: int = 30, axis_name: str = "data"):
    """shard_map batched registration over a device mesh.

    The batch dim is sharded over `axis_name`; the local map is replicated
    (it rides ICI once at launch, then every device streams its own copy
    from HBM).  Returns (RegisterResult [B,...], stats dict with globally
    psum-reduced convergence counters).
    """
    batched = FeatureMap(*(jnp.asarray(a) for a in local_map))

    def local_fn(f, m, p):
        res = batch_register(f, m, p, chunk=chunk,
                             max_iterations=max_iterations)
        n_conv = jax.lax.psum(jnp.sum(res.converged.astype(jnp.int32)),
                              axis_name)
        n_total = jax.lax.psum(res.converged.shape[0], axis_name)
        mean_iters = jax.lax.pmean(jnp.mean(res.iterations.astype(jnp.float32)),
                                   axis_name)
        return res, {"n_converged": n_conv, "n_total": n_total,
                     "mean_iterations": mean_iters}

    spec_feats = ScanFeatures(P(axis_name), P(axis_name),
                              P(axis_name), P(axis_name))
    spec_map = FeatureMap(P(), P(), P(), P())
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec_feats, spec_map, P(axis_name)),
        out_specs=(
            RegisterResult(P(axis_name), P(axis_name), P(axis_name),
                           P(axis_name), P(axis_name), P(axis_name)),
            {"n_converged": P(), "n_total": P(), "mean_iterations": P()},
        ),
    )
    return jax.jit(fn)(features, batched, init_poses)


@partial(jax.jit, static_argnames=("chunk", "max_iterations", "num_candidates"))
def batch_register_fast(features: ScanFeatures, local_map: FeatureMap,
                        init_poses, *, chunk: int = 4096,
                        max_iterations: int = 30,
                        num_candidates: int = 16) -> RegisterResult:
    """vmap of the candidate-prefetch fast path (see register_scan_fast)."""
    map_axes = FeatureMap(
        corner_xyz=0 if local_map.corner_xyz.ndim == 3 else None,
        corner_mask=0 if local_map.corner_mask.ndim == 2 else None,
        surf_xyz=0 if local_map.surf_xyz.ndim == 3 else None,
        surf_mask=0 if local_map.surf_mask.ndim == 2 else None,
    )
    fn = jax.vmap(
        lambda f, m, p: register_scan_fast(
            f, m, p, chunk=chunk, max_iterations=max_iterations,
            num_candidates=num_candidates),
        in_axes=(0, map_axes, 0),
    )
    return fn(features, local_map, init_poses)


def build_map_grids(local_map: FeatureMap, center, half_extent,
                    cell_size: float = 2.0, corner_cell_cap: int = 16,
                    surf_cell_cap: int = 64, margin: float = 2.0):
    """Build the corner+surf hash-grid tables for one local map (amortized
    across every scan registered against it).  Returns
    (corner_table, surf_table, origin, dims)."""
    from ..ops.hashgrid import (build_grid_sentinel, default_grid_spec,
                                grid_origin)

    dims = default_grid_spec(half_extent, cell_size, margin)
    origin = grid_origin(center, half_extent, margin)
    ctab = build_grid_sentinel(local_map.corner_xyz, local_map.corner_mask,
                               origin, cell_size, dims=dims,
                               cell_cap=corner_cell_cap)
    stab = build_grid_sentinel(local_map.surf_xyz, local_map.surf_mask,
                               origin, cell_size, dims=dims,
                               cell_cap=surf_cell_cap)
    return ctab, stab, origin, dims


@partial(jax.jit, static_argnames=("grid_dims", "cell_size", "cell_cap",
                                   "max_iterations", "num_candidates"))
def batch_register_fast_grid(features: ScanFeatures, local_map: FeatureMap,
                             corner_table, surf_table, origin, init_poses, *,
                             grid_dims, cell_size: float = 1.0,
                             cell_cap: int = 16, max_iterations: int = 30,
                             num_candidates: int = 16) -> RegisterResult:
    """vmap of register_scan_fast_grid over a batch against one shared map."""
    fn = jax.vmap(
        lambda f, p: register_scan_fast_grid(
            f, local_map, corner_table, surf_table, origin, p,
            grid_dims=grid_dims, cell_size=cell_size, cell_cap=cell_cap,
            max_iterations=max_iterations, num_candidates=num_candidates),
        in_axes=(0, 0),
    )
    return fn(features, init_poses)


@partial(jax.jit, static_argnames=("grid_dims", "cell_size",
                                   "corner_cell_cap", "surf_cell_cap",
                                   "num_rounds", "iters_per_round",
                                   "num_candidates"))
def batch_register_rounds(features: ScanFeatures, corner_packed, surf_packed,
                          origin, init_poses, *, grid_dims,
                          cell_size: float = 2.0, corner_cell_cap: int = 16,
                          surf_cell_cap: int = 64,
                          num_rounds: int = 2, iters_per_round: int = 15,
                          num_candidates: int = 16) -> RegisterResult:
    """vmap of the rounds-structured solve against one shared packed map.

    The fastest batched path: R unconditional prefetches per scan (vmap-safe,
    no cond branches), candidate-local GN iterations in between.
    """
    from ..ops.hashgrid import make_oct_sentinel_knn
    from ..ops.register import register_rounds_core

    cfetch = make_oct_sentinel_knn(corner_packed, origin, cell_size,
                                   dims=grid_dims, cell_cap=corner_cell_cap,
                                   k=num_candidates)
    sfetch = make_oct_sentinel_knn(surf_packed, origin, cell_size,
                                   dims=grid_dims, cell_cap=surf_cell_cap,
                                   k=num_candidates)

    fn = jax.vmap(
        lambda f, p: register_rounds_core(
            f, cfetch, sfetch, p,
            num_rounds=num_rounds, iters_per_round=iters_per_round),
        in_axes=(0, 0),
    )
    return fn(features, init_poses)


def build_map_block_tables(local_map: FeatureMap, center, half_extent,
                           cell_size: float = 2.0, corner_cell_cap: int = 16,
                           surf_cell_cap: int = 64, margin: float = 2.0):
    """Block-table variant of build_map_grids: one contiguous row per 2x2x2
    block (8x memory, single-gather fetch)."""
    from ..ops.hashgrid import (build_block_table, build_grid_sentinel,
                                default_grid_spec, grid_origin)

    dims = default_grid_spec(half_extent, cell_size, margin)
    origin = grid_origin(center, half_extent, margin)
    cst = build_grid_sentinel(local_map.corner_xyz, local_map.corner_mask,
                              origin, cell_size, dims=dims,
                              cell_cap=corner_cell_cap)
    sst = build_grid_sentinel(local_map.surf_xyz, local_map.surf_mask,
                              origin, cell_size, dims=dims,
                              cell_cap=surf_cell_cap)
    cbt = build_block_table(cst, dims=dims, cell_cap=corner_cell_cap)
    sbt = build_block_table(sst, dims=dims, cell_cap=surf_cell_cap)
    return cbt, sbt, origin, dims


def build_map_planar_tables(local_map: FeatureMap, center, half_extent,
                            cell_size: float = 2.0, corner_cell_cap: int = 16,
                            surf_cell_cap: int = 64, margin: float = 2.0,
                            resident: bool = False):
    """Plane-major block tables for the Pallas fused-fetch path.  Returns
    (corner_table, surf_table, origin, dims).  resident=True row-compacts
    each table into a PlanarTable for the VMEM-resident fetch when it fits
    the VMEM budget — measured SLOWER than the DMA-wave kernel (592 vs 812
    scans/s at B=128: stacking rows via VPU dynamic-slice loads costs more
    than the DMA engine's overlapped copies), kept as a tested alternative
    for maps whose DMA-issue profile differs."""
    from ..ops.hashgrid import (build_grid_sentinel, default_grid_spec,
                                grid_origin)
    from ..ops.pallas_fetch import (_RESIDENT_VMEM_CAP,
                                    build_block_table_planar,
                                    compact_row_space)

    dims = default_grid_spec(half_extent, cell_size, margin)
    origin = grid_origin(center, half_extent, margin)
    cst = build_grid_sentinel(local_map.corner_xyz, local_map.corner_mask,
                              origin, cell_size, dims=dims,
                              cell_cap=corner_cell_cap)
    sst = build_grid_sentinel(local_map.surf_xyz, local_map.surf_mask,
                              origin, cell_size, dims=dims,
                              cell_cap=surf_cell_cap)
    cpt = build_block_table_planar(cst, dims=dims)
    spt = build_block_table_planar(sst, dims=dims)
    if resident:
        def maybe_compact(t):
            c = compact_row_space(t)
            return c if c.table.size * 4 <= _RESIDENT_VMEM_CAP else t

        cpt = maybe_compact(cpt)
        spt = maybe_compact(spt)
    return cpt, spt, origin, dims


@partial(jax.jit, static_argnames=("grid_dims", "cell_size",
                                   "corner_cell_cap", "surf_cell_cap",
                                   "num_rounds", "iters_per_round",
                                   "num_candidates", "edge_min_valid",
                                   "surf_min_valid"))
def batch_register_pallas(features: ScanFeatures, corner_planar, surf_planar,
                          origin, init_poses, *, grid_dims,
                          cell_size: float = 2.0, corner_cell_cap: int = 16,
                          surf_cell_cap: int = 64,
                          num_rounds: int = 2, iters_per_round: int = 15,
                          num_candidates: int = 8, edge_min_valid: int = 10,
                          surf_min_valid: int = 100) -> RegisterResult:
    """Fastest TPU path: Pallas fused fetch + rounds-structured solve.

    Tables from build_map_planar_tables; feature caps must be multiples of
    512 (the kernel's query tile).  TPU-only — use batch_register_blocks on
    other backends."""
    from ..ops.pallas_fetch import make_pallas_block_knn
    from ..ops.register import register_rounds_core

    cfetch = make_pallas_block_knn(corner_planar, origin, cell_size,
                                   dims=grid_dims, cell_cap=corner_cell_cap,
                                   k=num_candidates)
    sfetch = make_pallas_block_knn(surf_planar, origin, cell_size,
                                   dims=grid_dims, cell_cap=surf_cell_cap,
                                   k=num_candidates)

    fn = jax.vmap(
        lambda f, p: register_rounds_core(
            f, cfetch, sfetch, p,
            num_rounds=num_rounds, iters_per_round=iters_per_round,
            edge_min_valid=edge_min_valid, surf_min_valid=surf_min_valid),
        in_axes=(0, 0),
    )
    return fn(features, init_poses)


@partial(jax.jit, static_argnames=("grid_dims", "cell_size",
                                   "corner_cell_cap", "surf_cell_cap",
                                   "num_rounds", "iters_per_round",
                                   "num_candidates", "edge_min_valid",
                                   "surf_min_valid", "min_plane_spread"))
def batch_register_blocks(features: ScanFeatures, corner_block, surf_block,
                          origin, init_poses, *, grid_dims,
                          cell_size: float = 2.0, corner_cell_cap: int = 16,
                          surf_cell_cap: int = 64,
                          num_rounds: int = 2, iters_per_round: int = 15,
                          num_candidates: int = 8, edge_min_valid: int = 10,
                          surf_min_valid: int = 100,
                          min_plane_spread: float = 0.0) -> RegisterResult:
    """Fastest batched path: block-table fetch + rounds-structured solve.

    num_candidates=8 matches the exact solver to <1 mm (candidates refresh
    every round) while halving the top-k selection cost."""
    from ..ops.hashgrid import make_block_grid_knn
    from ..ops.register import register_rounds_core

    cfetch = make_block_grid_knn(corner_block, origin, cell_size,
                                 dims=grid_dims, cell_cap=corner_cell_cap,
                                 k=num_candidates)
    sfetch = make_block_grid_knn(surf_block, origin, cell_size,
                                 dims=grid_dims, cell_cap=surf_cell_cap,
                                 k=num_candidates)

    fn = jax.vmap(
        lambda f, p: register_rounds_core(
            f, cfetch, sfetch, p,
            num_rounds=num_rounds, iters_per_round=iters_per_round,
            edge_min_valid=edge_min_valid, surf_min_valid=surf_min_valid,
            min_plane_spread=min_plane_spread),
        in_axes=(0, 0),
    )
    return fn(features, init_poses)


@partial(jax.jit, static_argnames=("grid_dims", "cell_size",
                                   "corner_cell_cap", "surf_cell_cap",
                                   "num_rounds", "iters_per_round",
                                   "num_candidates", "min_correspondences",
                                   "edge_min_valid", "surf_min_valid",
                                   "shared_fetch", "skip_converged_refetch",
                                   "presort_rows", "round1_surf_stride",
                                   "round1_corner_stride",
                                   "min_plane_spread", "shard_axes"))
def batch_register_fused(features: ScanFeatures, corner_planar, surf_planar,
                         origin, init_poses, *, grid_dims,
                         cell_size: float = 2.0, corner_cell_cap: int = 16,
                         surf_cell_cap: int = 64, num_rounds: int = 2,
                         iters_per_round: int = 15, num_candidates: int = 8,
                         min_correspondences: int = 50,
                         edge_min_valid: int = 10,
                         surf_min_valid: int = 100,
                         shared_fetch: bool = False,
                         skip_converged_refetch: bool = False,
                         presort_rows: bool = False,
                         round1_surf_stride: int = 1,
                         round1_corner_stride: int = 1,
                         min_plane_spread: float = 0.0,
                         shard_axes: tuple = ()) -> RegisterResult:
    """Fused-kernel batched solve: Pallas fetch + Pallas GN-round kernel.

    Two kernels per round (candidate fetch, full GN iteration loop) instead
    of ~50 XLA fusions per GN iteration — collapses the dispatch gap that
    left the round-2 solve 84% device-idle (docs/ROUND_NOTES.md), and the
    per-lane iteration guard removes the vmapped-while_loop lockstep, so
    throughput is monotone in batch size.  Math parity with
    batch_register_blocks is tested (same candidate sets, same gates).
    """
    from ..geom.se3 import euler_to_rot
    from ..ops.pallas_fetch import (PlanarTable, block_cell_of,
                                    fused_block_fetch, fused_resident_fetch)
    from ..ops.pallas_gn import STAT, gn_round_pallas

    B, Pc, _ = features.corner_xyz.shape
    Ps = features.surf_xyz.shape[1]
    K = num_candidates
    prec = jax.lax.Precision.HIGHEST

    # raw planar array -> DMA-wave kernel; PlanarTable (row-compacted, fits
    # VMEM) -> resident kernel with no per-query DMA machinery.
    def sentinel_of(planar):
        if isinstance(planar, PlanarTable):
            return planar.rows_index.shape[0] - 1
        return planar.shape[0] - 1

    def run_fetch(planar, bc, w):
        if isinstance(planar, PlanarTable):
            return fused_resident_fetch(
                planar.table, planar.rows_index[bc], w,
                W=planar.table.shape[1] // 3 * 128, K=K, vma=shard_axes,
                planes_out=True)
        return fused_block_fetch(planar, bc, w,
                                 W=planar.shape[1] // 3 * 128, K=K,
                                 vma=shard_axes, planes_out=True)

    # Per-lane presort of features by their block row at the initial pose:
    # the solver is permutation-invariant per lane, and row-sorted queries
    # let the fetch kernel dedup per-query row DMAs (presort=True pairs
    # with FBPR_FETCH_DEDUP=1).  Both default OFF: the dedup fill loop and
    # the 5-operand sorts together cost more than the skipped DMA issues
    # (1.32 vs 1.45 ms/scan at B=128).  The fetch kernel's wave-level
    # sentinel skip needs only valid-prefix masks, which the frontend's
    # compaction already produces — presorting is a perf hint, never a
    # correctness requirement.
    pose_init = jnp.asarray(init_poses, jnp.float32)
    if presort_rows:
        R0 = jax.vmap(euler_to_rot)(pose_init[:, 0], pose_init[:, 1],
                                    pose_init[:, 2])

        def presort(xyz, mask, planar):
            P = xyz.shape[1]
            w0 = jnp.einsum("bij,bpj->bpi", R0, xyz,
                            precision=prec) + pose_init[:, None, 3:6]
            bc = block_cell_of(w0.reshape(B * P, 3), origin, cell_size,
                               dims=grid_dims).reshape(B, P)
            bc = jnp.where(mask, bc, sentinel_of(planar))
            _, xs, ys, zs, ms = jax.lax.sort(
                (bc, xyz[..., 0], xyz[..., 1], xyz[..., 2],
                 mask.astype(jnp.int32)), dimension=1, num_keys=1)
            return jnp.stack([xs, ys, zs], axis=-1), ms.astype(bool)

        cxyz, cmask = presort(features.corner_xyz, features.corner_mask,
                              corner_planar)
        sxyz, smask = presort(features.surf_xyz, features.surf_mask,
                              surf_planar)
        features = features._replace(corner_xyz=cxyz, corner_mask=cmask,
                                     surf_xyz=sxyz, surf_mask=smask)

    featc = jnp.concatenate(
        [jnp.transpose(features.corner_xyz, (0, 2, 1)),
         features.corner_mask[:, None, :].astype(jnp.float32)], axis=1)
    featsp = jnp.concatenate(
        [jnp.transpose(features.surf_xyz, (0, 2, 1)),
         features.surf_mask[:, None, :].astype(jnp.float32)], axis=1)

    n_edge = jnp.sum(features.corner_mask, axis=1).astype(jnp.int32)
    n_surf = jnp.sum(features.surf_mask, axis=1).astype(jnp.int32)
    gate = ((n_edge > edge_min_valid)
            & (n_surf > surf_min_valid)).astype(jnp.float32)

    stat = jnp.zeros((B, STAT), jnp.float32)
    stat = stat.at[:, 0:6].set(jnp.asarray(init_poses, jnp.float32))
    stat = stat.at[:, 9].set(gate)
    matP = jnp.tile(jnp.eye(6, dtype=jnp.float32).reshape(1, 36), (B, 1))

    def cand_planes(nn, P):
        # planes_out fetch: (nnx, nny, nnz) each [K, B*P] -> [3K, B*P];
        # gn_round_pallas block-views lane b's (3K, P) column slice — no
        # XLA transpose (the [B,P,K,3]->[B,3K,P] reshuffle this replaces
        # was ~40 ms/batch of fusion glue at B=256)
        del P
        return jnp.concatenate(nn, axis=0)

    def world_xform(R, pose, xyz):
        # elementwise 9-term mul-add on the VPU: an einsum here (3-wide
        # inner dim, HIGHEST precision) lowers to multi-pass MXU matmuls —
        # measured ~10 ms/batch PER ROUND on the surf queries at B=256.
        # The result stays in [B,P,3] layout on purpose: a fully
        # component-wise pipeline ([Q] arrays into the fetch) was tried
        # and measured 20% SLOWER end to end (1477 -> 1188 scans/s) — the
        # flat-component reshapes/relayouts cost more than the [Q,3]
        # minor-dim-3 padding they remove.
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        out = []
        for i in range(3):
            ri = R[:, i, :]
            out.append(ri[:, 0:1] * x + ri[:, 1:2] * y + ri[:, 2:3] * z
                       + pose[:, None, 3 + i])
        return jnp.stack(out, axis=-1)

    def fetch(pose, cxyz, cmask, sxyz, smask, skip_lane=None):
        pc = cxyz.shape[1]
        ps = sxyz.shape[1]
        R = jax.vmap(euler_to_rot)(pose[:, 0], pose[:, 1], pose[:, 2])
        cw = world_xform(R, pose, cxyz)
        sw = world_xform(R, pose, sxyz)
        cbc = block_cell_of(cw.reshape(B * pc, 3), origin, cell_size,
                            dims=grid_dims)
        sbc = block_cell_of(sw.reshape(B * ps, 3), origin, cell_size,
                            dims=grid_dims)
        # padded/invalid features -> sentinel row: the fetch kernel skips
        # their DMA entirely (the per-query row DMA count is what bounds
        # the fetch) and forces d2 = +inf.  Same trick for whole lanes whose
        # solve already converged (skip_lane): their GN round is a no-op
        # (pallas_gn's per-iteration guard), so their candidates are never
        # read — route every query at the sentinel and the fetch skips the
        # lane's DMA waves AND compute outright.
        cmask_q = cmask.reshape(B * pc)
        smask_q = smask.reshape(B * ps)
        if skip_lane is not None:
            cmask_q = cmask_q & ~jnp.repeat(skip_lane, pc)
            smask_q = smask_q & ~jnp.repeat(skip_lane, ps)
        cbc = jnp.where(cmask_q, cbc, sentinel_of(corner_planar))
        sbc = jnp.where(smask_q, sbc, sentinel_of(surf_planar))
        _, cnn = run_fetch(corner_planar, cbc, cw.reshape(B * pc, 3))
        _, snn = run_fetch(surf_planar, sbc, sw.reshape(B * ps, 3))
        return cand_planes(cnn, pc), cand_planes(snn, ps)

    # iters_per_round: int (same budget every round) or a sequence of
    # per-round budgets (len == num_rounds).  shared_fetch: False = refetch
    # every round; True = one fetch at the init pose shared by all rounds;
    # "tail" = refetch at round 1 (so the pool is from a near-converged
    # pose), then share THAT pool for rounds >= 2 — extra polish rounds
    # cost GN time only, with none of the init-pool staleness.
    if isinstance(iters_per_round, int):
        iters_seq = [iters_per_round] * num_rounds
    else:
        iters_seq = list(iters_per_round)
        assert len(iters_seq) == num_rounds, (iters_seq, num_rounds)

    # Coarse-to-fine: round 0 only needs to carry the pose into the final
    # pool's validity basin, and the FETCH is ~85% of solve time (round-4
    # measurement: one fetch 0.49 ms/scan vs 0.09 per GN round), so
    # subsampling round-0 queries cuts the dominant cost nearly in half
    # while the full-resolution refetch + final round keep the returned
    # pose/n_corr at full fidelity (oracle-parity measured unchanged).
    full_args = (features.corner_xyz, features.corner_mask,
                 features.surf_xyz, features.surf_mask)
    cs, ss = round1_corner_stride, round1_surf_stride
    if cs > 1 or ss > 1:
        # tail IS compatible: it refetches at round 1 at full resolution,
        # which is exactly the refetch the subsampled round 0 requires.
        assert shared_fetch in (False, "tail") and num_rounds >= 2, (
            "round-0 subsampling needs a full-resolution refetch round")
        r0_args = (features.corner_xyz[:, ::cs],
                   features.corner_mask[:, ::cs],
                   features.surf_xyz[:, ::ss],
                   features.surf_mask[:, ::ss])
        featc0 = featc[:, :, ::cs]
        featsp0 = featsp[:, :, ::ss]
    else:
        r0_args = full_args
        featc0, featsp0 = featc, featsp

    for r in range(num_rounds):
        refetch_this = (r == 1) if shared_fetch == "tail" else (
            not shared_fetch)
        if r == 0:
            candc, cands = fetch(stat[:, 0:6], *r0_args)
            stat = stat.at[:, 7].set(0.0)
        elif refetch_this:
            if skip_converged_refetch:
                # Lanes that converged last round keep converged=1, so the
                # GN kernel skips all their iterations — refetch (and
                # re-verify) only the lanes still moving.  The GN kernel
                # re-ranks its K-candidate pool at the current pose every
                # iteration, so the risk is pool coverage only (same class
                # as shared_fetch, but restricted to lanes that already
                # reached the convergence grain).
                candc, cands = fetch(stat[:, 0:6], *full_args,
                                     skip_lane=stat[:, 7] > 0)
            else:
                candc, cands = fetch(stat[:, 0:6], *full_args)
                stat = stat.at[:, 7].set(0.0)   # re-verify every lane
        else:
            # shared pool round: reuse the previous pool, but still
            # re-verify convergence each round — without this reset, lanes
            # that converged in round 1 would skip every later iteration
            # and the returned converged/n_corr would reflect the
            # stale pool, a silent semantics change beyond the
            # documented pool-staleness accuracy caveat.
            stat = stat.at[:, 7].set(0.0)
        fc, fs = (featc0, featsp0) if r == 0 else (featc, featsp)
        stat, matP = gn_round_pallas(
            stat, matP, fc, fs, candc, cands, K=K,
            iters=iters_seq[r], min_corr=min_correspondences,
            min_plane_spread=min_plane_spread, vma=shard_axes)

    return RegisterResult(
        pose6=stat[:, 0:6],
        converged=stat[:, 7] > 0,
        iterations=stat[:, 6].astype(jnp.int32),
        n_corr=stat[:, 10].astype(jnp.int32),
        is_degenerate=stat[:, 8] > 0,
        valid=stat[:, 9] > 0,
    )


def make_shard_register_tables(mesh: Mesh, *, grid_dims,
                               axis_name: str = "data",
                               solver: str = "fused", **solve_kw):
    """Factory for the sharded grid-table solver: returns a jitted
    `(features, corner_tab, surf_tab, origin, init_poses) -> (res, stats)`
    callable.  Build ONCE per (mesh, config) and reuse — every factory call
    creates a fresh closure, i.e. a fresh jit cache entry, so calling the
    factory per step recompiles per step.
    """
    solve = {"fused": batch_register_fused,
             "blocks": batch_register_blocks}[solver]
    if solver == "fused":
        # shard_map(check_vma=True) requires pallas outputs to declare
        # their varying-manual-axes (jax.ShapeDtypeStruct(vma=...)); the
        # fused solver threads this down to every pallas_call it makes, so
        # the vma check — a real guardrail on the v5p-8 deployment
        # wrapper — stays ON for the fused kernel too.
        solve_kw = dict(solve_kw, shard_axes=(axis_name,))

    def local_fn(f, ct, st, org, p):
        # replicated operands (tables, origin) feed kernels whose outputs
        # vary over the data axis; pvary is the sanctioned cast.
        if solver == "fused":
            ct, st, org = jax.tree.map(
                lambda a: jax.lax.pvary(a, (axis_name,)), (ct, st, org))
        res = solve(f, ct, st, org, p, grid_dims=grid_dims, **solve_kw)
        n_conv = jax.lax.psum(jnp.sum(res.converged.astype(jnp.int32)),
                              axis_name)
        n_total = jax.lax.psum(res.converged.shape[0], axis_name)
        mean_iters = jax.lax.pmean(
            jnp.mean(res.iterations.astype(jnp.float32)), axis_name)
        return res, {"n_converged": n_conv, "n_total": n_total,
                     "mean_iterations": mean_iters}

    spec_feats = ScanFeatures(P(axis_name), P(axis_name),
                              P(axis_name), P(axis_name))
    # bare P() = replicated prefix spec broadcast over the whole table pytree
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec_feats, P(), P(), P(), P(axis_name)),
        out_specs=(
            RegisterResult(P(axis_name), P(axis_name), P(axis_name),
                           P(axis_name), P(axis_name), P(axis_name)),
            {"n_converged": P(), "n_total": P(), "mean_iterations": P()},
        ),
    )
    return jax.jit(fn)


_SHARD_TABLES_CACHE = {}


def shard_register_tables(mesh: Mesh, features: ScanFeatures, corner_tab,
                          surf_tab, origin, init_poses, *, grid_dims,
                          axis_name: str = "data", solver: str = "fused",
                          **solve_kw):
    """Data-parallel shard_map of the grid-table batched solvers.

    The scan batch shards over `axis_name`; the map tables are replicated
    (they ride ICI once at launch, then every device streams its own HBM
    copy) — the v5p-8 scaling shape for the BASELINE north star: per-chip
    throughput times the data axis, no inter-chip traffic in steady state
    beyond the psum'd convergence counters.

    solver="fused" = Pallas fused-kernel path (TPU meshes);
    solver="blocks" = XLA block path (any backend, incl. the virtual-CPU
    meshes used in CI).  B must divide by the axis size; with "fused" the
    per-shard batch must keep B_shard * feature caps multiples of the
    kernel's 512-query tile.

    The underlying jitted callable is memoized on (mesh, config), so
    repeated calls reuse the compiled executable; use
    make_shard_register_tables directly to manage the lifetime yourself.

    Returns (RegisterResult [B, ...], stats) like shard_register.
    """
    try:
        key = (mesh, tuple(grid_dims), axis_name, solver,
               tuple(sorted(solve_kw.items())))
        fn = _SHARD_TABLES_CACHE.get(key)
        if fn is None:
            fn = _SHARD_TABLES_CACHE[key] = make_shard_register_tables(
                mesh, grid_dims=grid_dims, axis_name=axis_name,
                solver=solver, **solve_kw)
    except TypeError:  # unhashable kwarg: fall back to a one-shot build
        fn = make_shard_register_tables(
            mesh, grid_dims=grid_dims, axis_name=axis_name, solver=solver,
            **solve_kw)
    return fn(features, corner_tab, surf_tab, jnp.asarray(origin),
              init_poses)
