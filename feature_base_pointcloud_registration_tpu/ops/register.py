"""Fused scan-to-map registration: the hottest loop of the system.

Rebuild of scan2MapOptimization + transformUpdate (ref: src/mapOptmization.h:
1403-1489) as a single jitted lax.while_loop: up to 30 iterations of
{transform features -> streamed 5-NN -> line/plane fits -> masked GN step},
early exit on convergence, degeneracy projector cached from iteration 0.
Feature-count gating (edge > 10 && surf > 100, ref :1410) freezes the pose
when the scan is too sparse, like the reference's warning path.

The whole function is vmap-able over a batch of (scan features, local map,
initial pose) tuples and shard_map-able over a device mesh — this is the
`batch_register` axis of BASELINE.json's throughput target.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Params
from ..geom.se3 import euler_to_rot, quat_from_euler, quat_slerp, euler_from_quat
from ..pipeline.cloud_info import FeatureMap, ScanFeatures
from .correspondence import (corner_correspondence, corner_correspondence_cand,
                             surf_correspondence, surf_correspondence_cand)
from .knn import _extract_topk, knn, make_local_knn
from .solver import GNState, gn_step


class RegisterResult(NamedTuple):
    pose6: jnp.ndarray         # f32 [6] optimized pose
    converged: jnp.ndarray     # bool []
    iterations: jnp.ndarray    # i32 []
    n_corr: jnp.ndarray        # i32 [] correspondences in the final iteration
    is_degenerate: jnp.ndarray  # bool []
    valid: jnp.ndarray         # bool [] feature-count gate passed


def register_core(
    features: ScanFeatures,
    corner_knn,
    surf_knn,
    init_pose6,
    *,
    max_iterations: int = 30,
    min_correspondences: int = 50,
    eigen_threshold: float = 100.0,
    edge_min_valid: int = 10,
    surf_min_valid: int = 100,
    converge_rot_deg: float = 0.05,
    converge_trans_cm: float = 0.05,
    vary=0.0,
) -> RegisterResult:
    """LOAM scan-to-map Gauss-Newton solve with pluggable neighbor search.

    corner_knn / surf_knn: q [N,3] -> (d2 [N,5], nn [N,5,3]); either the
    single-device streamed search (make_local_knn) or a map-sharded SPMD
    search that merges per-shard top-5 candidates with collectives.
    Trace inside jit/shard_map; not itself jitted.
    """
    n_edge = jnp.sum(features.corner_mask).astype(jnp.int32)
    n_surf = jnp.sum(features.surf_mask).astype(jnp.int32)
    gate = (n_edge > edge_min_valid) & (n_surf > surf_min_valid)  # ref :1410

    # `vary` ties constant-initialized carry fields to the (possibly sharded)
    # inputs so while_loop's varying-manual-axes check passes under shard_map.
    # Callers running with a sharded map must fold a map-varying zero into
    # `vary` (see map_sharded_register).
    pose0 = jnp.asarray(init_pose6, jnp.float32) + vary
    vary = pose0.sum() * 0.0
    init = GNState(
        pose6=pose0,
        matP=jnp.eye(6, dtype=jnp.float32) + vary,
        is_degenerate=vary > 1.0,
        converged=vary > 1.0,
        n_corr=vary.astype(jnp.int32),
    )

    it0 = jnp.asarray(0, jnp.int32) + vary.astype(jnp.int32)

    def cond(carry):
        it, state = carry
        return (it < max_iterations) & ~state.converged & gate

    def body(carry):
        it, state = carry
        pose = state.pose6
        R = euler_to_rot(pose[0], pose[1], pose[2])
        t = pose[3:6]

        prec = jax.lax.Precision.HIGHEST
        corner_w = jnp.dot(features.corner_xyz, R.T, precision=prec) + t
        surf_w = jnp.dot(features.surf_xyz, R.T, precision=prec) + t

        c_coeff, c_resid, c_mask = corner_correspondence(
            corner_w, features.corner_mask, corner_knn)
        s_coeff, s_resid, s_mask = surf_correspondence(
            surf_w, features.surf_mask, surf_knn)

        pts = jnp.concatenate([features.corner_xyz, features.surf_xyz], axis=0)
        coeff = jnp.concatenate([c_coeff, s_coeff], axis=0)
        resid = jnp.concatenate([c_resid, s_resid], axis=0)
        mask = jnp.concatenate([c_mask, s_mask], axis=0)

        state = gn_step(
            state, pts, coeff, resid, mask, it,
            min_correspondences=min_correspondences,
            eigen_threshold=eigen_threshold,
            converge_rot_deg=converge_rot_deg,
            converge_trans_cm=converge_trans_cm,
        )
        return (it + 1, state)

    it, state = lax.while_loop(cond, body, (it0, init))

    return RegisterResult(
        pose6=state.pose6,
        converged=state.converged,
        iterations=it,
        n_corr=state.n_corr,
        is_degenerate=state.is_degenerate,
        valid=gate,
    )


@partial(jax.jit, static_argnames=(
    "max_iterations", "min_correspondences", "eigen_threshold",
    "edge_min_valid", "surf_min_valid", "chunk",
    "converge_rot_deg", "converge_trans_cm"))
def register_scan(
    features: ScanFeatures,
    local_map: FeatureMap,
    init_pose6,
    *,
    max_iterations: int = 30,
    min_correspondences: int = 50,
    eigen_threshold: float = 100.0,
    edge_min_valid: int = 10,
    surf_min_valid: int = 100,
    chunk: int = 4096,
    converge_rot_deg: float = 0.05,
    converge_trans_cm: float = 0.05,
) -> RegisterResult:
    """Single-device scan-to-map solve (scan2MapOptimization equivalent).

    features: (already downsampled) corner/surf sets in the lidar frame;
    local_map: padded corner/surf map in the world frame;
    init_pose6: [6] (roll,pitch,yaw,x,y,z) initial guess.
    """
    return register_core(
        features,
        make_local_knn(local_map.corner_xyz, local_map.corner_mask, chunk),
        make_local_knn(local_map.surf_xyz, local_map.surf_mask, chunk),
        init_pose6,
        max_iterations=max_iterations,
        min_correspondences=min_correspondences,
        eigen_threshold=eigen_threshold,
        edge_min_valid=edge_min_valid,
        surf_min_valid=surf_min_valid,
        converge_rot_deg=converge_rot_deg,
        converge_trans_cm=converge_trans_cm,
    )


def transform_update(pose6, imu_rpy_init, imu_available,
                     imu_weight: float = 0.05,
                     rotation_tolerance: float = 1000.0,
                     z_tolerance: float = 1000.0):
    """IMU attitude slerp fusion + clamp epilogue
    (transformUpdate/constraintTransformation, ref: src/mapOptmization.h:
    1444-1489): when IMU attitude is available and |pitch| < 1.4 rad, slerp
    roll and pitch toward it with weight 0.05, then clamp roll/pitch/z."""
    pose6 = jnp.asarray(pose6, jnp.float32)
    use = imu_available & (jnp.abs(imu_rpy_init[1]) < 1.4)

    zero = jnp.zeros((), jnp.float32)
    q_tr = quat_from_euler(pose6[0], zero, zero)
    q_imu = quat_from_euler(imu_rpy_init[0], zero, zero)
    roll_mid, _, _ = euler_from_quat(quat_slerp(q_tr, q_imu, imu_weight))

    q_tp = quat_from_euler(zero, pose6[1], zero)
    q_ip = quat_from_euler(zero, imu_rpy_init[1], zero)
    _, pitch_mid, _ = euler_from_quat(quat_slerp(q_tp, q_ip, imu_weight))

    roll = jnp.where(use, roll_mid, pose6[0])
    pitch = jnp.where(use, pitch_mid, pose6[1])

    roll = jnp.clip(roll, -rotation_tolerance, rotation_tolerance)
    pitch = jnp.clip(pitch, -rotation_tolerance, rotation_tolerance)
    z = jnp.clip(pose6[5], -z_tolerance, z_tolerance)
    return pose6.at[0].set(roll).at[1].set(pitch).at[5].set(z)


def register_scan_with_params(params: Params, features: ScanFeatures,
                              local_map: FeatureMap, init_pose6,
                              imu_rpy_init=None, imu_available=None
                              ) -> RegisterResult:
    """Parameterized wrapper wiring Params thresholds + IMU fusion epilogue."""
    res = register_scan(
        features, local_map, init_pose6,
        max_iterations=params.max_gn_iterations,
        min_correspondences=params.min_correspondences,
        eigen_threshold=params.degeneracy_eigen_threshold,
        edge_min_valid=params.edge_feature_min_valid_num,
        surf_min_valid=params.surf_feature_min_valid_num,
        chunk=params.knn_chunk,
        converge_rot_deg=params.converge_delta_rot_deg,
        converge_trans_cm=params.converge_delta_trans_cm,
    )
    if imu_rpy_init is not None:
        pose = transform_update(
            res.pose6, imu_rpy_init,
            imu_available if imu_available is not None else jnp.asarray(True),
            imu_weight=params.imu_attitude_weight,
            rotation_tolerance=params.rotation_tolerance,
            z_tolerance=params.z_tolerance,
        )
        # the epilogue only applies when the solver actually ran (ref :1438)
        pose = jnp.where(res.valid, pose, res.pose6)
        res = res._replace(pose6=pose)
    return res


def prefetch_candidates(query_w, ref, ref_mask, K: int, chunk: int):
    """One streamed pass over the map: K nearest candidates per query.

    The GN loop then searches 5-NN *within* these candidates instead of
    re-streaming the whole map every iteration (the reference rebuilds no
    KD-tree mid-solve either — the map is fixed; only the query pose moves,
    and it moves by centimeters per iteration).
    """
    d2, idx = knn(query_w, ref, ref_mask, k=K, chunk=chunk)
    cand = ref[idx]                       # [Q,K,3]
    valid = d2 < 1e37
    return cand, valid


def make_candidate_knn(cand_xyz, cand_valid):
    """knn closure over a per-query candidate set [Q,K,3]."""

    def f(q):
        diff = q[:, None, :] - cand_xyz
        d2 = jnp.sum(diff * diff, -1)
        d2 = jnp.where(cand_valid, d2, jnp.float32(3e38))
        vals, pos = _extract_topk(d2, 5)
        nn = jnp.take_along_axis(cand_xyz, pos[..., None], axis=1)
        return vals, nn

    return f


@partial(jax.jit, static_argnames=(
    "max_iterations", "min_correspondences", "eigen_threshold",
    "edge_min_valid", "surf_min_valid", "chunk", "num_candidates",
    "converge_rot_deg", "converge_trans_cm", "refetch_dist"))
def register_scan_fast(
    features: ScanFeatures,
    local_map: FeatureMap,
    init_pose6,
    *,
    max_iterations: int = 30,
    min_correspondences: int = 50,
    eigen_threshold: float = 100.0,
    edge_min_valid: int = 10,
    surf_min_valid: int = 100,
    chunk: int = 4096,
    num_candidates: int = 16,
    refetch_dist: float = 0.15,
    converge_rot_deg: float = 0.05,
    converge_trans_cm: float = 0.05,
) -> RegisterResult:
    """Candidate-prefetch scan-to-map solve (the production hot path).

    Identical math to register_scan except neighbor search: the K nearest
    map candidates per feature are fetched once at the initial pose (and
    re-fetched if the solve travels more than `refetch_dist` meters from the
    fetch pose), and each GN iteration takes its 5-NN from those candidates.
    Exact whenever the true 5-NN stays within the K-candidate neighborhood —
    validated against register_scan in tests (equal poses to ~1e-4).
    """
    n_edge = jnp.sum(features.corner_mask).astype(jnp.int32)
    n_surf = jnp.sum(features.surf_mask).astype(jnp.int32)
    gate = (n_edge > edge_min_valid) & (n_surf > surf_min_valid)

    pose0 = jnp.asarray(init_pose6, jnp.float32)
    vary = pose0.sum() * 0.0
    K = num_candidates

    def fetch(pose):
        R = euler_to_rot(pose[0], pose[1], pose[2])
        t = pose[3:6]
        prec = jax.lax.Precision.HIGHEST
        corner_w = jnp.dot(features.corner_xyz, R.T, precision=prec) + t
        surf_w = jnp.dot(features.surf_xyz, R.T, precision=prec) + t
        cc, ccv = prefetch_candidates(corner_w, local_map.corner_xyz,
                                      local_map.corner_mask, K, chunk)
        sc, scv = prefetch_candidates(surf_w, local_map.surf_xyz,
                                      local_map.surf_mask, K, chunk)
        return cc, ccv, sc, scv, pose[3:6]

    cands0 = fetch(pose0)

    init = GNState(
        pose6=pose0,
        matP=jnp.eye(6, dtype=jnp.float32) + vary,
        is_degenerate=vary > 1.0,
        converged=vary > 1.0,
        n_corr=vary.astype(jnp.int32),
    )
    it0 = jnp.asarray(0, jnp.int32) + vary.astype(jnp.int32)

    def cond_fn(carry):
        it, state, _ = carry
        return (it < max_iterations) & ~state.converged & gate

    def body(carry):
        it, state, cands = carry
        pose = state.pose6
        moved = jnp.linalg.norm(pose[3:6] - cands[4]) > refetch_dist
        cands = lax.cond(moved, lambda: fetch(pose), lambda: cands)
        cc, ccv, sc, scv, _ = cands

        R = euler_to_rot(pose[0], pose[1], pose[2])
        t = pose[3:6]
        prec = jax.lax.Precision.HIGHEST
        corner_w = jnp.dot(features.corner_xyz, R.T, precision=prec) + t
        surf_w = jnp.dot(features.surf_xyz, R.T, precision=prec) + t

        c_coeff, c_resid, c_mask = corner_correspondence_cand(
            corner_w, features.corner_mask, cc, ccv)
        s_coeff, s_resid, s_mask = surf_correspondence_cand(
            surf_w, features.surf_mask, sc, scv)

        pts = jnp.concatenate([features.corner_xyz, features.surf_xyz], axis=0)
        coeff = jnp.concatenate([c_coeff, s_coeff], axis=0)
        resid = jnp.concatenate([c_resid, s_resid], axis=0)
        mask = jnp.concatenate([c_mask, s_mask], axis=0)

        state = gn_step(
            state, pts, coeff, resid, mask, it,
            min_correspondences=min_correspondences,
            eigen_threshold=eigen_threshold,
            converge_rot_deg=converge_rot_deg,
            converge_trans_cm=converge_trans_cm,
        )
        return (it + 1, state, cands)

    it, state, _ = lax.while_loop(cond_fn, body, (it0, init, cands0))

    return RegisterResult(
        pose6=state.pose6,
        converged=state.converged,
        iterations=it,
        n_corr=state.n_corr,
        is_degenerate=state.is_degenerate,
        valid=gate,
    )


def register_grid_core(
    features: ScanFeatures,
    local_map: FeatureMap,
    corner_grid_table,
    surf_grid_table,
    grid_origin_xyz,
    init_pose6,
    *,
    grid_dims,
    cell_size: float = 1.0,
    cell_cap: int = 16,
    max_iterations: int = 30,
    min_correspondences: int = 50,
    eigen_threshold: float = 100.0,
    edge_min_valid: int = 10,
    surf_min_valid: int = 100,
    converge_rot_deg: float = 0.05,
    converge_trans_cm: float = 0.05,
) -> RegisterResult:
    """Scan-to-map solve with hash-grid neighbor search (fastest exact path).

    Takes PACKED coordinate tables (ops.hashgrid.build_grid_packed), built
    once per local map and amortized across every scan and GN iteration
    registered against that map.  Exact w.r.t. register_scan for all gated
    correspondences (the 27-cell neighborhood covers the 1 m accept radius).
    Not itself jitted — trace inside an outer jit (grid_register_step is the
    jitted entry point shared by both pipelines).
    """
    from .hashgrid import make_packed_grid_knn

    return register_core(
        features,
        make_packed_grid_knn(corner_grid_table, grid_origin_xyz, cell_size,
                             dims=grid_dims, cell_cap=cell_cap),
        make_packed_grid_knn(surf_grid_table, grid_origin_xyz, cell_size,
                             dims=grid_dims, cell_cap=cell_cap),
        init_pose6,
        max_iterations=max_iterations,
        min_correspondences=min_correspondences,
        eigen_threshold=eigen_threshold,
        edge_min_valid=edge_min_valid,
        surf_min_valid=surf_min_valid,
        converge_rot_deg=converge_rot_deg,
        converge_trans_cm=converge_trans_cm,
    )


@partial(jax.jit, static_argnames=(
    "max_iterations", "min_correspondences", "eigen_threshold",
    "edge_min_valid", "surf_min_valid", "cell_cap", "cell_size",
    "num_candidates", "refetch_dist", "converge_rot_deg",
    "converge_trans_cm", "grid_dims"))
def register_scan_fast_grid(
    features: ScanFeatures,
    local_map: FeatureMap,
    corner_grid_table,
    surf_grid_table,
    grid_origin_xyz,
    init_pose6,
    *,
    grid_dims,
    cell_size: float = 1.0,
    cell_cap: int = 16,
    num_candidates: int = 16,
    refetch_dist: float = 0.15,
    max_iterations: int = 30,
    min_correspondences: int = 50,
    eigen_threshold: float = 100.0,
    edge_min_valid: int = 10,
    surf_min_valid: int = 100,
    converge_rot_deg: float = 0.05,
    converge_trans_cm: float = 0.05,
) -> RegisterResult:
    """Hash-grid candidate prefetch + in-candidate 5-NN: the hot path.

    Per solve: one 27-cell gather fetches K candidates per feature; each GN
    iteration searches 5-NN within those K (re-fetched whenever the pose
    travels > refetch_dist from the fetch point).  Combines the grid's O(1)
    lookup with the prefetch path's tiny per-iteration footprint; matches
    register_scan to sub-mm (tests).
    """
    from .hashgrid import make_packed_grid_knn

    corner_gknn = make_packed_grid_knn(corner_grid_table, grid_origin_xyz,
                                       cell_size, dims=grid_dims,
                                       cell_cap=cell_cap, k=num_candidates)
    surf_gknn = make_packed_grid_knn(surf_grid_table, grid_origin_xyz,
                                     cell_size, dims=grid_dims,
                                     cell_cap=cell_cap, k=num_candidates)

    n_edge = jnp.sum(features.corner_mask).astype(jnp.int32)
    n_surf = jnp.sum(features.surf_mask).astype(jnp.int32)
    gate = (n_edge > edge_min_valid) & (n_surf > surf_min_valid)

    pose0 = jnp.asarray(init_pose6, jnp.float32)
    vary = pose0.sum() * 0.0
    K = num_candidates

    def fetch(pose):
        R = euler_to_rot(pose[0], pose[1], pose[2])
        t = pose[3:6]
        prec = jax.lax.Precision.HIGHEST
        corner_w = jnp.dot(features.corner_xyz, R.T, precision=prec) + t
        surf_w = jnp.dot(features.surf_xyz, R.T, precision=prec) + t
        cd, cnn = corner_gknn(corner_w)
        sd, snn = surf_gknn(surf_w)
        return cnn, cd < 1e37, snn, sd < 1e37, pose[3:6]

    cands0 = fetch(pose0)

    init = GNState(
        pose6=pose0,
        matP=jnp.eye(6, dtype=jnp.float32) + vary,
        is_degenerate=vary > 1.0,
        converged=vary > 1.0,
        n_corr=vary.astype(jnp.int32),
    )
    it0 = jnp.asarray(0, jnp.int32) + vary.astype(jnp.int32)

    def cond_fn(carry):
        it, state, _ = carry
        return (it < max_iterations) & ~state.converged & gate

    def body(carry):
        it, state, cands = carry
        pose = state.pose6
        moved = jnp.linalg.norm(pose[3:6] - cands[4]) > refetch_dist
        cands = lax.cond(moved, lambda: fetch(pose), lambda: cands)
        cc, ccv, sc, scv, _ = cands

        R = euler_to_rot(pose[0], pose[1], pose[2])
        t = pose[3:6]
        prec = jax.lax.Precision.HIGHEST
        corner_w = jnp.dot(features.corner_xyz, R.T, precision=prec) + t
        surf_w = jnp.dot(features.surf_xyz, R.T, precision=prec) + t

        c_coeff, c_resid, c_mask = corner_correspondence_cand(
            corner_w, features.corner_mask, cc, ccv)
        s_coeff, s_resid, s_mask = surf_correspondence_cand(
            surf_w, features.surf_mask, sc, scv)

        pts = jnp.concatenate([features.corner_xyz, features.surf_xyz], axis=0)
        coeff = jnp.concatenate([c_coeff, s_coeff], axis=0)
        resid = jnp.concatenate([c_resid, s_resid], axis=0)
        mask = jnp.concatenate([c_mask, s_mask], axis=0)

        state = gn_step(
            state, pts, coeff, resid, mask, it,
            min_correspondences=min_correspondences,
            eigen_threshold=eigen_threshold,
            converge_rot_deg=converge_rot_deg,
            converge_trans_cm=converge_trans_cm,
        )
        return (it + 1, state, cands)

    it, state, _ = lax.while_loop(cond_fn, body, (it0, init, cands0))

    return RegisterResult(
        pose6=state.pose6,
        converged=state.converged,
        iterations=it,
        n_corr=state.n_corr,
        is_degenerate=state.is_degenerate,
        valid=gate,
    )


@partial(jax.jit, static_argnames=("half_extent", "cell_size",
                                   "corner_cell_cap", "surf_cell_cap",
                                   "max_iterations", "min_correspondences",
                                   "edge_min_valid", "surf_min_valid",
                                   "min_plane_spread"))
def grid_register_step(local_map: FeatureMap, features: ScanFeatures, pose6,
                       *, half_extent, cell_size: float = 2.0,
                       corner_cell_cap: int = 16, surf_cell_cap: int = 64,
                       max_iterations: int = 30,
                       min_correspondences: int = 50, edge_min_valid: int = 10,
                       surf_min_valid: int = 100,
                       min_plane_spread: float = 0.0) -> RegisterResult:
    """Hash-grid build + scan-to-map solve as ONE jitted step.

    The single registration entry point shared by the localization and SLAM
    pipelines (one executable per half_extent, one compile).  The grid spans
    pose +- half_extent; the caller must size it so every map point that
    could hold a correspondence is inside the box: the localization path
    both pipelines pass register_grid_half_extent, which covers the
    surrounding-keyframe radius (ref src/mapOptmization.h:872, the
    reference's SLAM path KD-searches the full surrounding map) and
    strictly contains the localization crop box (ref :286, nothing exists
    outside it) — one box, one compiled executable.

    History note: this function used to trip a once-per-process
    INVALID_ARGUMENT ("Execution supplied 9 buffers but compiled program
    expected 17") when traced after other registration code had run.  The
    cause was NOT here: the lazy in-function `from .hashgrid import` below
    means hashgrid can be first-imported INSIDE a jit trace, and hashgrid's
    module-level scalars, when built with jnp, were created as tracers and
    leaked into every later trace as lifted constants.  Fixed by making
    those module constants numpy (ops/hashgrid.py _BIG/_FAR).
    """
    from .hashgrid import (build_grid_sentinel_core, default_grid_spec,
                           grid_origin)

    he = jnp.asarray(half_extent, jnp.float32)
    dims = default_grid_spec(half_extent, cell_size)
    origin = grid_origin(pose6[3:6], he)
    from .hashgrid import make_oct_sentinel_knn

    ctab = build_grid_sentinel_core(local_map.corner_xyz,
                                    local_map.corner_mask, origin, cell_size,
                                    dims=dims, cell_cap=corner_cell_cap)
    stab = build_grid_sentinel_core(local_map.surf_xyz, local_map.surf_mask,
                                    origin, cell_size, dims=dims,
                                    cell_cap=surf_cell_cap)
    iters_per_round = 10
    num_rounds = max(1, (max_iterations + iters_per_round - 1)
                     // iters_per_round)
    return register_rounds_core(
        features,
        make_oct_sentinel_knn(ctab, origin, cell_size, dims=dims,
                              cell_cap=corner_cell_cap, k=16),
        make_oct_sentinel_knn(stab, origin, cell_size, dims=dims,
                              cell_cap=surf_cell_cap, k=16),
        pose6,
        num_rounds=num_rounds,
        iters_per_round=iters_per_round,
        min_correspondences=min_correspondences,
        edge_min_valid=edge_min_valid,
        surf_min_valid=surf_min_valid,
        min_plane_spread=min_plane_spread,
    )


def register_rounds_core(
    features: ScanFeatures,
    corner_fetch,
    surf_fetch,
    init_pose6,
    *,
    num_rounds: int = 3,
    iters_per_round: int = 10,
    min_correspondences: int = 50,
    eigen_threshold: float = 100.0,
    edge_min_valid: int = 10,
    surf_min_valid: int = 100,
    converge_rot_deg: float = 0.05,
    converge_trans_cm: float = 0.05,
    min_plane_spread: float = 0.0,
    vary=0.0,
) -> RegisterResult:
    """Rounds-structured solve: (prefetch K candidates -> I candidate-GN
    iterations) x R, unconditionally.

    Under vmap, a data-dependent refetch (lax.cond) executes its expensive
    branch for the whole batch every iteration; fixed rounds fetch exactly R
    times.  R*I defaults to the reference's 30-iteration budget; candidates
    are refreshed every I iterations (GN steps shrink fast, so the round-
    boundary refetch keeps the 5-NN within the candidate neighborhood —
    parity with register_scan validated in tests).

    corner_fetch/surf_fetch: (pts_world) -> (cand_d2 [N,K], cand_nn [N,K,3]).
    """
    n_edge = jnp.sum(features.corner_mask).astype(jnp.int32)
    n_surf = jnp.sum(features.surf_mask).astype(jnp.int32)
    gate = (n_edge > edge_min_valid) & (n_surf > surf_min_valid)

    # `vary` ties constant-initialized carry fields to (possibly sharded)
    # inputs so the loop's varying-manual-axes check passes under shard_map
    # with map-sharded fetch closures (see parallel/map_sharded.py).
    pose0 = jnp.asarray(init_pose6, jnp.float32) + vary
    vary = pose0.sum() * 0.0
    init = GNState(
        pose6=pose0,
        matP=jnp.eye(6, dtype=jnp.float32) + vary,
        is_degenerate=vary > 1.0,
        converged=vary > 1.0,
        n_corr=vary.astype(jnp.int32),
    )
    it0 = jnp.asarray(0, jnp.int32) + vary.astype(jnp.int32)
    prec = jax.lax.Precision.HIGHEST
    pts_all = jnp.concatenate([features.corner_xyz, features.surf_xyz], axis=0)

    def transform(pose):
        R = euler_to_rot(pose[0], pose[1], pose[2])
        t = pose[3:6]
        return (jnp.dot(features.corner_xyz, R.T, precision=prec) + t,
                jnp.dot(features.surf_xyz, R.T, precision=prec) + t)

    def round_body(carry, _):
        it, state = carry
        # a fresh candidate set invalidates the convergence claim: the
        # reference's convergence is w.r.t. the full map, so each round must
        # re-verify (a truly-converged lane exits after one cheap iteration)
        state = state._replace(converged=state.converged & False)
        corner_w, surf_w = transform(state.pose6)
        cd, cnn = corner_fetch(corner_w)
        sd, snn = surf_fetch(surf_w)
        ccv = cd < 1e37
        scv = sd < 1e37

        def iter_cond(c):
            it, state = c
            return (it < (iters_per_round + 0 * it)) & ~state.converged & gate

        def iter_body(c):
            it_in, state = c
            corner_w, surf_w = transform(state.pose6)
            c_coeff, c_resid, c_mask = corner_correspondence_cand(
                corner_w, features.corner_mask, cnn, ccv)
            s_coeff, s_resid, s_mask = surf_correspondence_cand(
                surf_w, features.surf_mask, snn, scv,
                min_plane_spread=min_plane_spread)
            coeff = jnp.concatenate([c_coeff, s_coeff], axis=0)
            resid = jnp.concatenate([c_resid, s_resid], axis=0)
            mask = jnp.concatenate([c_mask, s_mask], axis=0)
            state = gn_step(
                state, pts_all, coeff, resid, mask, it + it_in,
                min_correspondences=min_correspondences,
                eigen_threshold=eigen_threshold,
                converge_rot_deg=converge_rot_deg,
                converge_trans_cm=converge_trans_cm,
            )
            return (it_in + 1, state)

        done, state = lax.while_loop(iter_cond, iter_body,
                                     (it0 * 0, state))
        return (it + done, state), None

    (it, state), _ = lax.scan(round_body, (it0, init), None,
                              length=num_rounds)
    return RegisterResult(
        pose6=state.pose6,
        converged=state.converged,
        iterations=it,
        n_corr=state.n_corr,
        is_degenerate=state.is_degenerate,
        valid=gate,
    )
