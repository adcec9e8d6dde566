"""2-D (data x map) sharded registration — model parallelism for giant maps.

When the cropped/global feature map exceeds one chip's HBM (city-scale
offline mapping), shard the *map* across devices: each device streams only
its map shard through the distance kernel, produces a local top-5 candidate
set per query, and the candidates (coordinates, not indices) are merged with
an all_gather over the `map` axis — a tiny [Q, 5, 3] collective riding ICI,
instead of moving the map itself.  The scan batch shards over the `data`
axis as usual.

This generalizes the reference's single-machine OpenMP scaling
(SURVEY.md §2 parallelism inventory) to a 2-D TPU mesh.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.knn import knn5_points
from ..ops.register import (RegisterResult, register_core,
                            register_rounds_core)
from ..pipeline.cloud_info import FeatureMap, ScanFeatures


def make_sharded_knn(ref_shard, mask_shard, axis_name: str, chunk: int):
    """knn closure merging per-shard top-5 candidates across `axis_name`."""

    def f(q):
        d2, nn = knn5_points(q, ref_shard, mask_shard, chunk=chunk)  # local
        d_all = lax.all_gather(d2, axis_name)        # [S, Q, 5]
        nn_all = lax.all_gather(nn, axis_name)       # [S, Q, 5, 3]
        S = d_all.shape[0]
        Q = d2.shape[0]
        d_flat = jnp.moveaxis(d_all, 0, 1).reshape(Q, S * 5)
        nn_flat = jnp.moveaxis(nn_all, 0, 1).reshape(Q, S * 5, 3)
        neg_top, pos = lax.top_k(-d_flat, 5)
        nn_top = jnp.take_along_axis(nn_flat, pos[..., None], axis=1)
        return -neg_top, nn_top

    return f


def make_2d_mesh(n_devices: int | None = None, data: int | None = None):
    """Mesh('data','map'): data-parallel scan batch x map-sharded search."""
    import numpy as np

    devs = jax.devices()
    n = n_devices or len(devs)
    if data is None:
        data = 2 if n % 2 == 0 and n >= 4 else 1
    assert n % data == 0
    return Mesh(np.asarray(devs[:n]).reshape(data, n // data), ("data", "map"))


def map_sharded_register(mesh: Mesh, features: ScanFeatures,
                         local_map: FeatureMap, init_poses, *,
                         chunk: int = 1024, max_iterations: int = 30,
                         min_correspondences: int = 50,
                         edge_min_valid: int = 10, surf_min_valid: int = 100):
    """Registration over a ('data','map') mesh.

    features/init_poses: batch-leading [B, ...], B divisible by mesh 'data';
    local_map: unbatched, point dim divisible by mesh 'map'.
    """

    def local_fn(f, m, p):
        corner_knn = make_sharded_knn(m.corner_xyz, m.corner_mask, "map", chunk)
        surf_knn = make_sharded_knn(m.surf_xyz, m.surf_mask, "map", chunk)

        map_vary = m.corner_xyz[0, 0] * 0.0 + m.surf_xyz[0, 0] * 0.0

        def one(fi, pi):
            return register_core(
                fi, corner_knn, surf_knn, pi,
                max_iterations=max_iterations,
                min_correspondences=min_correspondences,
                edge_min_valid=edge_min_valid,
                surf_min_valid=surf_min_valid,
                vary=map_vary,
            )

        res = jax.vmap(one, in_axes=(0, 0))(f, p)
        # The all_gather merge makes every map-shard compute identical
        # results; fold the (identical) copies with a tiny pmax collective so
        # the vma checker sees true replication over 'map'.
        res = jax.tree.map(
            lambda a: lax.pmax(a.astype(jnp.float32), "map").astype(a.dtype)
            if a.dtype == jnp.bool_ else lax.pmax(a, "map"),
            res)
        n_conv = lax.psum(jnp.sum(res.converged.astype(jnp.int32)), "data")
        return res, {"n_converged": n_conv}

    spec_feats = ScanFeatures(P("data"), P("data"), P("data"), P("data"))
    spec_map = FeatureMap(P("map"), P("map"), P("map"), P("map"))
    out_res = RegisterResult(P("data"), P("data"), P("data"), P("data"),
                             P("data"), P("data"))
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec_feats, spec_map, P("data")),
        out_specs=(out_res, {"n_converged": P()}),
    )
    return jax.jit(fn)(features, local_map, init_poses)

# ---------------------------------------------------------------------------
# Grid-table fast path over the 2-D mesh (round-5): the regime that NEEDS
# map sharding (maps too big for one chip) previously got only the
# brute-force knn5_points verification solver above.  Here each map shard
# holds a FULL-COVERAGE block table built from 1/S of the map points
# (point-striped split), the per-shard fetch is the same one-row-gather
# block fetch the single-chip headline uses, and the K-candidate pools merge
# with an all_gather + top-K over the `map` axis — a [Q, S*K] reduction of
# candidate *coordinates* riding ICI, never the tables themselves.
# Distributed top-K is exact: each shard returns its local K best, and the
# global K best is a subset of the union.  Replaces the KD-searches of
# ref src/mapOptmization.h:1020,1143 at beyond-HBM map scale.
# ---------------------------------------------------------------------------


def build_sharded_block_tables(local_map: FeatureMap, center, half_extent,
                               n_shards: int, *, cell_size: float = 2.0,
                               corner_cell_cap: int = 16,
                               surf_cell_cap: int = 64, margin: float = 2.0):
    """Stripe map points over n_shards and build one block table per shard.

    Returns (corner_tables [S, n_cells+1, W], surf_tables [S, ...], origin,
    dims).  Striding (pts[s::S]) splits every neighborhood evenly, so each
    shard's table holds ~1/S of any cell's density — per-shard cell caps can
    shrink accordingly when memory matters (caps here are per SHARD).
    """
    from ..ops.hashgrid import (build_block_table, build_grid_sentinel,
                                default_grid_spec, grid_origin)

    dims = default_grid_spec(half_extent, cell_size, margin)
    origin = grid_origin(center, half_extent, margin)

    def tables(xyz, mask, cap):
        out = []
        for s in range(n_shards):
            st = build_grid_sentinel(xyz[s::n_shards], mask[s::n_shards],
                                     origin, cell_size, dims=dims,
                                     cell_cap=cap)
            out.append(build_block_table(st, dims=dims, cell_cap=cap))
        return jnp.stack(out)

    ctabs = tables(local_map.corner_xyz, local_map.corner_mask,
                   corner_cell_cap)
    stabs = tables(local_map.surf_xyz, local_map.surf_mask, surf_cell_cap)
    return ctabs, stabs, origin, dims


def make_sharded_block_knn(block_table_shard, origin, cell_size, *,
                           dims, cell_cap, k, axis_name: str):
    """Block-table fetch closure with all_gather + exact top-K merge."""
    from ..ops.hashgrid import make_block_grid_knn

    local = make_block_grid_knn(block_table_shard, origin, cell_size,
                                dims=dims, cell_cap=cell_cap, k=k)

    def f(q):
        d2, nn = local(q)                            # [Q,K], [Q,K,3]
        d_all = lax.all_gather(d2, axis_name)        # [S,Q,K]
        nn_all = lax.all_gather(nn, axis_name)       # [S,Q,K,3]
        S = d_all.shape[0]
        Q = d2.shape[0]
        d_flat = jnp.moveaxis(d_all, 0, 1).reshape(Q, S * k)
        nn_flat = jnp.moveaxis(nn_all, 0, 1).reshape(Q, S * k, 3)
        neg_top, pos = lax.top_k(-d_flat, k)
        nn_top = jnp.take_along_axis(nn_flat, pos[..., None], axis=1)
        return -neg_top, nn_top

    return f


def map_sharded_register_tables(mesh: Mesh, features: ScanFeatures,
                                corner_tables, surf_tables, origin,
                                init_poses, *, grid_dims,
                                cell_size: float = 2.0,
                                corner_cell_cap: int = 16,
                                surf_cell_cap: int = 64,
                                num_rounds: int = 2,
                                iters_per_round: int = 15,
                                num_candidates: int = 8,
                                min_correspondences: int = 50,
                                edge_min_valid: int = 10,
                                surf_min_valid: int = 100,
                                min_plane_spread: float = 0.0):
    """register_rounds_core over a ('data','map') mesh with SHARDED tables.

    features/init_poses: [B, ...] with B divisible by the 'data' axis;
    corner_tables/surf_tables: [S, n_cells+1, W] from
    build_sharded_block_tables with S == the 'map' axis size.  Matches the
    replicated-table batch_register_blocks result (same candidate pools,
    exact distributed top-K) to float-accumulation tolerance.
    """

    def local_fn(f, ct, st, org, p):
        cfetch = make_sharded_block_knn(
            ct[0], org, cell_size, dims=grid_dims, cell_cap=corner_cell_cap,
            k=num_candidates, axis_name="map")
        sfetch = make_sharded_block_knn(
            st[0], org, cell_size, dims=grid_dims, cell_cap=surf_cell_cap,
            k=num_candidates, axis_name="map")

        map_vary = ct[0, 0, 0] * 0.0 + st[0, 0, 0] * 0.0

        def one(fi, pi):
            return register_rounds_core(
                fi, cfetch, sfetch, pi,
                num_rounds=num_rounds, iters_per_round=iters_per_round,
                min_correspondences=min_correspondences,
                edge_min_valid=edge_min_valid,
                surf_min_valid=surf_min_valid,
                min_plane_spread=min_plane_spread,
                vary=map_vary,
            )

        res = jax.vmap(one, in_axes=(0, 0))(f, p)
        # all_gather-merged candidates make every map shard compute identical
        # results; fold the copies with a tiny pmax so the vma checker sees
        # true replication over 'map' (same trick as map_sharded_register).
        res = jax.tree.map(
            lambda a: lax.pmax(a.astype(jnp.float32), "map").astype(a.dtype)
            if a.dtype == jnp.bool_ else lax.pmax(a, "map"),
            res)
        n_conv = lax.psum(jnp.sum(res.converged.astype(jnp.int32)), "data")
        return res, {"n_converged": n_conv}

    spec_feats = ScanFeatures(P("data"), P("data"), P("data"), P("data"))
    out_res = RegisterResult(P("data"), P("data"), P("data"), P("data"),
                             P("data"), P("data"))
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec_feats, P("map"), P("map"), P(), P("data")),
        out_specs=(out_res, {"n_converged": P()}),
    )
    return jax.jit(fn)(features, corner_tables, surf_tables,
                       jnp.asarray(origin), init_poses)
