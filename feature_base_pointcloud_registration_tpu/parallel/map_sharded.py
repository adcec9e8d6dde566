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
from ..ops.register import RegisterResult, register_core
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
