"""Voxel-grid centroid downsampling as a fixed-capacity sort/segment kernel.

Replaces pcl::VoxelGrid (used for scan + map downsampling, ref:
src/mapOptmization.h:190-193,981-993 and per-ring surface thinning,
src/featureExtraction.h:288-292).  PCL bins points at ijk = floor(p/leaf)
and emits per-voxel centroids; order-independent, so a lexsort + segment-mean
reproduces it exactly up to float summation order (SURVEY.md §7 "voxel filter
parity": tolerance, not bit-parity).

Fixed shapes: input [N,3]+mask, output [cap,3]+mask.  Voxels beyond `cap`
are dropped deterministically (smallest keys first).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_KEY_MAX = jnp.int32(2**30)


@partial(jax.jit, static_argnames=("cap",))
def _voxel_impl(pts, mask, inv_leaf, cap):
    n = pts.shape[0]
    ijk = jnp.floor(pts * inv_leaf).astype(jnp.int32)  # PCL floor semantics
    kx = jnp.where(mask, ijk[:, 0], _KEY_MAX)
    ky = jnp.where(mask, ijk[:, 1], _KEY_MAX)
    kz = jnp.where(mask, ijk[:, 2], _KEY_MAX)

    # Lexicographic sort by (kx, ky, kz); invalids sort last.
    order = jnp.lexsort((kz, ky, kx))
    sx, sy, sz = kx[order], ky[order], kz[order]
    sp = pts[order]
    sm = mask[order]

    same = jnp.concatenate(
        [
            jnp.zeros((1,), bool),
            (sx[1:] == sx[:-1]) & (sy[1:] == sy[:-1]) & (sz[1:] == sz[:-1]),
        ]
    )
    is_new = sm & ~same
    voxel_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    voxel_id = jnp.where(sm, voxel_id, cap)  # invalid -> dropped
    voxel_id = jnp.minimum(voxel_id, cap)    # overflow voxels dropped

    sums = jnp.zeros((cap + 1, 3), pts.dtype).at[voxel_id].add(
        jnp.where(sm[:, None], sp, 0.0)
    )[:cap]
    counts = jnp.zeros((cap + 1,), jnp.float32).at[voxel_id].add(
        sm.astype(jnp.float32)
    )[:cap]

    out_mask = counts > 0
    out = sums / jnp.maximum(counts, 1.0)[:, None]
    out = jnp.where(out_mask[:, None], out, 0.0)
    return out, out_mask, jnp.sum(out_mask).astype(jnp.int32)


def voxel_downsample(pts, mask, leaf_size, cap: int):
    """Centroid voxel filter.  Returns (centroids [cap,3], mask [cap], count)."""
    inv = jnp.asarray(1.0, jnp.float32) / jnp.asarray(leaf_size, jnp.float32)
    return _voxel_impl(pts, mask, inv, cap)
