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

    # Two packed sort keys instead of three: x cells alone (unbounded),
    # y/z cells rebased to the cloud's own minimum and packed 15+15 bits
    # (32767-cell extent per axis, e.g. ~6.5 km at 0.2 m leaf — far past
    # any realistic cloud; beyond that, cells clamp into boundary bins).
    base = jnp.min(jnp.where(mask[:, None], ijk, 2**30), axis=0)
    rel = ijk - base
    k1 = jnp.where(mask, rel[:, 0], _KEY_MAX)
    cy = jnp.clip(rel[:, 1], 0, 32767)
    cz = jnp.clip(rel[:, 2], 0, 32767)
    k2 = (cy << 15) | cz

    # multi-operand sort: xyz+mask ride as payloads — no post-sort gathers
    # (TPU gathers are row-rate-limited and cost more than the sort itself)
    from jax import lax

    sk1, sk2, sx, sy, sz, smf = lax.sort(
        (k1, k2, pts[:, 0], pts[:, 1], pts[:, 2], mask.astype(pts.dtype)),
        num_keys=2, is_stable=False)
    sp = jnp.stack([sx, sy, sz], -1)
    sm = smf > 0

    same = jnp.concatenate(
        [jnp.zeros((1,), bool),
         (sk1[1:] == sk1[:-1]) & (sk2[1:] == sk2[:-1])]
    )
    is_new = sm & ~same
    voxel_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    voxel_id = jnp.where(sm, voxel_id, cap)  # invalid -> dropped
    voxel_id = jnp.minimum(voxel_id, cap)    # overflow voxels dropped

    # One fused scatter-add of [xyz | 1]; voxel_id ascends after the sort,
    # which unlocks XLA's sorted-scatter fast path on TPU.
    vals = jnp.concatenate(
        [jnp.where(sm[:, None], sp, 0.0), sm[:, None].astype(pts.dtype)], -1)
    acc = jnp.zeros((cap + 1, 4), pts.dtype).at[voxel_id].add(
        vals, indices_are_sorted=True)[:cap]
    sums, counts = acc[:, :3], acc[:, 3]

    out_mask = counts > 0
    out = sums / jnp.maximum(counts, 1.0)[:, None]
    out = jnp.where(out_mask[:, None], out, 0.0)
    return out, out_mask, jnp.sum(out_mask).astype(jnp.int32)


def voxel_downsample(pts, mask, leaf_size, cap: int):
    """Centroid voxel filter.  Returns (centroids [cap,3], mask [cap], count)."""
    inv = jnp.asarray(1.0, jnp.float32) / jnp.asarray(leaf_size, jnp.float32)
    return _voxel_impl(pts, mask, inv, cap)
