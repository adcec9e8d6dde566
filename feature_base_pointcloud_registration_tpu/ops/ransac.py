"""RANSAC rigid alignment from descriptor correspondences (SAC-IA style).

Coarse initialization for registration without a pose prior (BASELINE
config 3: FPFH matching + RANSAC, then ICP refinement).  TPU formulation:
all hypotheses run in parallel — sample [H, 3] correspondence triplets,
solve H Kabsch problems batched, score all H transforms against all N
matches at once, pick the argmax.  No loops, no early exit: H is the budget.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom.se3 import kabsch

_PREC = jax.lax.Precision.HIGHEST


class RansacResult(NamedTuple):
    transform: jnp.ndarray   # f32 [4,4] src -> dst
    inliers: jnp.ndarray     # i32 [] inlier count of the winner
    inlier_ratio: jnp.ndarray  # f32 []


@partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_align(key, src_pts, dst_pts, corr_valid, *,
                 num_hypotheses: int = 512,
                 inlier_threshold: float = 0.5) -> RansacResult:
    """Estimate the rigid transform from putative correspondences.

    src_pts [N,3] <-> dst_pts [N,3] (row-aligned matches, e.g. from
    match_descriptors); corr_valid [N] masks bad matches.
    """
    N = src_pts.shape[0]
    H = num_hypotheses

    # sample triplets biased to valid correspondences
    logits = jnp.where(corr_valid, 0.0, -1e9)
    samples = jax.random.categorical(
        key, logits[None, :].repeat(H * 3, 0)).reshape(H, 3)

    tri_src = src_pts[samples]            # [H,3,3]
    tri_dst = dst_pts[samples]
    T = kabsch(tri_src, tri_dst)          # [H,4,4]

    src_t = jnp.einsum("hij,nj->hni", T[:, :3, :3], src_pts,
                       precision=_PREC) + T[:, None, :3, 3]
    d2 = jnp.sum((src_t - dst_pts[None]) ** 2, -1)          # [H,N]
    inlier = (d2 < inlier_threshold ** 2) & corr_valid[None, :]
    counts = jnp.sum(inlier, axis=1)
    best = jnp.argmax(counts)

    # refine the winner with all its inliers (one weighted Kabsch)
    w = inlier[best].astype(jnp.float32)
    T_ref = kabsch(src_pts, dst_pts, weights=w)
    src_r = jnp.einsum("ij,nj->ni", T_ref[:3, :3], src_pts,
                       precision=_PREC) + T_ref[:3, 3]
    d2r = jnp.sum((src_r - dst_pts) ** 2, -1)
    inl_r = jnp.sum((d2r < inlier_threshold ** 2) & corr_valid)
    n_valid = jnp.maximum(jnp.sum(corr_valid), 1)
    return RansacResult(
        transform=T_ref,
        inliers=inl_r.astype(jnp.int32),
        inlier_ratio=inl_r / n_valid,
    )


def coarse_align_fpfh(key, src_pts, src_mask, dst_pts, dst_mask, *,
                      k: int = 16, chunk: int = 2048,
                      num_hypotheses: int = 512,
                      inlier_threshold: float = 0.5) -> RansacResult:
    """FPFH match + RANSAC in one call (feeds icp_align for refinement)."""
    from .fpfh import fpfh, match_descriptors

    sd, sv = fpfh(src_pts, src_mask, k=k, chunk=chunk)
    dd, dv = fpfh(dst_pts, dst_mask, k=k, chunk=chunk)
    midx, sim = match_descriptors(sd, sv, dd, dv)
    corr_valid = sv & (sim > -jnp.inf)
    return ransac_align(key, src_pts, dst_pts[midx], corr_valid,
                        num_hypotheses=num_hypotheses,
                        inlier_threshold=inlier_threshold)
