"""Axis-aligned box crop with fixed-capacity compaction.

Replaces pcl::CropBox in the localization path: the local map is the global
feature map cropped to pose +-(30, 30, 10) m (ref: src/mapOptmization.h:
283-304).  A boolean mask + stable compaction keeps input order like CropBox.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("cap",))
def crop_box(pts, mask, center, half_extent, cap: int):
    """Select masked points with |p - center| <= half_extent per axis.

    pts: [N,3]; mask: [N]; center: [3]; half_extent: [3] (static-ish array).
    Returns (out [cap,3], out_mask [cap], count) — first `cap` hits in input
    order; overflow dropped (count reports pre-drop total).
    """
    lo = center - half_extent
    hi = center + half_extent
    inside = mask & jnp.all((pts >= lo) & (pts <= hi), axis=-1)
    order = jnp.argsort(~inside, stable=True)[:cap]
    m = inside[order]
    out = jnp.where(m[:, None], pts[order], 0.0)
    return out, m, jnp.sum(inside).astype(jnp.int32)
