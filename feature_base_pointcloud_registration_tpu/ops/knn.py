"""Batched k-nearest-neighbor search: the KD-tree replacement.

The reference builds FLANN KD-trees over the local map each scan and runs
serial 5-NN queries inside OpenMP loops (ref: src/mapOptmization.h:1020,1143,
1413-1414).  Tree construction and pointer chasing are hostile to TPUs;
instead the map is streamed through the MXU in chunks:

    d2(q, m) = |q|^2 + |m|^2 - 2 q . m^T      (one [Q, C] matmul per chunk)

with a running top-k merge across chunks (lax.scan), so HBM holds only the
padded map and one [Q, C] distance buffer — the moral equivalent of
blockwise attention's online reduction (SURVEY.md §5 "long-context" note).

This brute-force path is the exactness reference and the map-sharded SPMD
building block; the production hot path uses ops.hashgrid (octant lookup).

Returned distances are exact squared distances; padded/masked map points get
+inf and can never enter the top-k (their indices are still in range).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_BIG = np.float32(3.0e38)  # numpy, NOT jnp: module import may happen inside a jit
# trace (lazy in-function imports); a jnp scalar created there is a leaked
# tracer captured as this global forever (the round-3..5 order-dependent
# INVALID_ARGUMENT executable-cache wart).  numpy scalars never trace.


def _extract_topk(d2, k: int):
    """Exact smallest-k per row via k argmin passes.  d2: [Q, C]."""
    Q = d2.shape[0]
    rows = jnp.arange(Q)
    vals, idxs = [], []
    d = d2
    for _ in range(k):
        i = jnp.argmin(d, axis=1)
        v = d[rows, i]
        vals.append(v)
        idxs.append(i)
        d = d.at[rows, i].set(_BIG)
    return jnp.stack(vals, 1), jnp.stack(idxs, 1).astype(jnp.int32)


def _chunk_d2(query, q_norm, pts, msk):
    r_norm = jnp.sum(pts * pts, axis=-1)
    cross = jnp.dot(query, pts.T, precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    d2 = q_norm + r_norm[None, :] - 2.0 * cross
    return jnp.where(msk[None, :], jnp.maximum(d2, 0.0), _BIG)


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(query, ref, ref_mask, k: int = 5, chunk: int = 4096):
    """k-NN of each query point in the masked reference set.

    query: [Q, 3]; ref: [M, 3]; ref_mask: [M] bool.
    Returns (dists2 [Q, k] ascending, idx [Q, k] into ref).
    M must be a multiple of `chunk` (pad the map to its capacity).
    """
    Q = query.shape[0]
    M = ref.shape[0]
    assert M % chunk == 0, f"map capacity {M} not a multiple of chunk {chunk}"
    n_chunks = M // chunk

    # Center on the query centroid: d2 is translation-invariant and smaller
    # magnitudes keep the |q|^2+|m|^2-2qm cancellation accurate in f32.
    center = jnp.mean(query, axis=0)
    query = query - center
    ref = ref - center

    q_norm = jnp.sum(query * query, axis=-1, keepdims=True)  # [Q,1]

    def _exact_topk(d2, kk):
        # lax.top_k: exact, fast on CPU (partial sort) and acceptable on TPU
        # for this verification/fallback path (the hot path uses ops.hashgrid)
        neg, idx = lax.top_k(-d2, kk)
        return -neg, idx.astype(jnp.int32)

    if n_chunks == 1:
        d2 = _chunk_d2(query, q_norm, ref, ref_mask)
        return _exact_topk(d2, k)

    ref_c = ref.reshape(n_chunks, chunk, 3)
    mask_c = ref_mask.reshape(n_chunks, chunk)

    # Tie the initial carry to BOTH inputs so its "varying" axes match the
    # loop output under shard_map (scan-vma rule): query may vary on a data
    # axis, ref on a map axis.
    vary = 0.0 * q_norm + 0.0 * ref[0].sum()
    init_d = jnp.full((Q, k), _BIG, jnp.float32) + vary
    init_i = jnp.zeros((Q, k), jnp.int32) + vary.astype(jnp.int32)

    def body(carry, xs):
        best_d, best_i = carry
        pts, msk, base = xs
        d2 = _chunk_d2(query, q_norm, pts, msk)
        cd, ci = _exact_topk(d2, k)
        ci = ci + base
        # merge running best with this chunk's top-k (2k columns: trivial)
        cand_d = jnp.concatenate([best_d, cd], axis=1)
        cand_i = jnp.concatenate([best_i, ci], axis=1)
        best_d, pos = _extract_topk(cand_d, k)
        best_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return (best_d, best_i), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_d, best_i), _ = lax.scan(body, (init_d, init_i), (ref_c, mask_c, bases))
    return best_d, best_i


def knn5(query, ref, ref_mask, chunk: int = 4096):
    """5-NN (the reference's nearestKSearch(point, 5, ...) everywhere)."""
    return knn(query, ref, ref_mask, k=5, chunk=chunk)


def knn5_points(query, ref, ref_mask, chunk: int = 4096):
    """5-NN returning the neighbor *coordinates* instead of indices.

    This is the interface the correspondence stage actually needs, and it is
    what a map-sharded SPMD search can provide without global indices
    (each device all-gathers its local top-5 candidates' coordinates).
    Returns (d2 [Q,5], nn [Q,5,3]).
    """
    d2, idx = knn(query, ref, ref_mask, k=5, chunk=chunk)
    return d2, ref[idx]


def make_local_knn(ref, ref_mask, chunk: int = 4096):
    """Single-device knn closure for register_core."""
    return lambda q: knn5_points(q, ref, ref_mask, chunk=chunk)
