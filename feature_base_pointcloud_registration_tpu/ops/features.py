"""LOAM edge/planar feature extraction as fixed-shape JAX kernels.

TPU-native rebuild of FeatureExtraction (ref: src/featureExtraction.h):

  * curvature        (calculateSmoothness, ref :109-131) -> an 11-tap shifted
    sum over the flat compacted range array (the reference computes it across
    ring boundaries; so do we),
  * occlusion / parallel-beam masking (markOccludedPoints, ref :134-176) ->
    shifted-array comparisons + mask dilation,
  * per-(ring, sector) curvature sort + greedy picking with +-5 neighbor
    suppression (extractFeatures, ref :178-294) -> per-ring lax.scan over a
    precomputed sorted candidate table, vmapped over rings.  The greedy loop
    is inherently sequential; sectors within a ring are processed in order
    (suppression crosses sector boundaries) while the 16 rings run in
    parallel lanes.  Known deviation from the serial reference: a pick at the
    very first sector slot can suppress at most one point in the *previous*
    ring (ind-5 underruns the ring start by one, ref :236); ring lanes don't
    share state so that single-point spill is dropped.  Tolerance-level, not
    bit-level, parity (SURVEY.md §7).
  * per-ring surface voxel thinning (ref :288-292) -> fixed-capacity voxel
    downsample per ring lane.

The quirk that std::sort's range excludes position `ep` while the pick loops
include it (ref :203 vs :208,245) is reproduced: the element at `ep` keeps
its original slot.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import Params
from ..pipeline.cloud_info import CloudInfo, ScanFeatures
from .voxel import voxel_downsample

_INF = jnp.float32(jnp.inf)


def _curvature_flat(point_range, num_points):
    """diffRange = sum(r[i-5..i+5]) - 11*r[i] ... actually ref uses
    sum of the 10 neighbors - 10*r[i]; curvature = diffRange^2
    (ref: src/featureExtraction.h:115-122).  Valid for i in [5, size-5)."""
    P = point_range.shape[0]
    r = point_range
    acc = -10.0 * r
    for k in range(1, 6):
        acc = acc + jnp.roll(r, k) + jnp.roll(r, -k)
    curv = acc * acc
    i = jnp.arange(P)
    in_win = (i >= 5) & (i < num_points - 5)
    return jnp.where(in_win, curv, 0.0), in_win


def _occlusion_mask(point_range, point_col, num_points):
    """Initial neighbor-picked mask (markOccludedPoints,
    ref: src/featureExtraction.h:134-176); loop range i in [5, size-6)."""
    P = point_range.shape[0]
    r = point_range
    c = point_col
    i = jnp.arange(P)
    in_win = (i >= 5) & (i < num_points - 6)

    r_next = jnp.roll(r, -1)
    c_next = jnp.roll(c, -1)
    col_diff = jnp.abs(c_next - c)
    occ_a = in_win & (col_diff < 10) & (r - r_next > 0.3)       # marks i-5..i
    occ_b = in_win & (col_diff < 10) & (r_next - r > 0.3)       # marks i+1..i+6

    picked = jnp.zeros((P,), bool)
    for j in range(0, 6):
        picked = picked | jnp.roll(occ_a, -j)   # occ_a at i+j marks i
    for j in range(1, 7):
        picked = picked | jnp.roll(occ_b, j)    # occ_b at i-j marks i

    r_prev = jnp.roll(r, 1)
    diff1 = jnp.abs(r_prev - r)
    diff2 = jnp.abs(r_next - r)
    parallel = in_win & (diff1 > 0.02 * r) & (diff2 > 0.02 * r)
    return picked | parallel


def _sector_bounds(start_idx, end_idx, j):
    """C-truncation sector split (ref: src/featureExtraction.h:195-197)."""
    sp = lax.div(start_idx * (6 - j) + end_idx * j, jnp.int32(6))
    ep = lax.div(start_idx * (5 - j) + end_idx * (j + 1), jnp.int32(6)) - 1
    return sp, ep


def _ring_pick(ring_window, sector_cap, edge_threshold, surf_threshold,
               strict: bool = True, corner_stream_cap: int = 128):
    """Greedy feature picking for one ring.

    ring_window: dict of per-ring local arrays (size W) + scalars.
    Returns (label [W] int8, surf_sector_mask [W] bool).

    strict=True reproduces the reference's full corner+surf candidate stream
    (12*sector_cap sequential steps).  strict=False is the fast mode: only
    the top `corner_stream_cap` (128) curvature candidates per sector go through
    the serial corner pass (the reference picks <= 20 and only examines the
    descending tail anyway), and the surf pass is dropped entirely — its
    label is irrelevant to the surface output (everything label <= 0 is
    gathered, picked or not, ref :279-284); the only thing lost is the surf
    picks' +-5 suppression marks, which can suppress a later-sector corner
    candidate in rare boundary cases.  ~10x fewer sequential steps.
    """
    curv = ring_window["curv"]
    col = ring_window["col"]
    picked0 = ring_window["picked"]
    sp_loc = ring_window["sp"]    # [6] local sector starts
    ep_loc = ring_window["ep"]    # [6]
    sector_ok = ring_window["sector_ok"]  # [6]
    W = curv.shape[0]
    CAP = sector_cap

    # ---- precompute sorted candidate tables per sector [6, CAP] ----
    # The sector window curv[sp:sp+CAP] is CONTIGUOUS — a dynamic_slice,
    # not a gather; the sort carries (cval, slot) as payloads so no
    # post-sort gathers are needed either.  tab_pos is affine in the
    # permuted slot: pos = clip(sp + slot_sorted).
    curv_pad = jnp.concatenate([curv, jnp.zeros((CAP,), curv.dtype)])

    js = jnp.arange(6, dtype=jnp.int32)
    if strict:
        def sector_table(sp, ep, ok):
            length = jnp.where(ok, ep - sp + 1, 0)
            slots = jnp.arange(CAP, dtype=jnp.int32)
            sp_c = jnp.clip(sp, 0, W - 1)
            cwin = lax.dynamic_slice(curv_pad, (sp_c,), (CAP,))
            in_seg = slots < length
            cval = jnp.where(in_seg, cwin, _INF)
            # sort region excludes the last element (position ep): it keeps
            # its slot; padding (+inf keys) stays behind it in original
            # order.
            sort_key = jnp.where(slots < length - 1, cval, _INF)
            _, cval_o, slot_o = lax.sort((sort_key, cval, slots), num_keys=1,
                                         is_stable=True)
            pos_o = jnp.clip(sp_c + slot_o, 0, W - 1)
            return pos_o, cval_o, slot_o < length

        tab_pos, tab_val, tab_valid = jax.vmap(
            lambda j: sector_table(sp_loc[j], ep_loc[j], sector_ok[j])
        )(js)  # [6, CAP]

    # Column-gap prefix counts for the suppression path check: a pick at
    # pos_k suppresses candidate i iff |pos_i - pos_k| <= 5 and no column
    # gap > 10 lies between them; the cumulative-gap early break
    # (ref :227-240) collapses to equality of a gap-break prefix count:
    # bc[i] = #\{j <= pos_i : |col[j]-col[j-1]| > 10\}, path clear
    # <=> bc_i == bc_k.  (Both directions check the same gap set.)
    gap_break = jnp.abs(col - jnp.roll(col, 1)) > 10
    bcum = jnp.cumsum(gap_break.astype(jnp.int32))
    rev = jnp.flip(jnp.arange(CAP, dtype=jnp.int32))
    fwd = jnp.arange(CAP, dtype=jnp.int32)
    # pack (gap-prefix, occlusion) so the candidate-position lookup is ONE
    # two-wide gather instead of two one-wide gathers
    bc_pick = jnp.stack([bcum.astype(jnp.float32),
                         picked0.astype(jnp.float32)], -1)  # [W, 2]

    if strict:
        # ---- serialized candidate stream over the whole ring ----
        # per sector: corner phase = slots CAP-1..0 (descending curvature,
        # ref :208), then surf phase = slots 0..CAP-1 (ref :245).  The
        # greedy loop is sequential, but the carry lives in CANDIDATE space
        # ([S] vectors) and every step is elementwise; labels scatter back
        # to the window ONCE after the loop.
        stream_pos = jnp.concatenate(
            [jnp.concatenate([tab_pos[j][rev], tab_pos[j][fwd]])
             for j in range(6)])
        stream_val = jnp.concatenate(
            [jnp.concatenate([tab_val[j][rev], tab_val[j][fwd]])
             for j in range(6)])
        stream_valid = jnp.concatenate(
            [jnp.concatenate([tab_valid[j][rev], tab_valid[j][fwd]])
             for j in range(6)])
        n_steps = 12 * CAP
        step_idx = jnp.arange(n_steps, dtype=jnp.int32)
        is_corner = (step_idx // CAP) % 2 == 0
        sector_start = step_idx % (2 * CAP) == 0

        S = stream_pos.shape[0]
        bp = bc_pick[stream_pos]                        # [S, 2] gather, once
        bc = bp[:, 0].astype(jnp.int32)
        alive0 = ~(bp[:, 1] > 0)
        stream_idx = jnp.arange(S, dtype=jnp.int32)

        def body(carry, xs):
            suppressed, label_c, ccount = carry
            pos_k, val_k, valid_k, corner_k, reset_k, bc_k, k = xs
            ccount = jnp.where(reset_k, 0, ccount)

            sel = stream_idx == k
            picked_now = jnp.any(suppressed & sel)
            qualify_c = (valid_k & corner_k & ~picked_now
                         & (val_k > edge_threshold))
            do_c = qualify_c & (ccount < 20)  # 21st breaks (ref :221)
            ccount = ccount + qualify_c.astype(jnp.int32)
            qualify_s = (valid_k & ~corner_k & ~picked_now
                         & (val_k < surf_threshold))
            do = do_c | qualify_s

            supp_row = (jnp.abs(stream_pos - pos_k) <= 5) & (bc == bc_k)
            suppressed = suppressed | (supp_row & do)
            new_label = jnp.where(do_c, jnp.int8(1), jnp.int8(-1))
            label_c = jnp.where(sel & do, new_label, label_c)
            return (suppressed, label_c, ccount), None

        (_, label_c, _), _ = lax.scan(
            body,
            (~alive0, jnp.zeros((S,), jnp.int8), jnp.int32(0)),
            (stream_pos, stream_val, stream_valid, is_corner, sector_start,
             bc, stream_idx),
        )
        label = jnp.zeros((W,), jnp.int8).at[stream_pos].add(label_c)
    else:
        # ---- fast mode: sectors as PARALLEL scan lanes ----
        # Only the top `corner_stream_cap` curvature candidates per sector
        # run the serial corner pass (the reference picks <= 20 and only
        # examines the descending tail anyway) and the surf pass is dropped
        # (its label is irrelevant to the surface output: everything
        # label <= 0 is gathered, ref :279-284).  Sectors are independent
        # lanes: the per-sector pick cap (<= 20, ref :221) and the
        # descending order are per-sector anyway, so the only coupling lost
        # is +-5 suppression spill across a sector boundary (<= 5 points,
        # same class as the documented ring-lane spill above).  The payoff:
        # CC steps over [CC] carries instead of 6*CC steps over [6*CC]
        # carries — ~36x less sequential-loop traffic.
        #
        # Candidate selection is lax.top_k, NOT a full sector sort — TPU's
        # partial-sort TopK is ~2x the full variadic sort's throughput
        # (measured: 0.28 vs 0.60 ms/scan at B=128).  The reference's
        # descending pass examines the UNSORTED element at position ep
        # first (std::sort's range [sp, ep) excludes it, ref :203 vs :208);
        # its key is forced to +inf so TopK ranks it first, and its true
        # curvature is restored afterwards.
        CC = min(corner_stream_cap, CAP)

        def sector_topk(sp, ep, ok):
            length = jnp.where(ok, ep - sp + 1, 0)
            slots = jnp.arange(CAP, dtype=jnp.int32)
            sp_c = jnp.clip(sp, 0, W - 1)
            cwin = lax.dynamic_slice(curv_pad, (sp_c,), (CAP,))
            in_seg = slots < length
            key = jnp.where(slots == length - 1, _INF,
                            jnp.where(in_seg, cwin, -_INF))
            kval, kslot = lax.top_k(key, CC)
            ep_curv = lax.dynamic_slice(
                curv_pad, (jnp.clip(sp_c + length - 1, 0, W - 1),), (1,))[0]
            val = jnp.where(jnp.isposinf(kval), ep_curv, kval)
            pos = jnp.clip(sp_c + kslot, 0, W - 1)
            return pos, val, kval > -_INF

        sec_pos, sec_val, sec_valid = jax.vmap(
            lambda j: sector_topk(sp_loc[j], ep_loc[j], sector_ok[j])
        )(js)  # [6, CC]
        bp6 = bc_pick[sec_pos]           # [6, CC, 2] gather, once
        bc6 = bp6[..., 0].astype(jnp.int32)
        alive6 = ~(bp6[..., 1] > 0)

        def sector_scan(pos_s, val_s, valid_s, bc_s, alive_s):
            idx = jnp.arange(CC, dtype=jnp.int32)

            def body(carry, xs):
                suppressed, label_s, ccount = carry
                pos_k, val_k, valid_k, bc_k, k = xs
                sel = idx == k
                picked_now = jnp.any(suppressed & sel)
                qualify_c = valid_k & ~picked_now & (val_k > edge_threshold)
                do_c = qualify_c & (ccount < 20)
                ccount = ccount + qualify_c.astype(jnp.int32)
                supp_row = (jnp.abs(pos_s - pos_k) <= 5) & (bc_s == bc_k)
                suppressed = suppressed | (supp_row & do_c)
                label_s = jnp.where(sel & do_c, jnp.int8(1), label_s)
                return (suppressed, label_s, ccount), None

            (_, label_s, _), _ = lax.scan(
                body, (~alive_s, jnp.zeros((CC,), jnp.int8), jnp.int32(0)),
                (pos_s, val_s, valid_s, bc_s, idx))
            return label_s

        label6 = jax.vmap(sector_scan)(sec_pos, sec_val, sec_valid,
                                       bc6, alive6)
        label = jnp.zeros((W,), jnp.int8).at[sec_pos.reshape(-1)].add(
            label6.reshape(-1))

    # surface gathering covers every non-skipped sector span (ref :279-284)
    w_idx = jnp.arange(W, dtype=jnp.int32)
    surf_span = jnp.zeros((W,), bool)
    for j in range(6):
        surf_span = surf_span | (
            sector_ok[j] & (w_idx >= sp_loc[j]) & (w_idx <= ep_loc[j])
        )
    return label, surf_span


@partial(jax.jit, static_argnames=("n_scan", "horizon_scan", "sector_cap",
                                   "corner_cap", "surf_cap", "strict"))
def _extract_features_impl(cloud: CloudInfo, edge_threshold, surf_threshold,
                           surf_leaf, *, n_scan, horizon_scan, sector_cap,
                           corner_cap, surf_cap, strict=True):
    P = cloud.point_range.shape[0]
    num = cloud.num_points

    curv, _ = _curvature_flat(cloud.point_range, num)
    picked0 = _occlusion_mask(cloud.point_range, cloud.point_col_ind, num)

    # Per-ring local windows.  Flat position of ring r's first point:
    ring_counts = (cloud.end_ring_index + 1 + 5) - (cloud.start_ring_index + 1 - 5)
    ring_first = cloud.start_ring_index + 1 - 5  # invert :650 (count-1+5)
    MARGIN = 8
    W = horizon_scan + 2 * MARGIN

    # The per-ring window [ws, ws+W) is CONTIGUOUS in the compacted array —
    # a dynamic_slice of one packed [P, 8] buffer, NOT eight separate
    # gathers.  (Flat 1-wide gathers were ~60% of the frontend's runtime:
    # TPU gathers are row-rate-limited, slices are plain DMA.)
    packed = jnp.concatenate(
        [curv[:, None],
         cloud.point_col_ind.astype(jnp.float32)[:, None],
         picked0.astype(jnp.float32)[:, None],
         cloud.point_valid.astype(jnp.float32)[:, None],
         cloud.points,
         jnp.zeros((P, 1), jnp.float32)], -1)
    packed_pad = jnp.concatenate(
        [jnp.zeros((W, 8), jnp.float32), packed,
         jnp.zeros((W, 8), jnp.float32)])

    def gather_window(r):
        ws = ring_first[r] - MARGIN
        idx = ws + jnp.arange(W, dtype=jnp.int32)
        ok = (idx >= 0) & (idx < P)
        win = lax.dynamic_slice(packed_pad, (ws + W, 0), (W, 8))
        sp = jnp.zeros((6,), jnp.int32)
        ep = jnp.zeros((6,), jnp.int32)
        for j in range(6):
            s, e = _sector_bounds(cloud.start_ring_index[r],
                                  cloud.end_ring_index[r], jnp.int32(j))
            sp = sp.at[j].set(s - ws)
            ep = ep.at[j].set(e - ws)
        sector_ok = sp < ep  # ref :199 skips sp >= ep
        return dict(
            curv=jnp.where(ok, win[:, 0], 0.0),
            col=jnp.where(ok, win[:, 1].astype(jnp.int32), -(10 ** 6)),
            picked=jnp.where(ok, win[:, 2] > 0, True),
            xyz=jnp.where(ok[:, None], win[:, 4:7], 0.0),
            pvalid=ok & (win[:, 3] > 0),
            sp=sp,
            ep=ep,
            sector_ok=sector_ok,
        )

    windows = jax.vmap(gather_window)(jnp.arange(n_scan))

    label, surf_span = jax.vmap(
        lambda w: _ring_pick(w, sector_cap, edge_threshold, surf_threshold,
                             strict=strict)
    )(windows)  # [n_scan, W]

    # ---- corner set: label == 1, compacted per ring ----
    ring_corner_cap = corner_cap // n_scan
    corner_mask_w = (label == 1) & windows["pvalid"]

    def compact_ring(xyz, mask, cap):
        # payload sort (no post-sort gathers): valid entries first, stable
        _, sx, sy, sz, smf = lax.sort(
            ((~mask).astype(jnp.int32), xyz[:, 0], xyz[:, 1], xyz[:, 2],
             mask.astype(jnp.float32)), num_keys=1, is_stable=True)
        m = smf[:cap] > 0
        out = jnp.stack([sx[:cap], sy[:cap], sz[:cap]], -1)
        return jnp.where(m[:, None], out, 0.0), m

    corner_xyz, corner_mask = jax.vmap(
        lambda x, m: compact_ring(x, m, ring_corner_cap)
    )(windows["xyz"], corner_mask_w)

    # ---- surface set: label <= 0 within sector spans, per-ring voxel DS ----
    ring_surf_cap = surf_cap // n_scan
    surf_mask_w = surf_span & (label <= 0) & windows["pvalid"]
    surf_xyz, surf_mask, _ = jax.vmap(
        lambda x, m: voxel_downsample(x, m, surf_leaf, ring_surf_cap)
    )(windows["xyz"], surf_mask_w)

    return ScanFeatures(
        corner_xyz=corner_xyz.reshape(corner_cap, 3),
        corner_mask=corner_mask.reshape(corner_cap),
        surf_xyz=surf_xyz.reshape(surf_cap, 3),
        surf_mask=surf_mask.reshape(surf_cap),
    )


def extract_features(params: Params, cloud: CloudInfo,
                     strict: bool = True) -> ScanFeatures:
    """Full feature extraction (laserCloudInfoHandler body,
    ref: src/featureExtraction.h:88-103).

    strict=False enables the fast picking stream (see _ring_pick) — ~10x
    fewer sequential steps with near-identical feature sets."""
    return _extract_features_impl(
        cloud,
        jnp.float32(params.edge_threshold),
        jnp.float32(params.surf_threshold),
        params.odometry_surf_leaf_size,
        n_scan=params.n_scan,
        horizon_scan=params.horizon_scan,
        sector_cap=params.sector_cap,
        corner_cap=params.corner_cap,
        surf_cap=params.surf_cap,
        strict=strict,
    )
