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
    parallel lanes.  Ring lanes not sharing state is OUTPUT-INVARIANT, i.e.
    strict mode is bit-exact across ring seams too: the reference's only
    cross-ring write is a pick at the first sector slot (ind = sp_0 =
    startRingIndex = count_before+4, j=0) marking ind-5 = count_before-1 =
    the LAST point of the previous ring (ref :236); that position can never
    be a candidate (every ring's pickable range is [count_before+4,
    count_after-6], ref :650,:668 margins), candidates are the only readers
    of cloudNeighborPicked, and rings are processed in ascending order so
    the previous ring is already finished — the mark is dead in the
    reference itself.  Forward spill cannot occur at all: the last pickable
    index is count_after-6, so ind+5 <= count_after-1 stays inside the
    ring.  Proven bit-exact on multi-ring streams by
    tests/test_features.py::test_strict_multi_ring_bit_exact_vs_oracle
    (the oracle transcribes the spill faithfully on a flat global array).
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
import numpy as np
from jax import lax

from ..config import Params
from ..pipeline.cloud_info import CloudInfo, ScanFeatures
from .voxel import voxel_downsample

_INF = np.float32(np.inf)  # numpy, not jnp: see ops/hashgrid.py _BIG

# stride fast-forward for the strict surf MIS (see mis() below); module
# flag so tests can A/B the plain rounds against the accelerated path
_MIS_STRIDE_DEFAULT = True


def _curvature_flat(point_range, num_points):
    """diffRange = r[i-5]+...+r[i-1] - 10*r[i] + r[i+1]+...+r[i+5];
    curvature = diffRange^2 (ref: src/featureExtraction.h:115-122).
    Valid for i in [5, size-5).

    The adds run in the reference's exact left-associative order (backward
    neighbors, -10*r, forward neighbors) so the float32 rounding — and
    therefore every curvature ORDERING the pick loops consume — is
    bit-identical to the C++ serial loop, not just close (the seam
    bit-parity test compares pick sets exactly)."""
    P = point_range.shape[0]
    r = point_range
    acc = jnp.roll(r, 5)
    for k in (4, 3, 2, 1):
        acc = acc + jnp.roll(r, k)
    acc = acc - 10.0 * r
    for k in (1, 2, 3, 4, 5):
        acc = acc + jnp.roll(r, -k)
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


def _row_window_gather(operand, starts, length: int):
    """Contiguous windows [starts[s] : starts[s]+length] from a (possibly
    multi-channel) array as ONE native gather.

    operand [Wp] or [Wp, C]; starts [S] int32 (caller clips so the windows
    stay in bounds).  Returns [S, length] / [S, length, C].

    A vmapped lax.dynamic_slice with data-dependent starts lowers to a
    sequential while loop on TPU (measured: the 12,288-iteration slice loop
    was ~31 ms/batch of the frontend, the 2,048-iteration ring-window loop
    ~10 ms); a gather whose slices are whole contiguous rows stays one
    vectorized HLO.
    """
    squeeze = operand.ndim == 1
    if squeeze:
        operand = operand[:, None]
    C = operand.shape[1]
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    out = lax.gather(operand, starts[:, None].astype(jnp.int32), dnums,
                     slice_sizes=(length, C), mode="clip")
    return out[..., 0] if squeeze else out


def _sector_bounds(start_idx, end_idx, j):
    """C-truncation sector split (ref: src/featureExtraction.h:195-197)."""
    sp = lax.div(start_idx * (6 - j) + end_idx * j, jnp.int32(6))
    ep = lax.div(start_idx * (5 - j) + end_idx * (j + 1), jnp.int32(6)) - 1
    return sp, ep


def _ring_pick(ring_window, sector_cap, edge_threshold, surf_threshold,
               strict: bool = True, corner_stream_cap: int = 128):
    """Greedy feature picking for one ring, as iterated local-extrema
    rounds (parallel greedy MIS) instead of a serialized candidate stream.

    ring_window: dict of per-ring local arrays (size W) + scalars.
    Returns (label [W] int8, surf_sector_mask [W] bool).

    The reference's greedy pass (descending curvature for corners,
    ref :208-242; ascending for surfaces, ref :245-276; +-5 path-clear
    suppression) is a greedy maximal-independent-set on the +-5 conflict
    graph.  For totally ordered keys that greedy equals iterating "pick
    every alive candidate that beats all alive conflicting neighbors, then
    suppress their neighbors" until no candidate is alive — every step
    elementwise in ring space.  This replaced both the 12*CAP-step
    serialized stream (strict) and the per-sector table machinery (fast):
    batched dynamic slices, row-slice gathers, AND long sequential scans
    all lower to costly loops on TPU (docs/ROUND_NOTES.md round 3).

    strict=True is bit-parity mode: sectors processed as 6 sequential
    stages (corner MIS desc -> exact first-20 cap -> surf MIS asc), with
    suppression marks carried across phases and sectors exactly like the
    reference's serialized stream.  strict=False (fast) runs one
    corner-only MIS over all sectors at once with conflicts restricted to
    the same sector — the only couplings lost are cross-sector suppression
    spill (<= 5 points per seam) and the surf pass's marks (its labels are
    irrelevant to the surface output, ref :279-284).

    The examine-position-ep-first quirk (std::sort's range excludes ep,
    ref :203 vs :208) becomes a +inf key: highest priority in the
    descending corner pass, processed last in the ascending surf pass;
    qualification still uses ep's true curvature.  `sector_cap` and
    `corner_stream_cap` are kept for API stability; the MIS needs neither.
    """
    curv = ring_window["curv"]
    col = ring_window["col"]
    picked0 = ring_window["picked"]
    sp_loc = ring_window["sp"]    # [6] local sector starts
    ep_loc = ring_window["ep"]    # [6]
    sector_ok = ring_window["sector_ok"]  # [6]
    W = curv.shape[0]

    # Column-gap prefix counts for the suppression path check: a pick at
    # pos_k suppresses candidate i iff |pos_i - pos_k| <= 5 and no column
    # gap > 10 lies between them; the cumulative-gap early break
    # (ref :227-240) collapses to equality of a gap-break prefix count:
    # bc[i] = #\{j <= pos_i : |col[j]-col[j-1]| > 10\}, path clear
    # <=> bc_i == bc_k.  (Both directions check the same gap set.)
    gap_break = jnp.abs(col - jnp.roll(col, 1)) > 10
    bcum = jnp.cumsum(gap_break.astype(jnp.int32))
    w_idx = jnp.arange(W, dtype=jnp.int32)

    sec = jnp.full((W,), -1, jnp.int32)
    is_ep = jnp.zeros((W,), bool)
    for j in range(6):
        span = sector_ok[j] & (w_idx >= sp_loc[j]) & (w_idx <= ep_loc[j])
        sec = jnp.where(span, j, sec)
        is_ep = is_ep | (sector_ok[j] & (w_idx == ep_loc[j]))

    shifts = [s for s in range(-5, 6) if s != 0]
    # path-clear +-5 adjacency per shift (wrap-guarded), precomputed once
    conf = {s: ((jnp.roll(bcum, s) == bcum)
                & (jnp.abs(jnp.roll(w_idx, s) - w_idx) <= 5))
            for s in shifts}

    def dilate(p):
        """Positions suppressed by picks p (incl. the picks themselves)."""
        out = p
        for s in shifts:
            out = out | (jnp.roll(p, s) & conf[s])
        return out

    key_all = jnp.where(is_ep, _INF, curv)

    def mis(cand, asc, same_sector, stride=False):
        """Exact greedy pick set via local-extrema rounds.

        asc=False: descending (key, pos) order (corner pass; larger pos
        wins ties — the reversed stable sort of the reference).  asc=True:
        ascending (surf pass; smaller pos wins ties).

        stride=True adds the chain fast-forward: plain extrema rounds
        advance ~1 pick per round along sequential dependency chains (the
        strict surf pass hits 25-50 rounds per sector on flat rings:
        equal-key curv=0 runs 140-200 long, plus distinct-key monotone
        stretches — docs/ROUND_NOTES.md round 4).  A pick at i-6
        suppresses ALL of i-5..i-1 (each within path-clear distance 5 of
        the pick, whatever their keys), so i itself is serially picked
        provided (a) the whole window [i-6, i] is path-clear (one bcum
        equality — bcum is monotone), (b) i is alive, and (c) no alive
        conflicting neighbor on i's far side beats i (the near side is
        the dependency the stride replaces; a far-side alive beater would
        be serially processed before i and might suppress it).  That
        relation is a stride-6 reachability along the ring — closed in
        log2(W/6) doubling steps, all elementwise.  Both directions run:
        forward chains (pick left, resolve rightward) and backward
        (mirror).  No key monotonicity is required; correctness argument
        in the round-4 notes, bit-parity held by
        test_strict_pick_equals_reference_stream + the fuzz test.
        """
        # everything except `alive` is loop-invariant; precompute the
        # per-shift "conflicting neighbor that beats me" and "suppression
        # adjacency" masks so the while body is just rolls of the two
        # boolean carries + and/or (XLA does not hoist across while_loop)
        cb = {}
        sup_adj = {}
        for s in shifts:
            k_s = jnp.roll(key_all, s)
            i_s = jnp.roll(w_idx, s)
            c = conf[s]
            if same_sector:
                c = c & (jnp.roll(sec, s) == sec)
            if asc:
                beats = (k_s < key_all) | ((k_s == key_all)
                                           & (i_s < w_idx))
            else:
                beats = (k_s > key_all) | ((k_s == key_all)
                                           & (i_s > w_idx))
            cb[s] = c & beats
            sup_adj[s] = c

        # stride-6 single-hop validity (path-clear window + no index wrap);
        # roll(x, 6)[i] = x[i-6] (forward hop), roll(x, -6)[i] = x[i+6]
        if stride:
            hop_f = ((jnp.roll(bcum, 6) == bcum)
                     & (jnp.roll(w_idx, 6) == w_idx - 6))
            hop_b = ((jnp.roll(bcum, -6) == bcum)
                     & (jnp.roll(w_idx, -6) == w_idx + 6))
            n_dbl = max(1, (W // 6).bit_length())

        def cond(st):
            return jnp.any(st[0])

        def body(st):
            alive, pick = st
            # ext_r: no alive RIGHT-side beater (neighbor j > i ⇔ s < 0);
            # ext_l mirrors.  ext = both sides clear (the plain extremum).
            ext_r = alive
            ext_l = alive
            for s in shifts:
                clear = ~(jnp.roll(alive, s) & cb[s])
                if s < 0:
                    ext_r = ext_r & clear
                else:
                    ext_l = ext_l & clear
            ext = ext_r & ext_l
            if stride:
                # reachability closure: R starts at true extrema, P is the
                # composable "chain into i is valid" window mask
                rf = ext
                rb = ext
                pf = ext_r & hop_f
                pb = ext_l & hop_b
                d = 6
                for _ in range(n_dbl):
                    rf = rf | (jnp.roll(rf, d) & pf)
                    rb = rb | (jnp.roll(rb, -d) & pb)
                    pf = pf & jnp.roll(pf, d)
                    pb = pb & jnp.roll(pb, -d)
                    d *= 2
                ext = rf | rb
            pick = pick | ext
            supp = ext
            for s in shifts:
                supp = supp | (jnp.roll(ext, s) & sup_adj[s])
            return alive & ~supp, pick

        return lax.while_loop(cond, body,
                              (cand, jnp.zeros((W,), bool)))[1]

    def top20(pick):
        """Exact first-20 picks in descending (key, pos) order — the
        per-sector cap (ref :221: the 21st qualifying candidate stops the
        phase, so capped picks = the first 20 of the uncapped greedy)."""
        def take(i, st):
            rem, kept = st
            mk = jnp.max(jnp.where(rem, key_all, -_INF))
            c1 = rem & (key_all == mk)
            ms = jnp.max(jnp.where(c1, w_idx, -1))
            sel = c1 & (w_idx == ms) & (mk > -_INF)
            return rem & ~sel, kept | sel

        return lax.fori_loop(0, 20, take,
                             (pick, jnp.zeros((W,), bool)))[1]

    if strict:
        # 6 sequential sector stages, marks carried across phases/sectors
        def stage(carry, j):
            marks, label = carry
            in_sec = sec == j
            cand_c = in_sec & ~marks & (curv > edge_threshold)
            pick_c = top20(mis(cand_c, asc=False, same_sector=False))
            marks = marks | dilate(pick_c)
            cand_s = in_sec & ~marks & (curv < surf_threshold)
            pick_s = mis(cand_s, asc=True, same_sector=False,
                         stride=_MIS_STRIDE_DEFAULT)
            marks = marks | dilate(pick_s)
            label = jnp.where(pick_c, jnp.int8(1),
                              jnp.where(pick_s, jnp.int8(-1), label))
            return (marks, label), None

        (_, label), _ = lax.scan(
            stage, (picked0, jnp.zeros((W,), jnp.int8)),
            jnp.arange(6, dtype=jnp.int32))
    else:
        cand = (sec >= 0) & ~picked0 & (curv > edge_threshold)
        pick = mis(cand, asc=False, same_sector=True)
        kept = jnp.zeros((W,), bool)
        for j in range(6):
            kept = kept | top20(pick & (sec == j))
        label = jnp.where(kept, jnp.int8(1), jnp.int8(0))

    # surface gathering covers every non-skipped sector span (ref :279-284)
    w_idx = jnp.arange(W, dtype=jnp.int32)
    surf_span = jnp.zeros((W,), bool)
    for j in range(6):
        surf_span = surf_span | (
            sector_ok[j] & (w_idx >= sp_loc[j]) & (w_idx <= ep_loc[j])
        )
    return label, surf_span


def _window_labels(cloud: CloudInfo, edge_threshold, surf_threshold, *,
                   n_scan, horizon_scan, sector_cap, strict):
    """Curvature + occlusion masks + per-ring window gather + picking.

    Returns (windows, label [n_scan, W], surf_span [n_scan, W], ring_first
    [n_scan]) in per-ring window coordinates; flat index of window slot w of
    ring r is ring_first[r] - MARGIN + w.  Factored out of
    _extract_features_impl so the seam-exactness test can compare labels
    against the serial oracle directly (tests/test_features.py)."""
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

    # all ring windows in one row-slice gather (a vmapped dynamic_slice
    # lowers to a 2k-iteration while loop at B=128, see _row_window_gather)
    ws_all = ring_first - MARGIN                         # [n_scan]
    wins_all = _row_window_gather(packed_pad, ws_all + W, W)  # [n_scan, W, 8]

    def gather_window(r, win):
        ws = ring_first[r] - MARGIN
        idx = ws + jnp.arange(W, dtype=jnp.int32)
        ok = (idx >= 0) & (idx < P)
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

    windows = jax.vmap(gather_window)(jnp.arange(n_scan), wins_all)

    label, surf_span = jax.vmap(
        lambda w: _ring_pick(w, sector_cap, edge_threshold, surf_threshold,
                             strict=strict)
    )(windows)  # [n_scan, W]
    return windows, label, surf_span, ring_first


@partial(jax.jit, static_argnames=("n_scan", "horizon_scan", "sector_cap",
                                   "corner_cap", "surf_cap", "strict"))
def _extract_features_impl(cloud: CloudInfo, edge_threshold, surf_threshold,
                           surf_leaf, *, n_scan, horizon_scan, sector_cap,
                           corner_cap, surf_cap, strict=True):
    windows, label, surf_span, _ = _window_labels(
        cloud, edge_threshold, surf_threshold, n_scan=n_scan,
        horizon_scan=horizon_scan, sector_cap=sector_cap, strict=strict)

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
