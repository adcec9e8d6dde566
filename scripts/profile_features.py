"""Sub-stage timing of the features stage (run on TPU).

Splits _extract_features_impl into: windows (curv+occl+pack+slice),
sector tables (sorts), pick scan (fast mode), compaction+voxel — timed
separately at several batch sizes to find what scales superlinearly.

    python scripts/profile_features.py --batches 32,128
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from feature_base_pointcloud_registration_tpu.utils.cache import (
    enable_persistent_cache)

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,128")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from feature_base_pointcloud_registration_tpu import ops
    from feature_base_pointcloud_registration_tpu.config import Params
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        SyntheticWorld, simulate_scan)
    from feature_base_pointcloud_registration_tpu.ops import features as F
    from feature_base_pointcloud_registration_tpu.ops.projection import (
        project_scan)
    from feature_base_pointcloud_registration_tpu.ops.voxel import (
        voxel_downsample)
    from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
        RawScan)

    params = Params()
    world = SyntheticWorld()
    rng = np.random.RandomState(0)

    def make_clouds(B):
        raw_list = []
        for i in range(B):
            pose = np.array([0, 0, rng.uniform(-1, 1), rng.uniform(-6, 6),
                             rng.uniform(-6, 6), 0.0], np.float32)
            s = simulate_scan(world, pose, seed=i)
            raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                     s["time"])
            raw = raw._replace(valid=jnp.asarray(s["valid"]))
            raw_list.append(jax.tree.map(np.asarray, raw))
        raws = jax.tree.map(lambda *a: jnp.asarray(np.stack(a)), *raw_list)
        clouds = jax.jit(jax.vmap(lambda r: project_scan(params, r, None)))(
            raws)
        jax.block_until_ready(clouds)
        return clouds

    n_scan = params.n_scan
    CAP = params.sector_cap
    CC = 128
    W = params.horizon_scan + 16

    # ---- stage fns (mirror _extract_features_impl's fast mode) ----
    def windows_of(cloud):
        curv, _ = F._curvature_flat(cloud.point_range, cloud.num_points)
        picked0 = F._occlusion_mask(cloud.point_range, cloud.point_col_ind,
                                    cloud.num_points)
        P = cloud.point_range.shape[0]
        ring_first = cloud.start_ring_index + 1 - 5
        MARGIN = 8
        Wl = params.horizon_scan + 2 * MARGIN
        packed = jnp.concatenate(
            [curv[:, None],
             cloud.point_col_ind.astype(jnp.float32)[:, None],
             picked0.astype(jnp.float32)[:, None],
             cloud.point_valid.astype(jnp.float32)[:, None],
             cloud.points,
             jnp.zeros((P, 1), jnp.float32)], -1)
        packed_pad = jnp.concatenate(
            [jnp.zeros((Wl, 8), jnp.float32), packed,
             jnp.zeros((Wl, 8), jnp.float32)])

        def gather_window(r):
            ws = ring_first[r] - MARGIN
            idx = ws + jnp.arange(Wl, dtype=jnp.int32)
            ok = (idx >= 0) & (idx < P)
            win = lax.dynamic_slice(packed_pad, (ws + Wl, 0), (Wl, 8))
            sp = jnp.zeros((6,), jnp.int32)
            ep = jnp.zeros((6,), jnp.int32)
            for j in range(6):
                s, e = F._sector_bounds(cloud.start_ring_index[r],
                                        cloud.end_ring_index[r], jnp.int32(j))
                sp = sp.at[j].set(s - ws)
                ep = ep.at[j].set(e - ws)
            sector_ok = sp < ep
            return dict(
                curv=jnp.where(ok, win[:, 0], 0.0),
                col=jnp.where(ok, win[:, 1].astype(jnp.int32), -(10 ** 6)),
                picked=jnp.where(ok, win[:, 2] > 0, True),
                xyz=jnp.where(ok[:, None], win[:, 4:7], 0.0),
                pvalid=ok & (win[:, 3] > 0),
                sp=sp, ep=ep, sector_ok=sector_ok)

        return jax.vmap(gather_window)(jnp.arange(n_scan))

    def tables_of(w):
        curv = w["curv"]
        Wl = curv.shape[0]
        curv_pad = jnp.concatenate([curv, jnp.zeros((CAP,), curv.dtype)])

        def sector_table(sp, ep, ok):
            length = jnp.where(ok, ep - sp + 1, 0)
            slots = jnp.arange(CAP, dtype=jnp.int32)
            sp_c = jnp.clip(sp, 0, Wl - 1)
            cwin = lax.dynamic_slice(curv_pad, (sp_c,), (CAP,))
            in_seg = slots < length
            cval = jnp.where(in_seg, cwin, jnp.inf)
            sort_key = jnp.where(slots < length - 1, cval, jnp.inf)
            _, cval_o, slot_o = lax.sort((sort_key, cval, slots), num_keys=1,
                                         is_stable=True)
            pos_o = jnp.clip(sp_c + slot_o, 0, Wl - 1)
            return pos_o, cval_o, slot_o < length

        js = jnp.arange(6, dtype=jnp.int32)
        return jax.vmap(lambda j: sector_table(w["sp"][j], w["ep"][j],
                                               w["sector_ok"][j]))(js)

    def pick_of(w, tabs):
        tab_pos, tab_val, tab_valid = tabs
        col = w["col"]
        picked0 = w["picked"]
        gap_break = jnp.abs(col - jnp.roll(col, 1)) > 10
        bcum = jnp.cumsum(gap_break.astype(jnp.int32))
        bc_pick = jnp.stack([bcum.astype(jnp.float32),
                             picked0.astype(jnp.float32)], -1)
        rev = jnp.flip(jnp.arange(CAP, dtype=jnp.int32))
        top = rev[:CC]
        sec_pos = tab_pos[:, top]
        sec_val = tab_val[:, top]
        sec_valid = tab_valid[:, top]
        bp6 = bc_pick[sec_pos]
        bc6 = bp6[..., 0].astype(jnp.int32)
        alive6 = ~(bp6[..., 1] > 0)

        def sector_scan(pos_s, val_s, valid_s, bc_s, alive_s):
            idx = jnp.arange(CC, dtype=jnp.int32)

            def body(carry, xs):
                suppressed, label_s, ccount = carry
                pos_k, val_k, valid_k, bc_k, k = xs
                sel = idx == k
                picked_now = jnp.any(suppressed & sel)
                qualify_c = valid_k & ~picked_now & (
                    val_k > params.edge_threshold)
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

        label6 = jax.vmap(sector_scan)(sec_pos, sec_val, sec_valid, bc6,
                                       alive6)
        return jnp.zeros((col.shape[0],), jnp.int8).at[
            sec_pos.reshape(-1)].add(label6.reshape(-1))

    def compact_of(w, label):
        Wl = label.shape[0]
        w_idx = jnp.arange(Wl, dtype=jnp.int32)
        surf_span = jnp.zeros((Wl,), bool)
        for j in range(6):
            surf_span = surf_span | (
                w["sector_ok"][j] & (w_idx >= w["sp"][j])
                & (w_idx <= w["ep"][j]))
        ring_corner_cap = params.corner_cap // n_scan
        ring_surf_cap = params.surf_cap // n_scan
        corner_mask_w = (label == 1) & w["pvalid"]

        def compact_ring(xyz, mask, cap):
            _, sx, sy, sz, smf = lax.sort(
                ((~mask).astype(jnp.int32), xyz[:, 0], xyz[:, 1], xyz[:, 2],
                 mask.astype(jnp.float32)), num_keys=1, is_stable=True)
            m = smf[:cap] > 0
            out = jnp.stack([sx[:cap], sy[:cap], sz[:cap]], -1)
            return jnp.where(m[:, None], out, 0.0), m

        cx, cm = compact_ring(w["xyz"], corner_mask_w, ring_corner_cap)
        surf_mask_w = surf_span & (label <= 0) & w["pvalid"]
        sx, sm, _ = voxel_downsample(w["xyz"], surf_mask_w,
                                     params.odometry_surf_leaf_size,
                                     ring_surf_cap)
        return cx, cm, sx, sm

    stages = {
        "windows": jax.jit(jax.vmap(windows_of)),
        "tables": jax.jit(jax.vmap(jax.vmap(tables_of))),
        "pick": jax.jit(jax.vmap(jax.vmap(pick_of))),
        "compact": jax.jit(jax.vmap(jax.vmap(compact_of))),
    }

    def timeit(f, *a):
        out = f(*a)
        jax.block_until_ready(out)
        # host fetch barrier (tunnel gotcha)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(*a)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / args.reps * 1000.0, out

    for B in [int(x) for x in args.batches.split(",")]:
        clouds = make_clouds(B)
        t_w, wins = timeit(stages["windows"], clouds)
        t_t, tabs = timeit(stages["tables"], wins)
        t_p, labels = timeit(stages["pick"], wins, tabs)
        t_c, _ = timeit(stages["compact"], wins, labels)
        for name, t in [("windows", t_w), ("tables", t_t), ("pick", t_p),
                        ("compact", t_c)]:
            print(f"B={B:4d} {name:10s} {t:8.2f} ms/call "
                  f"{t / B:6.3f} ms/scan")


if __name__ == "__main__":
    main()
