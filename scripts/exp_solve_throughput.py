"""Round-4 experiment: solve-path throughput levers toward 1000 scans/s.

Sweeps candidate-pool / round-structure configs of batch_register_fused on
the bench workload (B distinct scans, 16k corner + 64k surf map) and
reports, per config:
  * scans/s
  * max / RMS translation error vs ground truth
  * RMS translation difference vs the refetch baseline path
  * RMS translation error vs the serial NumPy oracle on a subset
    (the BASELINE.json parity metric; budget 1e-3 m)

Usage: python scripts/exp_solve_throughput.py [config ...]
Configs named below in CONFIGS; default runs all.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/fbpr_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from feature_base_pointcloud_registration_tpu.config import Params
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        SyntheticWorld, build_feature_map, simulate_scan)
    from feature_base_pointcloud_registration_tpu.ops.features import (
        extract_features)
    from feature_base_pointcloud_registration_tpu.ops.projection import (
        project_scan)
    from feature_base_pointcloud_registration_tpu.parallel.batch import (
        batch_register_fused, build_map_planar_tables)
    from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
        FeatureMap, RawScan)
    from feature_base_pointcloud_registration_tpu.pipeline.frontend import (
        downsample_features)

    B = int(os.environ.get("EXP_BATCH", "256"))
    REPS = int(os.environ.get("EXP_REPS", "10"))
    N_ORACLE = int(os.environ.get("EXP_ORACLE_SCANS", "8"))
    params = Params(map_corner_cap=16384, map_surf_cap=65536, knn_chunk=4096)

    world = SyntheticWorld()
    rng = np.random.RandomState(0)
    raw_list, gt_list = [], []
    for i in range(B):
        pose = np.array([0, 0, rng.uniform(-1, 1), rng.uniform(-6, 6),
                         rng.uniform(-6, 6), 0.0], np.float32)
        s = simulate_scan(world, pose, seed=i)
        raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                 s["time"])
        raw = raw._replace(valid=jnp.asarray(s["valid"]))
        raw_list.append(jax.tree.map(np.asarray, raw))
        gt_list.append(pose)
    raws = jax.tree.map(lambda *a: jnp.asarray(np.stack(a)), *raw_list)
    gt = np.stack(gt_list)
    guesses = gt + rng.uniform(-1, 1, (B, 6)).astype(np.float32) * np.array(
        [0.02, 0.02, 0.05, 0.3, 0.3, 0.1], np.float32)
    guesses_j = jnp.asarray(guesses)

    mcx, mcm, msx, msm = build_feature_map(world, params.map_corner_cap,
                                           params.map_surf_cap)
    fmap = FeatureMap(jnp.asarray(mcx), jnp.asarray(mcm),
                      jnp.asarray(msx), jnp.asarray(msm))
    center = np.array([0.0, 0.0, (world.ground_z + world.ceil_z) / 2],
                      np.float32)
    half = np.array([world.half_x + 1, world.half_y + 1,
                     (world.ceil_z - world.ground_z) / 2 + 1], np.float32)
    CCAP = int(os.environ.get("EXP_CCAP", "32"))
    SCAP = int(os.environ.get("EXP_SCAP", "48"))
    ctab, stab, origin, dims = build_map_planar_tables(
        fmap, center, half, corner_cell_cap=CCAP, surf_cell_cap=SCAP)

    @jax.jit
    def frontend(raws):
        def one(raw):
            cloud = project_scan(params, raw, None)
            return downsample_features(
                params, extract_features(params, cloud, strict=False))
        return jax.vmap(one)(raws)

    def block(r):
        jax.tree.map(lambda a: a.block_until_ready(), r)
        np.asarray(jax.tree.leaves(r)[0])
        return r

    feats = block(frontend(raws))

    CONFIGS = {
        # name: kwargs for batch_register_fused
        "baseline": dict(),
        "sharedK8": dict(shared_fetch=True),
        "sharedK12": dict(shared_fetch=True, num_candidates=12),
        "sharedK16": dict(shared_fetch=True, num_candidates=16),
        "sharedK24": dict(shared_fetch=True, num_candidates=24),
        "refetchK12": dict(num_candidates=12),
        "r1_8iters": dict(iters_per_round=(8, 22)),
        "r1_10iters": dict(iters_per_round=(10, 20)),
        "3r_shared_tail": dict(num_rounds=3, shared_fetch="tail"),
        "cf_s2": dict(round1_surf_stride=2),
        "cf_s4": dict(round1_surf_stride=4),
        "cf_s4c2": dict(round1_surf_stride=4, round1_corner_stride=2),
        "cf_s8c4": dict(round1_surf_stride=8, round1_corner_stride=4),
        "cf_s4c2_i10": dict(round1_surf_stride=4, round1_corner_stride=2,
                            iters_per_round=(10, 20)),
        "cf_s16c8": dict(round1_surf_stride=16, round1_corner_stride=8),
        "cf_s8c4_i10": dict(round1_surf_stride=8, round1_corner_stride=4,
                            iters_per_round=(10, 20)),
        "cf_s8c4_K6": dict(round1_surf_stride=8, round1_corner_stride=4,
                           num_candidates=6),
        # round-5: coarse round-0 + ONE full refetch + shared-pool polish
        "cf_s8c4_tail": dict(round1_surf_stride=8, round1_corner_stride=4,
                             num_rounds=3, shared_fetch="tail",
                             iters_per_round=(8, 12, 10)),
        "cf_s8c4_i12_18": dict(round1_surf_stride=8, round1_corner_stride=4,
                               iters_per_round=(12, 18)),
        "cf_s8c4_i8_14": dict(round1_surf_stride=8, round1_corner_stride=4,
                              iters_per_round=(8, 14)),
        "cf_s8c4_i8_12": dict(round1_surf_stride=8, round1_corner_stride=4,
                              iters_per_round=(8, 12)),
        # skip the full-resolution refetch for lanes already converged on
        # the strided round-0 pool (accuracy risk: those lanes' final pose
        # comes from the strided pool)
        "cf_s8c4_skip": dict(round1_surf_stride=8, round1_corner_stride=4,
                             skip_converged_refetch=True),
        "cf_s4c2_skip": dict(round1_surf_stride=4, round1_corner_stride=2,
                             skip_converged_refetch=True),
        "cf_s2_skip": dict(round1_surf_stride=2, skip_converged_refetch=True),
        "cf_s8c4_presort": dict(round1_surf_stride=8, round1_corner_stride=4,
                                presort_rows=True),
        "cf_s8c4_tail_K6": dict(round1_surf_stride=8, round1_corner_stride=4,
                                num_rounds=3, shared_fetch="tail",
                                iters_per_round=(8, 12, 10),
                                num_candidates=6),
    }
    names = sys.argv[1:] or list(CONFIGS)

    # oracle subset (exact host solve)
    import oracle as oracle_mod
    feats_np = jax.tree.map(np.asarray, feats)
    mc = np.asarray(mcx)[np.asarray(mcm)]
    ms = np.asarray(msx)[np.asarray(msm)]
    n_or = min(N_ORACLE, B)
    oracle_poses = []
    for i in range(n_or):
        corner = feats_np.corner_xyz[i][feats_np.corner_mask[i]]
        surf = feats_np.surf_xyz[i][feats_np.surf_mask[i]]
        pose_o, _ = oracle_mod.register_scan(corner, surf, mc, ms, guesses[i])
        oracle_poses.append(pose_o)
    oracle_poses = np.stack(oracle_poses)

    base_poses = None
    for name in names:
        kw = dict(CONFIGS[name])

        def solve(f, p, kw=kw):
            return batch_register_fused(f, ctab, stab, origin, p,
                                        grid_dims=dims, corner_cell_cap=CCAP,
                                        surf_cell_cap=SCAP, **kw)

        solve_j = jax.jit(solve)
        try:
            res = block(solve_j(feats, guesses_j))
        except Exception as e:
            print(json.dumps({"config": name, "error": str(e)[:300]}),
                  flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(REPS):
            res = solve_j(feats, guesses_j)
        block(res)
        dt = (time.perf_counter() - t0) / REPS
        poses = np.array(res.pose6)
        err_t = np.linalg.norm(poses[:, 3:] - gt[:, 3:], axis=1)
        if name == "baseline":
            base_poses = poses
        d_or = np.linalg.norm(poses[:n_or, 3:] - oracle_poses[:, 3:], axis=1)
        out = {
            "config": name,
            "scans_per_s": round(B / dt, 1),
            "ms_per_scan": round(dt / B * 1000, 3),
            "ate_vs_gt_m": round(float(np.sqrt((err_t ** 2).mean())), 5),
            "max_err_vs_gt_m": round(float(err_t.max()), 5),
            "ate_vs_oracle_m": round(float(np.sqrt((d_or ** 2).mean())), 6),
            "max_vs_oracle_m": round(float(d_or.max()), 6),
            "n_converged": int(np.array(res.converged).sum()),
        }
        if base_poses is not None and name != "baseline":
            d_b = np.linalg.norm(poses[:, 3:] - base_poses[:, 3:], axis=1)
            out["rms_vs_baseline_m"] = round(
                float(np.sqrt((d_b ** 2).mean())), 6)
            out["max_vs_baseline_m"] = round(float(d_b.max()), 6)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
