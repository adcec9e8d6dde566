"""Trace the fused Pallas solve (batch_register_fused) at bench shapes.

    python scripts/profile_fused_solve.py [--batch 128] [--trace /tmp/sv]
    python scripts/op_profile.py /tmp/sv --line "XLA Ops"

Divide printed per-op totals by --reps for per-batch numbers.
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--shared-fetch", action="store_true")
    ap.add_argument("--skip-conv", action="store_true",
                    help="skip round-2 refetch + re-verify for lanes that "
                         "converged in round 1")
    ap.add_argument("--num-candidates", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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

    B = args.batch
    params = Params(map_corner_cap=16384, map_surf_cap=65536, knn_chunk=4096)
    world = SyntheticWorld()
    rng = np.random.RandomState(0)

    raw_list, gt_list = [], []
    for i in range(min(B, 32)):
        pose = np.array([0, 0, rng.uniform(-1, 1), rng.uniform(-6, 6),
                         rng.uniform(-6, 6), 0.0], np.float32)
        s = simulate_scan(world, pose, seed=i)
        raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                 s["time"])
        raw = raw._replace(valid=jnp.asarray(s["valid"]))
        raw_list.append(jax.tree.map(np.asarray, raw))
        gt_list.append(pose)
    idx = np.arange(B) % len(raw_list)
    raws = jax.tree.map(
        lambda *a: jnp.asarray(np.stack([np.asarray(x) for x in a])),
        *[raw_list[i] for i in idx])
    gt = np.stack([gt_list[i] for i in idx])
    guesses = gt + rng.uniform(-1, 1, (B, 6)).astype(np.float32) * np.array(
        [0.02, 0.02, 0.05, 0.3, 0.3, 0.1], np.float32)
    guesses_j = jnp.asarray(guesses)

    @jax.jit
    def frontend(raws):
        def one(raw):
            cloud = project_scan(params, raw, None)
            return downsample_features(
                params, extract_features(params, cloud, strict=False))
        return jax.vmap(one)(raws)

    feats = frontend(raws)
    jax.block_until_ready(feats)

    mcx, mcm, msx, msm = build_feature_map(world, params.map_corner_cap,
                                           params.map_surf_cap)
    fmap = FeatureMap(jnp.asarray(mcx), jnp.asarray(mcm),
                      jnp.asarray(msx), jnp.asarray(msm))
    center = np.array([0.0, 0.0, (world.ground_z + world.ceil_z) / 2],
                      np.float32)
    half = np.array([world.half_x + 1, world.half_y + 1,
                     (world.ceil_z - world.ground_z) / 2 + 1], np.float32)
    CCAP, SCAP = 32, 48
    ctab, stab, origin, dims = build_map_planar_tables(
        fmap, center, half, corner_cell_cap=CCAP, surf_cell_cap=SCAP)

    def solve(f, p):
        return batch_register_fused(
            f, ctab, stab, origin, p, grid_dims=dims,
            corner_cell_cap=CCAP, surf_cell_cap=SCAP,
            num_rounds=args.rounds, iters_per_round=args.iters,
            num_candidates=args.num_candidates,
            shared_fetch=args.shared_fetch,
            skip_converged_refetch=args.skip_conv)

    def block(r):
        jax.tree.map(lambda a: a.block_until_ready(), r)
        np.asarray(jax.tree.leaves(r)[0])
        return r

    res = block(solve(feats, guesses_j))
    print("converged:", int(np.asarray(res.converged).sum()), "/", B)

    def timed():
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = solve(feats, guesses_j)
        block(r)
        return (time.perf_counter() - t0) / args.reps

    t = timed()
    print(f"B={B} shared_fetch={args.shared_fetch} "
          f"skip_conv={args.skip_conv} K={args.num_candidates}: "
          f"{t / B * 1000:.3f} ms/scan  {B / t:.1f} scans/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            block(solve(feats, guesses_j))
        print("trace written to", args.trace)

    # pose error vs ground truth translation (stale-candidate degradation
    # shows up here)
    poses = np.asarray(res.pose6)
    err = np.linalg.norm(poses[:, 3:] - gt[:, 3:], axis=1)
    print(f"pose err vs gt: mean {err.mean() * 100:.2f} cm  "
          f"max {err.max() * 100:.2f} cm")


if __name__ == "__main__":
    main()
