"""Stage-level frontend timing on the current backend.

Breaks the vmapped frontend (projection -> features -> downsample) into
stages and times each jitted separately plus fused, B=32 distinct scans.

    python scripts/profile_frontend.py [--batch 32] [--trace DIR]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--trace", default=None,
                    help="write a jax.profiler trace to this dir")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feature_base_pointcloud_registration_tpu.config import Params
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        SyntheticWorld, simulate_scan)
    from feature_base_pointcloud_registration_tpu.ops.features import (
        extract_features)
    from feature_base_pointcloud_registration_tpu.ops.projection import (
        project_scan)
    from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
        RawScan)
    from feature_base_pointcloud_registration_tpu.pipeline.frontend import (
        downsample_features)

    B = args.batch
    params = Params()
    world = SyntheticWorld()
    raw_list = []
    rng = np.random.RandomState(0)
    for i in range(B):
        pose = np.array([0, 0, rng.uniform(-1, 1), rng.uniform(-6, 6),
                         rng.uniform(-6, 6), 0.0], np.float32)
        s = simulate_scan(world, pose, seed=i)
        raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                 s["time"])
        raw = raw._replace(valid=jnp.asarray(s["valid"]))
        raw_list.append(jax.tree.map(np.asarray, raw))
    raws = jax.tree.map(lambda *a: jnp.asarray(np.stack(a)), *raw_list)

    @jax.jit
    def stage_project(raws):
        return jax.vmap(lambda r: project_scan(params, r, None))(raws)

    @jax.jit
    def stage_features(clouds):
        return jax.vmap(
            lambda c: extract_features(params, c, strict=False))(clouds)

    @jax.jit
    def stage_downsample(feats):
        return jax.vmap(lambda f: downsample_features(params, f))(feats)

    @jax.jit
    def fused(raws):
        def one(raw):
            cloud = project_scan(params, raw, None)
            return downsample_features(
                params, extract_features(params, cloud, strict=False))
        return jax.vmap(one)(raws)

    def block(x):
        jax.tree.map(lambda a: a.block_until_ready(), x)
        return x

    clouds = block(stage_project(raws))
    feats = block(stage_features(clouds))
    block(stage_downsample(feats))
    block(fused(raws))

    def t(fn, *a):
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = fn(*a)
        block(r)
        return (time.perf_counter() - t0) / args.reps / B * 1e3

    print(f"backend={jax.default_backend()} B={B} reps={args.reps}")
    print(f"project    : {t(stage_project, raws):7.3f} ms/scan")
    print(f"features   : {t(stage_features, clouds):7.3f} ms/scan")
    print(f"downsample : {t(stage_downsample, feats):7.3f} ms/scan")
    print(f"fused      : {t(fused, raws):7.3f} ms/scan")

    if args.trace:
        with jax.profiler.trace(args.trace):
            block(fused(raws))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
