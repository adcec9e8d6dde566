"""Benchmark: batched scan-to-map registration throughput (scans/s).

The driver runs this on real TPU hardware.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scans/s", "vs_baseline": N}

vs_baseline is measured against BASELINE.json's north-star target of
1000 scans/s batched scan-to-map registration (the reference publishes no
throughput numbers; its config caps processing at ~6.7 Hz,
/root/reference/config/params.yaml:61).

What runs (all on-device, jitted):
  frontend: vmapped projection + compaction + fast feature picking + voxel
            downsample over B distinct scans (cloudHandler chain,
            ref: src/imageProjection.cpp:182-226)
  solve:    Pallas fused-fetch hash-grid candidate search + rounds-structured
            GN solve, vmapped over the batch (scan2MapOptimization,
            ref: src/mapOptmization.h:1403-1442)

Reported: headline = solve-only scans/s (the BASELINE metric); extras carry
the honest end-to-end (frontend+solve) number, ATE vs ground truth AND vs
the serial NumPy oracle (tests/oracle.py) on a subset, and the hash-grid
overflow diagnostics (silent candidate drops would show up here).
"""

import json
import os
import sys
import time
import traceback

import numpy as np


def main():
    """Emit exactly ONE JSON line, even when the TPU backend is down.

    On any failure (backend init, compile, runtime) prints a parseable
    diagnosis line ({"metric": ..., "value": 0, "error": ...}) and exits 1,
    so the driver captures a diagnosis instead of a raw traceback
    (round-3's BENCH artifact was a stack dump).
    """
    try:
        run()
    except BaseException as e:  # noqa: BLE001 - the whole point is loudness
        tb = traceback.format_exc(limit=3)
        print(json.dumps({
            "metric": "batched scan-to-map registration throughput",
            "value": 0,
            "unit": "scans/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
            "traceback_tail": tb[-1500:],
        }))
        sys.exit(1)


def run():
    # Backend-init watchdog: a dead TPU relay HANGS inside device discovery
    # (a blocking C connect — it neither raises nor lets a SIGALRM Python
    # handler run), so without this the except-path JSON never prints and
    # the driver sees only its own timeout (round-3 failure mode).  A
    # daemon-thread timer can print + _exit regardless of what blocks the
    # main thread.
    import threading

    _INIT_BUDGET = int(os.environ.get("BENCH_INIT_TIMEOUT", "150"))

    def _init_timed_out():
        print(json.dumps({
            "metric": "batched scan-to-map registration throughput",
            "value": 0,
            "unit": "scans/s",
            "vs_baseline": 0.0,
            "error": ("tpu_unavailable: backend initialization exceeded "
                      f"{_INIT_BUDGET}s (TPU relay down or unreachable)"),
        }), flush=True)
        os._exit(1)

    _watchdog = threading.Timer(_INIT_BUDGET, _init_timed_out)
    _watchdog.daemon = True
    _watchdog.start()

    import jax
    import jax.numpy as jnp

    jax.devices()          # forces backend init under the watchdog
    _watchdog.cancel()     # init done; compiles/runs get the full budget

    # persistent compile cache: amortizes the (slow, remote) TPU compile
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/fbpr_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from feature_base_pointcloud_registration_tpu.config import Params
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        SyntheticWorld, build_feature_map, simulate_scan)
    from feature_base_pointcloud_registration_tpu.ops.features import (
        extract_features)
    from feature_base_pointcloud_registration_tpu.ops.hashgrid import (
        grid_overflow_fraction)
    from feature_base_pointcloud_registration_tpu.ops.projection import (
        project_scan)
    from feature_base_pointcloud_registration_tpu.parallel.batch import (
        batch_register_blocks, batch_register_fused, build_map_block_tables,
        build_map_planar_tables)
    from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
        FeatureMap, RawScan)
    from feature_base_pointcloud_registration_tpu.pipeline.frontend import (
        downsample_features)

    B = int(os.environ.get("BENCH_BATCH", "256"))
    REPS = int(os.environ.get("BENCH_REPS", "10"))
    N_ORACLE = int(os.environ.get("BENCH_ORACLE_SCANS", "8"))
    params = Params(map_corner_cap=16384, map_surf_cap=65536, knn_chunk=4096)

    world = SyntheticWorld()
    rng = np.random.RandomState(0)

    # B DISTINCT scans (no tiling), spread across the world
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

    # corner cell cap 32 / surf 48: zero grid overflow on this map (16
    # dropped 2.5% of corner points — BENCH_r02's known defect)
    CCAP, SCAP = 32, 48
    on_tpu = jax.default_backend() == "tpu"
    # BENCH_SOLVER=blocks forces the XLA block path even on TPU — the tested
    # fallback switch for a fused-kernel compile/parity failure.
    solver_name = os.environ.get("BENCH_SOLVER",
                                 "fused" if on_tpu else "blocks")
    # Coarse-to-fine round-0 query subsampling (round-4 lever): the fetch is
    # ~85% of solve time and round 0 only needs to carry the pose into the
    # full-resolution round-1 pool's validity basin.  surf/8 + corner/4
    # measured 1417 scans/s vs 872 full-resolution, with oracle parity
    # UNCHANGED (2.1e-4 m) and identical convergence; the cliff is at
    # surf/16 (ate 0.16 m) — scripts/exp_solve_throughput.py.
    R1S = int(os.environ.get("BENCH_R1_SURF_STRIDE", "8"))
    R1C = int(os.environ.get("BENCH_R1_CORNER_STRIDE", "4"))
    if solver_name == "fused":
        # fused path: Pallas fetch (sorted-dedup row DMAs) + Pallas GN-round
        # mega-kernel, per-lane early exit (ops/pallas_gn.py)
        ctab, stab, origin, dims = build_map_planar_tables(
            fmap, center, half, corner_cell_cap=CCAP, surf_cell_cap=SCAP)

        def solve(feats, poses):
            return batch_register_fused(feats, ctab, stab, origin, poses,
                                        grid_dims=dims,
                                        corner_cell_cap=CCAP,
                                        surf_cell_cap=SCAP,
                                        round1_surf_stride=R1S,
                                        round1_corner_stride=R1C)
    else:
        ctab, stab, origin, dims = build_map_block_tables(
            fmap, center, half, corner_cell_cap=CCAP, surf_cell_cap=SCAP)

        def solve(feats, poses):
            return batch_register_blocks(feats, ctab, stab, origin, poses,
                                         grid_dims=dims,
                                         corner_cell_cap=CCAP,
                                         surf_cell_cap=SCAP)

    @jax.jit
    def frontend(raws):
        def one(raw):
            cloud = project_scan(params, raw, None)
            return downsample_features(
                params, extract_features(params, cloud, strict=False))
        return jax.vmap(one)(raws)

    @jax.jit
    def frontend_strict(raws):
        def one(raw):
            cloud = project_scan(params, raw, None)
            return downsample_features(
                params, extract_features(params, cloud, strict=True))
        return jax.vmap(one)(raws)

    @jax.jit
    def end_to_end(raws, poses):
        return solve(frontend(raws), poses)

    def block(r):
        # fetch a leaf value, not just block_until_ready: through the axon
        # remote-TPU tunnel block_until_ready can return at dispatch time,
        # while a host fetch must wait for the full queue to drain — the
        # honest end-of-timing barrier
        jax.tree.map(lambda a: a.block_until_ready(), r)
        np.asarray(jax.tree.leaves(r)[0])
        return r

    # warmup/compile
    feats = block(frontend(raws))
    res = block(solve(feats, guesses_j))
    block(end_to_end(raws, guesses_j))

    t0 = time.perf_counter()
    for _ in range(REPS):
        res = solve(feats, guesses_j)
    block(res)
    t_solve = (time.perf_counter() - t0) / REPS

    t0 = time.perf_counter()
    for _ in range(REPS):
        feats2 = frontend(raws)
    block(feats2)
    t_frontend = (time.perf_counter() - t0) / REPS

    t0 = time.perf_counter()
    for _ in range(REPS):
        res_e2e = end_to_end(raws, guesses_j)
    block(res_e2e)
    t_e2e = (time.perf_counter() - t0) / REPS

    # strict bit-parity feature picking: the honest "reference-equivalent
    # output" end-to-end number (fast mode matches it on test scenes but is
    # not the serialized reference stream)
    @jax.jit
    def end_to_end_strict(raws, poses):
        return solve(frontend_strict(raws), poses)

    block(end_to_end_strict(raws, guesses_j))
    t0 = time.perf_counter()
    for _ in range(REPS):
        res_st = end_to_end_strict(raws, guesses_j)
    block(res_st)
    t_e2e_strict = (time.perf_counter() - t0) / REPS

    solve_sps = B / t_solve
    e2e_sps = B / t_e2e
    e2e_strict_sps = B / t_e2e_strict

    # batch sweep: scans/s vs batch size on the solve path (throughput must
    # be monotone in B — the axis the v5p-8 north star scales along)
    sweep = {}
    for Bs in [int(x) for x in
               os.environ.get("BENCH_SWEEP", "32,64,128,256").split(",") if x]:
        reps_s = max(2, min(REPS, 2048 // Bs))
        idx = np.arange(Bs) % B
        feats_s = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[idx]),
                               feats)
        guesses_s = jnp.asarray(guesses[idx])
        block(solve(feats_s, guesses_s))
        t0 = time.perf_counter()
        for _ in range(reps_s):
            r = solve(feats_s, guesses_s)
        block(r)
        sweep[str(Bs)] = round(Bs / ((time.perf_counter() - t0) / reps_s), 2)

    poses = np.array(res.pose6)
    err_t = np.linalg.norm(poses[:, 3:] - gt[:, 3:], axis=1)
    ate_gt = float(np.sqrt((err_t ** 2).mean()))

    # ATE vs the serial NumPy oracle (the BASELINE.json parity metric) on a
    # subset — the oracle is exact-but-slow host code.
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import oracle as oracle_mod
    n_or = min(N_ORACLE, B)
    feats_np = jax.tree.map(np.asarray, feats)
    mc = np.asarray(mcx)[np.asarray(mcm)]
    ms = np.asarray(msx)[np.asarray(msm)]
    oracle_poses = []
    for i in range(n_or):
        corner = feats_np.corner_xyz[i][feats_np.corner_mask[i]]
        surf = feats_np.surf_xyz[i][feats_np.surf_mask[i]]
        pose_o, _ = oracle_mod.register_scan(corner, surf, mc, ms, guesses[i])
        oracle_poses.append(pose_o)
    oracle_poses = np.stack(oracle_poses)

    def parity_vs_oracle(pose_arr):
        d = pose_arr[:n_or, 3:] - oracle_poses[:, 3:]
        return float(np.sqrt((d ** 2).sum(-1).mean()))

    ate_oracle = parity_vs_oracle(poses)

    # Per-stride parity: the coarse-to-fine round-0 subsampling is the one
    # knob with a known accuracy cliff (surf/16 -> 0.16 m); report the
    # full-resolution (stride-1) parity alongside the default so drift is
    # attributable to the stride, not the solver.
    ate_oracle_fullres = None
    if solver_name == "fused" and (R1S > 1 or R1C > 1) and os.environ.get(
            "BENCH_PARITY_FULLRES", "1") == "1":
        res_fr = block(batch_register_fused(
            feats, ctab, stab, origin, guesses_j, grid_dims=dims,
            corner_cell_cap=CCAP, surf_cell_cap=SCAP))
        ate_oracle_fullres = round(
            parity_vs_oracle(np.array(res_fr.pose6)), 6)

    # HARD parity gate (BASELINE.json north star: ATE within 1e-3 m of the
    # reference math).  A stride/config regression past the budget must not
    # exit 0 with a quietly bad number.
    parity_budget = float(os.environ.get("BENCH_PARITY_BUDGET", "1e-3"))
    parity_error = None
    if ate_oracle > parity_budget:
        parity_error = (f"oracle_parity_regression: ate_vs_oracle_m="
                        f"{ate_oracle:.3e} > budget {parity_budget:.0e}")

    # the fused solver under shard_map on a real TPU mesh (1 device here;
    # the v5p-8 deployment shape is this exact wrapper with more devices) —
    # proves the flagship kernel compiles + runs inside the sharded program,
    # not just via the blocks proxy the CPU dryrun uses.
    sharded_fused_sps = None
    if solver_name == "fused" and on_tpu:
        from feature_base_pointcloud_registration_tpu.parallel.batch import (
            make_mesh, shard_register_tables)
        mesh1 = make_mesh(jax.devices()[:1])

        def solve_sharded(f, p):
            return shard_register_tables(
                mesh1, f, ctab, stab, origin, p, grid_dims=dims,
                solver="fused", corner_cell_cap=CCAP, surf_cell_cap=SCAP,
                round1_surf_stride=R1S, round1_corner_stride=R1C)

        r, st = solve_sharded(feats, guesses_j)
        block(r)
        assert int(st["n_total"]) == B, st
        t0 = time.perf_counter()
        for _ in range(REPS):
            r, st = solve_sharded(feats, guesses_j)
        block(r)
        sharded_fused_sps = round(B / ((time.perf_counter() - t0) / REPS), 2)

    # hash-grid overflow: fraction of map points silently dropped by cell caps
    ovf_c = float(grid_overflow_fraction(
        fmap.corner_xyz, fmap.corner_mask, origin, 2.0, dims=dims,
        cell_cap=CCAP))
    ovf_s = float(grid_overflow_fraction(
        fmap.surf_xyz, fmap.surf_mask, origin, 2.0, dims=dims,
        cell_cap=SCAP))

    out = {
        "metric": "batched scan-to-map registration throughput",
        "value": round(solve_sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(solve_sps / 1000.0, 4),
        "extra": {
            "batch": B,
            "reps": REPS,
            "distinct_scans": B,
            "solve_ms_per_scan": round(t_solve / B * 1000.0, 3),
            "frontend_ms_per_scan": round(t_frontend / B * 1000.0, 3),
            "e2e_scans_per_s": round(e2e_sps, 2),
            "e2e_strict_scans_per_s": round(e2e_strict_sps, 2),
            "batch_sweep": sweep,
            "ate_vs_gt_m": round(ate_gt, 5),
            "ate_vs_oracle_m": round(ate_oracle, 6),
            "ate_vs_oracle_fullres_m": ate_oracle_fullres,
            "round1_strides": {"surf": R1S, "corner": R1C},
            "oracle_scans": n_or,
            "n_converged": int(np.array(res.converged).sum()),
            "grid_overflow_corner": round(ovf_c, 6),
            "grid_overflow_surf": round(ovf_s, 6),
            "sharded_fused_scans_per_s": sharded_fused_sps,
            "solver": ("pallas_fused_gn" if solver_name == "fused"
                       else "xla_blocks"),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    if parity_error is not None:
        out["error"] = parity_error
    print(json.dumps(out))
    if parity_error is not None:
        sys.exit(1)


if __name__ == "__main__":
    main()
