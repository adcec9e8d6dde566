import numpy as np
import jax
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.io.synthetic import (
    SyntheticWorld, simulate_scan, build_feature_map)
from feature_base_pointcloud_registration_tpu.ops.projection import project_scan
from feature_base_pointcloud_registration_tpu.ops.features import extract_features
from feature_base_pointcloud_registration_tpu.parallel.batch import (
    batch_register, make_mesh, shard_register)
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
    FeatureMap, RawScan, ScanFeatures)
from feature_base_pointcloud_registration_tpu.pipeline.frontend import (
    downsample_features)

PARAMS = Params(map_corner_cap=8192, map_surf_cap=65536, knn_chunk=2048)


def _make_batch(B=8):
    world = SyntheticWorld()
    rng = np.random.RandomState(0)
    feats_list, gt, guesses = [], [], []
    for b in range(B):
        pose = np.array([0, 0, rng.uniform(-1, 1),
                         rng.uniform(-5, 5), rng.uniform(-5, 5), 0.0],
                        np.float32)
        s = simulate_scan(world, pose, seed=b)
        raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"])
        raw = raw._replace(valid=jnp.asarray(s["valid"]))
        cloud = project_scan(PARAMS, raw, None)
        feats = downsample_features(PARAMS, extract_features(PARAMS, cloud))
        feats_list.append(feats)
        gt.append(pose)
        guesses.append(pose + rng.uniform(-1, 1, 6).astype(np.float32)
                       * np.array([0.02, 0.02, 0.04, 0.3, 0.3, 0.1]))
    feats = jax.tree.map(lambda *a: jnp.stack(a), *feats_list)
    mcx, mcm, msx, msm = build_feature_map(
        world, PARAMS.map_corner_cap, PARAMS.map_surf_cap)
    fmap = FeatureMap(jnp.asarray(mcx), jnp.asarray(mcm),
                      jnp.asarray(msx), jnp.asarray(msm))
    return feats, fmap, np.stack(gt), jnp.asarray(np.stack(guesses))


def test_batch_register_vmap():
    feats, fmap, gt, guesses = _make_batch(4)
    res = batch_register(feats, fmap, guesses, chunk=PARAMS.knn_chunk)
    poses = np.array(res.pose6)
    err_t = np.linalg.norm(poses[:, 3:] - gt[:, 3:], axis=1)
    assert (err_t < 0.05).all(), err_t
    assert np.array(res.valid).all()


def test_shard_register_8_devices():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    mesh = make_mesh(jax.devices()[:8])
    feats, fmap, gt, guesses = _make_batch(8)
    res, stats = shard_register(mesh, feats, fmap, guesses,
                                chunk=PARAMS.knn_chunk)
    poses = np.array(res.pose6)
    err_t = np.linalg.norm(poses[:, 3:] - gt[:, 3:], axis=1)
    assert (err_t < 0.05).all(), err_t
    assert int(stats["n_total"]) == 8
    assert int(stats["n_converged"]) >= 6


def test_shard_matches_vmap():
    mesh = make_mesh(jax.devices()[:8])
    feats, fmap, gt, guesses = _make_batch(8)
    res_v = batch_register(feats, fmap, guesses, chunk=PARAMS.knn_chunk)
    res_s, _ = shard_register(mesh, feats, fmap, guesses,
                              chunk=PARAMS.knn_chunk)
    # XLA schedules/fuses differently under shard_map; slightly different
    # f32 rounding shifts the GN early-exit iterate by ~the convergence
    # threshold (0.05 cm) — solutions agree to ~1 mm
    np.testing.assert_allclose(np.array(res_v.pose6), np.array(res_s.pose6),
                               atol=2e-3)


def test_shard_register_tables_blocks_8_devices():
    """Data-parallel shard_map of the grid-table solver (blocks path on the
    virtual CPU mesh; the fused path swaps in on TPU meshes) matches the
    unsharded solve exactly — tables replicated, batch sharded."""
    from feature_base_pointcloud_registration_tpu.parallel.batch import (
        batch_register_blocks, build_map_block_tables, shard_register_tables)

    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    mesh = make_mesh(jax.devices()[:8])
    feats, fmap, gt, guesses = _make_batch(8)
    world = SyntheticWorld()
    center = np.array([0.0, 0.0, (world.ground_z + world.ceil_z) / 2],
                      np.float32)
    half = np.array([world.half_x + 1, world.half_y + 1,
                     (world.ceil_z - world.ground_z) / 2 + 1], np.float32)
    ctab, stab, origin, dims = build_map_block_tables(
        fmap, center, half, corner_cell_cap=32, surf_cell_cap=48)

    res, stats = shard_register_tables(
        mesh, feats, ctab, stab, origin, guesses, grid_dims=dims,
        solver="blocks", corner_cell_cap=32, surf_cell_cap=48)
    ref = batch_register_blocks(feats, ctab, stab, origin, guesses,
                                grid_dims=dims, corner_cell_cap=32,
                                surf_cell_cap=48)

    np.testing.assert_allclose(np.array(res.pose6), np.array(ref.pose6),
                               atol=1e-5)
    assert int(stats["n_total"]) == 8
    assert int(stats["n_converged"]) == int(np.array(ref.converged).sum())
    err_t = np.linalg.norm(np.array(res.pose6)[:, 3:] - gt[:, 3:], axis=1)
    assert (err_t < 0.05).all(), err_t


def test_map_sharded_tables_matches_replicated():
    """Map-SHARDED grid tables (2-D data x map mesh, per-shard block fetch +
    all_gather top-K merge) match the replicated-table blocks solver: the
    striped shards' union candidate pool equals the single table's pool
    (zero overflow at these caps), and distributed top-K is exact."""
    from feature_base_pointcloud_registration_tpu.parallel.batch import (
        batch_register_blocks, build_map_block_tables)
    from feature_base_pointcloud_registration_tpu.parallel.map_sharded import (
        build_sharded_block_tables, make_2d_mesh, map_sharded_register_tables)

    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    mesh = make_2d_mesh(8, data=2)          # 2 data x 4 map shards
    feats, fmap, gt, guesses = _make_batch(4)
    world = SyntheticWorld()
    center = np.array([0.0, 0.0, (world.ground_z + world.ceil_z) / 2],
                      np.float32)
    half = np.array([world.half_x + 1, world.half_y + 1,
                     (world.ceil_z - world.ground_z) / 2 + 1], np.float32)

    # replicated reference: generous caps = zero overflow
    ctab, stab, origin, dims = build_map_block_tables(
        fmap, center, half, corner_cell_cap=32, surf_cell_cap=48)
    ref = batch_register_blocks(feats, ctab, stab, origin, guesses,
                                grid_dims=dims, corner_cell_cap=32,
                                surf_cell_cap=48)

    ctabs, stabs, origin_s, dims_s = build_sharded_block_tables(
        fmap, center, half, 4, corner_cell_cap=32, surf_cell_cap=48)
    assert dims_s == dims
    res, stats = map_sharded_register_tables(
        mesh, feats, ctabs, stabs, origin_s, guesses, grid_dims=dims_s,
        corner_cell_cap=32, surf_cell_cap=48)

    # identical candidate pools mod distance ties -> sub-mm pose agreement
    np.testing.assert_allclose(np.array(res.pose6), np.array(ref.pose6),
                               atol=1e-3)
    err_t = np.linalg.norm(np.array(res.pose6)[:, 3:] - gt[:, 3:], axis=1)
    assert (err_t < 0.05).all(), err_t
    assert int(stats["n_converged"]) == int(np.array(ref.converged).sum())
