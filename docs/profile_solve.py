"""Ablation profile of the batched solve hot path (run on TPU)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.io.synthetic import (
    SyntheticWorld, build_feature_map, simulate_scan)
from feature_base_pointcloud_registration_tpu.ops.features import extract_features
from feature_base_pointcloud_registration_tpu.ops.projection import project_scan
from feature_base_pointcloud_registration_tpu.parallel.batch import (
    batch_register_blocks, build_map_block_tables)
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
    FeatureMap, RawScan)
from feature_base_pointcloud_registration_tpu.pipeline.frontend import (
    downsample_features)

B = 32
params = Params(map_corner_cap=16384, map_surf_cap=65536, knn_chunk=4096)
world = SyntheticWorld()
rng = np.random.RandomState(0)

feats_list, gt_list = [], []
for i in range(8):
    pose = np.array([0, 0, rng.uniform(-1, 1), rng.uniform(-6, 6),
                     rng.uniform(-6, 6), 0.0], np.float32)
    s = simulate_scan(world, pose, seed=i)
    raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"])
    raw = raw._replace(valid=jnp.asarray(s["valid"]))
    cloud = project_scan(params, raw, None)
    feats = downsample_features(params, extract_features(params, cloud))
    feats_list.append(jax.tree.map(np.asarray, feats))
    gt_list.append(pose)

idx = np.arange(B) % 8
feats = jax.tree.map(lambda *a: jnp.asarray(np.stack([np.asarray(x) for x in a])),
                     *[feats_list[i] for i in idx])
gt = np.stack([gt_list[i] for i in idx])
guesses = gt + rng.uniform(-1, 1, (B, 6)).astype(np.float32) * np.array(
    [0.02, 0.02, 0.05, 0.3, 0.3, 0.1], np.float32)
mcx, mcm, msx, msm = build_feature_map(world, params.map_corner_cap, params.map_surf_cap)
fmap = FeatureMap(jnp.asarray(mcx), jnp.asarray(mcm), jnp.asarray(msx), jnp.asarray(msm))
guesses_j = jnp.asarray(guesses)
center = np.array([0.0, 0.0, (world.ground_z + world.ceil_z) / 2], np.float32)
half = np.array([world.half_x + 1, world.half_y + 1,
                 (world.ceil_z - world.ground_z) / 2 + 1], np.float32)
ctab, stab, origin, dims = build_map_block_tables(fmap, center, half)


def timeit(name, f, reps=10):
    r = f(); jax.tree.map(lambda a: a.block_until_ready() if hasattr(a, 'block_until_ready') else a, r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.tree.map(lambda a: a.block_until_ready() if hasattr(a, 'block_until_ready') else a, r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1000:9.2f} ms/call   {B/dt:9.1f} scans/s")
    return dt


# 1. current production path (2 rounds x 15 iters)
timeit("blocks 2x15 (bench baseline)",
       lambda: batch_register_blocks(feats, ctab, stab, origin, guesses_j, grid_dims=dims))

# 2. rounds/iters ablation
for nr, ipr in [(1, 1), (1, 5), (1, 15), (2, 5), (4, 4)]:
    timeit(f"blocks {nr}x{ipr}",
           lambda nr=nr, ipr=ipr: batch_register_blocks(
               feats, ctab, stab, origin, guesses_j, grid_dims=dims,
               num_rounds=nr, iters_per_round=ipr))

# 3. eigh cost in isolation
key = jax.random.PRNGKey(0)
A = jax.random.normal(key, (B, 6, 6))
A = jnp.einsum('bij,bkj->bik', A, A)

@jax.jit
def eigh30(A):
    def body(c, _):
        lam, V = jnp.linalg.eigh(A + c[:, None, None])
        return c + lam[:, 0], None
    c, _ = jax.lax.scan(body, jnp.zeros(B), None, length=30)
    return c

timeit("eigh [32,6,6] x30", lambda: eigh30(A))

@jax.jit
def chol30(A):
    def body(c, _):
        L = jnp.linalg.cholesky(A + jnp.eye(6) * 1e3 + c[:, None, None] * 0)
        return c + L[:, 0, 0], None
    c, _ = jax.lax.scan(body, jnp.zeros(B), None, length=30)
    return c

timeit("cholesky [32,6,6] x30", lambda: chol30(A))


# 4. candidate fetch cost in isolation (one round's fetch)
from feature_base_pointcloud_registration_tpu.ops.hashgrid import make_block_grid_knn
cfetch = make_block_grid_knn(ctab, origin, 2.0, dims=dims, cell_cap=16, k=8)
sfetch = make_block_grid_knn(stab, origin, 2.0, dims=dims, cell_cap=64, k=8)

@jax.jit
def fetch_only(feats, poses):
    from feature_base_pointcloud_registration_tpu.geom.se3 import euler_to_rot
    def one(f, p):
        R = euler_to_rot(p[0], p[1], p[2])
        cw = f.corner_xyz @ R.T + p[3:6]
        sw = f.surf_xyz @ R.T + p[3:6]
        cd, cnn = cfetch(cw)
        sd, snn = sfetch(sw)
        return cd.sum() + sd.sum()
    return jax.vmap(one)(feats, poses)

timeit("fetch only (1 round's prefetch)", lambda: fetch_only(feats, guesses_j))
print("devices:", jax.devices())

# --- round overhead isolation ---
timeit("blocks 1x0 (fetch+scan, no iters)",
       lambda: batch_register_blocks(feats, ctab, stab, origin, guesses_j,
                                     grid_dims=dims, num_rounds=1, iters_per_round=0))
timeit("blocks 1x2", lambda: batch_register_blocks(
    feats, ctab, stab, origin, guesses_j, grid_dims=dims,
    num_rounds=1, iters_per_round=2))

# fetch with the surf table only vs corner only
from feature_base_pointcloud_registration_tpu.geom.se3 import euler_to_rot as _e2r
@jax.jit
def fetch_corner(feats, poses):
    def one(f, p):
        R = _e2r(p[0], p[1], p[2])
        cw = f.corner_xyz @ R.T + p[3:6]
        cd, cnn = cfetch(cw)
        return cd.sum()
    return jax.vmap(one)(feats, poses)

@jax.jit
def fetch_surf(feats, poses):
    def one(f, p):
        R = _e2r(p[0], p[1], p[2])
        sw = f.surf_xyz @ R.T + p[3:6]
        sd, snn = sfetch(sw)
        return sd.sum()
    return jax.vmap(one)(feats, poses)

timeit("fetch corner only", lambda: fetch_corner(feats, guesses_j))
timeit("fetch surf only", lambda: fetch_surf(feats, guesses_j))
