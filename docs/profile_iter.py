"""Isolate per-GN-iteration cost: correspondence math vs loop structure."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from feature_base_pointcloud_registration_tpu.ops.correspondence import (
    corner_correspondence, surf_correspondence)
from feature_base_pointcloud_registration_tpu.ops.register import make_candidate_knn
from feature_base_pointcloud_registration_tpu.ops.solver import GNState, gn_step
from feature_base_pointcloud_registration_tpu.geom.se3 import euler_to_rot

B, NC, NS, K = 32, 2048, 8192, 8
key = jax.random.PRNGKey(0)
kc, ks, kp = jax.random.split(key, 3)
corner = jax.random.uniform(kc, (B, NC, 3), minval=-10, maxval=10)
surf = jax.random.uniform(ks, (B, NS, 3), minval=-10, maxval=10)
cmask = jnp.ones((B, NC), bool)
smask = jnp.ones((B, NS), bool)
# synthetic candidates: near-neighbors of each point
ccand = corner[:, :, None, :] + jax.random.normal(kp, (B, NC, K, 3)) * 0.05
scand = surf[:, :, None, :] + jax.random.normal(kp, (B, NS, K, 3)) * 0.05
ccv = jnp.ones((B, NC, K), bool)
scv = jnp.ones((B, NS, K), bool)
pose0 = jnp.tile(jnp.asarray([0.01, -0.01, 0.02, 0.1, -0.1, 0.05]), (B, 1)).astype(jnp.float32)


def timeit(name, f, reps=20):
    r = f(); jax.tree.map(lambda a: a.block_until_ready(), r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.tree.map(lambda a: a.block_until_ready(), r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1000:9.2f} ms/call")
    return dt


def one_iter(f_c, f_s, cm, sm, cc, ccv, sc, scv, state, it):
    pose = state.pose6
    R = euler_to_rot(pose[0], pose[1], pose[2])
    t = pose[3:6]
    cw = f_c @ R.T + t
    sw = f_s @ R.T + t
    c_coeff, c_resid, c_mask = corner_correspondence(cw, cm, make_candidate_knn(cc, ccv))
    s_coeff, s_resid, s_mask = surf_correspondence(sw, sm, make_candidate_knn(sc, scv))
    pts = jnp.concatenate([f_c, f_s], 0)
    coeff = jnp.concatenate([c_coeff, s_coeff], 0)
    resid = jnp.concatenate([c_resid, s_resid], 0)
    mask = jnp.concatenate([c_mask, s_mask], 0)
    return gn_step(state, pts, coeff, resid, mask, it)


def init_state(pose):
    z = pose.sum() * 0.0
    return GNState(pose6=pose, matP=jnp.eye(6) + z, is_degenerate=z > 1,
                   converged=z > 1, n_corr=z.astype(jnp.int32))


@jax.jit
def single_iter(pose0):
    def one(fc, fs, cm, sm, cc, ccv, sc, scv, p):
        st = init_state(p)
        st = one_iter(fc, fs, cm, sm, cc, ccv, sc, scv, st, 0)
        return st.pose6
    return jax.vmap(one)(corner, surf, cmask, smask, ccand, ccv, scand, scv, pose0)


@jax.jit
def scan15(pose0):
    def one(fc, fs, cm, sm, cc, ccv, sc, scv, p):
        st = init_state(p)
        def body(st, it):
            st2 = one_iter(fc, fs, cm, sm, cc, ccv, sc, scv, st, it)
            # freeze converged lanes
            st = jax.tree.map(lambda a, b: jnp.where(st.converged, a, b), st, st2)
            return st, None
        st, _ = lax.scan(body, st, jnp.arange(15))
        return st.pose6
    return jax.vmap(one)(corner, surf, cmask, smask, ccand, ccv, scand, scv, pose0)


@jax.jit
def while15(pose0):
    def one(fc, fs, cm, sm, cc, ccv, sc, scv, p):
        st = init_state(p)
        def cond(c):
            it, st = c
            return (it < 15) & ~st.converged
        def body(c):
            it, st = c
            st = one_iter(fc, fs, cm, sm, cc, ccv, sc, scv, st, it)
            return it + 1, st
        _, st = lax.while_loop(cond, body, (jnp.int32(0) + (p.sum()*0).astype(jnp.int32), st))
        return st.pose6
    return jax.vmap(one)(corner, surf, cmask, smask, ccand, ccv, scand, scv, pose0)


# correspondence math only, no gn
@jax.jit
def corr_only(pose0):
    def one(fc, fs, cm, sm, cc, ccv, sc, scv, p):
        R = euler_to_rot(p[0], p[1], p[2])
        cw = fc @ R.T + p[3:6]
        sw = fs @ R.T + p[3:6]
        c_coeff, c_resid, c_mask = corner_correspondence(cw, cm, make_candidate_knn(cc, ccv))
        s_coeff, s_resid, s_mask = surf_correspondence(sw, sm, make_candidate_knn(sc, scv))
        return c_coeff.sum() + s_coeff.sum()
    return jax.vmap(one)(corner, surf, cmask, smask, ccand, ccv, scand, scv, pose0)


# knn-within-candidates only
@jax.jit
def knn_only(pose0):
    def one(fc, fs, cc, ccv, sc, scv, p):
        R = euler_to_rot(p[0], p[1], p[2])
        cw = fc @ R.T + p[3:6]
        sw = fs @ R.T + p[3:6]
        d1, n1 = make_candidate_knn(cc, ccv)(cw)
        d2_, n2 = make_candidate_knn(sc, scv)(sw)
        return d1.sum() + d2_.sum()
    return jax.vmap(one)(corner, surf, ccand, ccv, scand, scv, pose0)


timeit("1 iteration (corr + gn_step)", lambda: single_iter(pose0))
timeit("correspondence only", lambda: corr_only(pose0))
timeit("knn-in-candidates only", lambda: knn_only(pose0))
timeit("scan x15 (fixed, masked)", lambda: scan15(pose0))
timeit("while_loop x15", lambda: while15(pose0))
