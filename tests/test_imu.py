import numpy as np
import jax
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.imu.preintegration import (
    NavState, failure_detection, predict, preintegrate, propagate_states)
from feature_base_pointcloud_registration_tpu.imu.conversion import imu_converter

G = 9.80511


def _simulate_imu(n=100, hz=200.0, seed=0):
    """Ground-truth trajectory + perfect IMU measurements (float64).

    Body rotates with constant rates and accelerates; acc measurement =
    R^T (a_world - g_world)."""
    rng = np.random.RandomState(seed)
    dt = 1.0 / hz
    w_body = np.array([0.1, -0.2, 0.5])
    a_world = np.array([0.3, -0.1, 0.2])
    g_world = np.array([0.0, 0.0, -G])

    R = np.eye(3)
    p = np.zeros(3)
    v = np.zeros(3)
    accs, gyrs, Rs, ps, vs = [], [], [], [], []
    for i in range(n):
        acc_body = R.T @ (a_world - g_world)
        accs.append(acc_body)
        gyrs.append(w_body)
        # integrate ground truth with the same discretization
        p = p + v * dt + 0.5 * (a_world) * dt * dt
        v = v + a_world * dt
        th = np.linalg.norm(w_body * dt)
        k = w_body * dt / th
        Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = R @ (np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx)
        Rs.append(R.copy())
        ps.append(p.copy())
        vs.append(v.copy())
    return (np.array(accs), np.array(gyrs), np.full(n, dt),
            np.array(Rs), np.array(ps), np.array(vs))


def test_preintegrate_predict_zero_bias():
    accs, gyrs, dts, Rs, ps, vs = _simulate_imu(n=100)
    cap = 128
    acc = np.zeros((cap, 3), np.float32); acc[:100] = accs
    gyr = np.zeros((cap, 3), np.float32); gyr[:100] = gyrs
    dt = np.zeros(cap, np.float32); dt[:100] = dts
    mask = np.zeros(cap, bool); mask[:100] = True

    pre = preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                       jnp.asarray(mask), jnp.zeros(3), jnp.zeros(3),
                       1e-4, 1e-5)
    nav = predict(NavState.identity(), jnp.zeros(3), jnp.zeros(3), pre,
                  gravity=G)
    # first-order integrator vs ground truth over 0.5 s
    assert np.linalg.norm(np.array(nav.p) - ps[-1]) < 5e-3, (nav.p, ps[-1])
    assert np.linalg.norm(np.array(nav.v) - vs[-1]) < 5e-3
    assert np.abs(np.array(nav.R) - Rs[-1]).max() < 1e-3
    assert abs(float(pre.dt) - 0.5) < 1e-6
    # covariance must be PSD and grow with time
    w = np.linalg.eigvalsh(np.array(pre.cov))
    assert w.min() > -1e-8


def test_bias_jacobian_first_order():
    accs, gyrs, dts, *_ = _simulate_imu(n=50)
    cap = 64
    acc = np.zeros((cap, 3), np.float32); acc[:50] = accs
    gyr = np.zeros((cap, 3), np.float32); gyr[:50] = gyrs
    dt = np.zeros(cap, np.float32); dt[:50] = dts
    mask = np.zeros(cap, bool); mask[:50] = True

    db = 1e-3
    pre0 = preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                        jnp.asarray(mask), jnp.zeros(3), jnp.zeros(3),
                        1e-4, 1e-5)
    pre1 = preintegrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
                        jnp.asarray(mask),
                        jnp.asarray([db, 0, 0], jnp.float32), jnp.zeros(3),
                        1e-4, 1e-5)
    # dv(b0 + db) ≈ dv(b0) + dv_dba @ db  — compare against re-integration
    dv_pred = np.array(pre0.dv) + np.array(pre0.dv_dba) @ np.array([db, 0, 0])
    np.testing.assert_allclose(np.array(pre1.dv), dv_pred, atol=1e-5)
    dp_pred = np.array(pre0.dp) + np.array(pre0.dp_dba) @ np.array([db, 0, 0])
    np.testing.assert_allclose(np.array(pre1.dp), dp_pred, atol=1e-5)


def test_propagate_states_matches_predict():
    accs, gyrs, dts, Rs, ps, vs = _simulate_imu(n=80)
    navs = propagate_states(
        NavState.identity(), jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(accs, jnp.float32), jnp.asarray(gyrs, jnp.float32),
        jnp.asarray(dts, jnp.float32), jnp.ones(80, bool), gravity=G)
    assert np.linalg.norm(np.array(navs.p[-1]) - ps[-1]) < 5e-3
    assert np.linalg.norm(np.array(navs.v[-1]) - vs[-1]) < 5e-3


def test_failure_detection():
    assert not bool(failure_detection(jnp.asarray([1.0, 0, 0]),
                                      jnp.zeros(3), jnp.zeros(3)))
    assert bool(failure_detection(jnp.asarray([31.0, 0, 0]),
                                  jnp.zeros(3), jnp.zeros(3)))
    assert bool(failure_detection(jnp.zeros(3),
                                  jnp.asarray([1.5, 0, 0]), jnp.zeros(3)))


def test_imu_converter_rotates_into_lidar_frame():
    p = Params()
    acc = jnp.asarray([1.0, 2.0, 3.0])
    gyr = jnp.asarray([0.1, 0.2, 0.3])
    quat = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    acc_l, gyr_l, quat_l, valid = imu_converter(p, acc, gyr, quat)
    # extRot = [[0,1,0],[-1,0,0],[0,0,1]]
    np.testing.assert_allclose(np.array(acc_l), [2.0, -1.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(np.array(gyr_l), [0.2, -0.1, 0.3], atol=1e-6)
    assert bool(valid)
    # 6-axis IMU (zero quaternion) must be flagged invalid (ref utility.h:246)
    _, _, _, bad = imu_converter(p, acc, gyr, jnp.zeros(4))
    assert not bool(bad)
