import numpy as np
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.geom import se3
import oracle


def test_euler_roundtrip():
    rng = np.random.RandomState(0)
    rpy = rng.uniform(-1.3, 1.3, (64, 3)).astype(np.float32)
    R = se3.euler_to_rot(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    back = np.stack(se3.rot_to_euler(R), -1)
    np.testing.assert_allclose(back, rpy, atol=3e-6)


def test_matches_oracle_convention():
    rng = np.random.RandomState(1)
    for _ in range(10):
        p = rng.uniform(-1, 1, 6)
        T_j = np.array(se3.pose6_to_matrix(jnp.asarray(p, jnp.float32)))
        T_o = oracle.pose6_to_matrix(p)
        np.testing.assert_allclose(T_j, T_o, atol=1e-6)


def test_compose_inverse():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, 6), jnp.float32)
    Tab = se3.pose6_to_matrix(se3.compose_pose6(a, b))
    ref = np.array(se3.pose6_to_matrix(a)) @ np.array(se3.pose6_to_matrix(b))
    np.testing.assert_allclose(np.array(Tab), ref, atol=1e-5)
    Ti = se3.inverse_matrix(se3.pose6_to_matrix(a))
    np.testing.assert_allclose(
        np.array(Ti @ se3.pose6_to_matrix(a)), np.eye(4), atol=1e-6
    )


def test_so3_exp_log_roundtrip():
    rng = np.random.RandomState(3)
    w = rng.uniform(-1.5, 1.5, (32, 3)).astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    w2 = se3.so3_log(R)
    np.testing.assert_allclose(np.array(w2), w, atol=1e-5)


def test_quat_euler_roundtrip():
    rng = np.random.RandomState(4)
    rpy = rng.uniform(-1.2, 1.2, (16, 3)).astype(np.float32)
    q = se3.quat_from_euler(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    back = np.stack(se3.euler_from_quat(q), -1)
    np.testing.assert_allclose(np.array(back), rpy, atol=1e-5)
    # quaternion must encode the same rotation matrix
    R_e = np.array(se3.euler_to_rot(rpy[:, 0], rpy[:, 1], rpy[:, 2]))
    x, y, z, w = [np.array(q[:, i]) for i in range(4)]
    R_q = np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
        np.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
        np.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
    ], -2)
    np.testing.assert_allclose(R_q, R_e, atol=1e-5)


def test_kabsch_recovers_transform():
    rng = np.random.RandomState(5)
    src = rng.randn(100, 3).astype(np.float32)
    gt = jnp.asarray([0.3, -0.2, 0.9, 1.0, -2.0, 0.5], jnp.float32)
    T = se3.pose6_to_matrix(gt)
    dst = se3.apply_transform(T, jnp.asarray(src))
    Tk = se3.kabsch(jnp.asarray(src), dst)
    np.testing.assert_allclose(np.array(Tk), np.array(T), atol=1e-5)


def test_kabsch_batched():
    rng = np.random.RandomState(6)
    src = rng.randn(4, 60, 3).astype(np.float32)
    poses = rng.uniform(-0.5, 0.5, (4, 6)).astype(np.float32)
    T = se3.pose6_to_matrix(jnp.asarray(poses))
    dst = se3.apply_transform(T, jnp.asarray(src))
    Tk = se3.kabsch(jnp.asarray(src), dst)
    np.testing.assert_allclose(np.array(Tk), np.array(T), atol=1e-4)
