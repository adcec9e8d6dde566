import numpy as np
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.io.synthetic import (
    SyntheticWorld, simulate_scan)
from feature_base_pointcloud_registration_tpu.ops.projection import project_scan
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
    DeskewInfo, RawScan)
import oracle

PARAMS = Params()


def _scan():
    world = SyntheticWorld()
    return simulate_scan(world, [0.02, -0.01, 0.3, 1.0, 2.0, 0.0], seed=3)


def test_projection_matches_oracle():
    s = _scan()
    raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"])
    raw = raw._replace(valid=jnp.asarray(s["valid"]))
    out = project_scan(PARAMS, raw, None)

    ref = oracle.project_scan(s["xyz"], s["ring"], s["time"], s["valid"])

    n = len(ref["point_range"])
    assert int(out.num_points) == n
    np.testing.assert_array_equal(
        np.array(out.start_ring_index), ref["start_ring_index"])
    np.testing.assert_array_equal(
        np.array(out.end_ring_index), ref["end_ring_index"])
    np.testing.assert_array_equal(
        np.array(out.point_col_ind)[:n], ref["point_col_ind"])
    np.testing.assert_allclose(
        np.array(out.point_range)[:n], ref["point_range"], rtol=1e-6)
    np.testing.assert_allclose(
        np.array(out.points)[:n], ref["points"], atol=1e-6)
    assert not np.array(out.point_valid)[n:].any()


def test_projection_deskew_matches_oracle():
    s = _scan()
    # synthetic gyro table: spin during the 0.1 s sweep
    q = PARAMS.imu_queue_len
    n_imu = 40
    t = np.linspace(-0.005, 0.105, n_imu)
    rates = np.array([0.05, -0.08, 0.6])
    rot = np.outer(t - t[0], rates)
    imu_time = np.full(q, np.inf, np.float32)
    imu_time[:n_imu] = t
    imu_rot = np.zeros((q, 3), np.float32)
    imu_rot[:n_imu] = rot

    dsk = DeskewInfo.empty(q)._replace(
        imu_time=jnp.asarray(imu_time),
        imu_rot=jnp.asarray(imu_rot),
        imu_count=jnp.asarray(n_imu - 1, jnp.int32),
        imu_available=jnp.asarray(True),
    )
    raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"])
    raw = raw._replace(valid=jnp.asarray(s["valid"]))
    out = project_scan(PARAMS, raw, dsk, enable_deskew=True)

    f = oracle.find_rotation_factory(t, rot)
    ref = oracle.project_scan(s["xyz"], s["ring"], s["time"], s["valid"],
                              deskew=f)
    n = len(ref["point_range"])
    assert int(out.num_points) == n
    np.testing.assert_allclose(
        np.array(out.points)[:n], ref["points"], atol=2e-5)


def test_projection_first_write_wins():
    # two points landing in the same cell: earlier input index must win
    xyz = np.array([[5.0, 0.0, 0.0], [6.0, 0.001, 0.0]], np.float32)
    ring = np.zeros(2, np.int32)
    time = np.zeros(2, np.float32)
    raw = RawScan.from_numpy(xyz, np.zeros(2, np.float32), ring, time,
                             max_points=8)
    out = project_scan(PARAMS, raw, None)
    assert int(out.num_points) == 1
    np.testing.assert_allclose(np.array(out.points)[0], xyz[0], atol=1e-6)


def test_positional_deskew_applied():
    """With odom_deskew_flag set, points are translated back along the
    scan-duration odometry increment proportionally to their relative
    time (the path the reference keeps but stubs to zero, ref
    src/imageProjection.cpp:528-542)."""
    from feature_base_pointcloud_registration_tpu.ops.projection import (
        deskew_points)

    n = 8
    xyz = jnp.asarray(np.stack([np.linspace(2, 5, n), np.zeros(n),
                                np.zeros(n)], -1), jnp.float32)
    rel_t = jnp.asarray(np.linspace(0.0, 0.1, n), jnp.float32)
    incre = np.array([0.5, -0.2, 0.0], np.float32)

    dsk = DeskewInfo.empty(PARAMS.imu_queue_len)
    dsk = dsk._replace(imu_available=jnp.asarray(True),
                       odom_available=jnp.asarray(True),
                       odom_deskew_flag=jnp.asarray(True),
                       odom_incre=jnp.asarray(incre))
    out = np.array(deskew_points(xyz, rel_t, dsk, scan_duration=0.1))
    # no rotation in the (empty) gyro table: transform reduces to the
    # positional term relative to the first point (ratio 0 -> shift 0)
    ratios = np.linspace(0.0, 1.0, n)
    expected = np.array(xyz) + ratios[:, None] * incre
    np.testing.assert_allclose(out, expected, atol=1e-5)

    # flag off -> pure rotation path, positions untouched
    dsk_off = dsk._replace(odom_deskew_flag=jnp.asarray(False))
    out_off = np.array(deskew_points(xyz, rel_t, dsk_off,
                                     scan_duration=0.1))
    np.testing.assert_allclose(out_off, np.array(xyz), atol=1e-6)


def _surface_distance(world: SyntheticWorld, pts):
    """Distance from world-frame points to the nearest world surface."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    cands = [np.abs(z - world.ground_z), np.abs(z - world.ceil_z),
             np.abs(x - world.half_x), np.abs(x + world.half_x),
             np.abs(y - world.half_y), np.abs(y + world.half_y)]
    for px, py in world.pole_xy:
        cands.append(np.abs(np.hypot(x - px, y - py) - world.pole_radius))
    return np.min(np.stack(cands), axis=0)


def test_full_motion_skew_deskew_recovers_surfaces():
    """End-to-end chain the drive generator + pipeline share: a scan
    raycast from a sensor that ROTATES AND TRANSLATES during the sweep
    (instantaneous-frame points), deskewed with the true gyro table +
    positional increment, must land ON the world surfaces when placed at
    the ground-truth scan-START pose.  This pins the sign/frame
    conventions of the whole generator -> gyro table -> rotation interp ->
    positional interp chain against an independent geometric invariant
    (ref deskewPoint: src/imageProjection.cpp:544-580; the reference
    stubs the positional term, :528-542 — here it is live)."""
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        pose6_to_matrix_np)
    from feature_base_pointcloud_registration_tpu.pipeline.frontend import (
        make_deskew_info)

    world = SyntheticWorld()
    yaw = 0.3
    pose = np.array([0.0, 0.0, yaw, 1.0, -2.0, 0.4], np.float32)
    rates = np.array([0.0, 0.0, 0.5])        # body gyro (roll=pitch=0)
    vel_w = np.array([1.2, 0.5, 0.0])        # world-frame velocity

    s = simulate_scan(world, pose, noise=0.0, seed=7,
                      spin_rpy_rate=rates, vel_world=vel_w)

    t = 200.0  # arbitrary scan-start wall time
    imu_t = t + np.linspace(-0.005, 0.105, 23)
    gyr = np.tile(rates, (len(imu_t), 1))
    c, sn = np.cos(yaw), np.sin(yaw)
    incre = np.array([c * vel_w[0] + sn * vel_w[1],
                      -sn * vel_w[0] + c * vel_w[1], 0.0]) * 0.1
    dsk = make_deskew_info(Params(), imu_t, gyr, t, t + 0.1,
                           odom_incre=incre, odom_deskew_flag=True)
    assert bool(dsk.imu_available)

    raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"])
    raw = raw._replace(valid=jnp.asarray(s["valid"]))
    out = project_scan(PARAMS, raw, dsk, enable_deskew=True)
    n = int(out.num_points)
    T = pose6_to_matrix_np(pose.astype(np.float64))

    def world_err(pts_start_frame):
        pw = pts_start_frame @ T[:3, :3].T + T[:3, 3]
        return _surface_distance(world, pw)

    err_dsk = world_err(np.array(out.points)[:n])
    raw_out = project_scan(PARAMS, raw, None)
    m = int(raw_out.num_points)
    err_raw = world_err(np.array(raw_out.points)[:m])

    # deskewed: on-surface to float32/interp tolerance; raw: visibly off
    assert float(err_dsk.mean()) < 0.004, err_dsk.mean()
    assert float(np.quantile(err_dsk, 0.99)) < 0.02
    assert float(err_raw.mean()) > 0.02, err_raw.mean()
