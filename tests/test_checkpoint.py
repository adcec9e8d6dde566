"""Checkpoint/resume + respawn supervisor (the roslaunch respawn analog,
ref: launch/include/module_loam.launch:5-13)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.io.synthetic import (
    SyntheticWorld, simulate_scan)
from feature_base_pointcloud_registration_tpu.pipeline.checkpoint import (
    has_checkpoint, load_checkpoint, save_checkpoint)
from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import (
    RawScan)
from feature_base_pointcloud_registration_tpu.pipeline.slam import (
    SlamPipeline)
from feature_base_pointcloud_registration_tpu.utils.supervise import (
    load_cursor, run_supervised)

N_SCANS = 8
CRASH_AT = 5


def _scan(k):
    world = SyntheticWorld()
    gt = np.array([0, 0, 0.05 * k, 0.3 * k - 1.0, 0.15 * k - 0.5, 0.0],
                  np.float32)
    s = simulate_scan(world, gt, seed=40 + k)
    raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"])
    return raw._replace(valid=jnp.asarray(s["valid"]))


def _params():
    return Params(map_corner_cap=8192, map_surf_cap=32768)


def _build():
    return SlamPipeline(_params(), max_keyframes=64)


@pytest.fixture(scope="module")
def scans():
    return [_scan(k) for k in range(N_SCANS)]


def _run_uninterrupted(scans):
    pipe = _build()
    for k, raw in enumerate(scans):
        pipe.step(raw, timestamp=0.2 * k)
    return pipe


def test_checkpoint_roundtrip_resume_identical(scans, tmp_path):
    """Save at scan k, rebuild + restore, continue: the resumed pipeline's
    keyframe poses and trajectory must be IDENTICAL to an uninterrupted
    run (the pipeline host state is fully serialized)."""
    ref = _run_uninterrupted(scans)

    pipe = _build()
    for k in range(CRASH_AT):
        pipe.step(scans[k], timestamp=0.2 * k)
    save_checkpoint(pipe, str(tmp_path))
    assert has_checkpoint(str(tmp_path))

    resumed = load_checkpoint(_build(), str(tmp_path))
    assert resumed.n_keyframes == pipe.n_keyframes
    for k in range(CRASH_AT, N_SCANS):
        resumed.step(scans[k], timestamp=0.2 * k)

    n = ref.n_keyframes
    assert resumed.n_keyframes == n
    np.testing.assert_array_equal(resumed.kf_poses[:n], ref.kf_poses[:n])
    np.testing.assert_array_equal(np.stack(resumed.trajectory[CRASH_AT:]),
                                  np.stack(ref.trajectory[CRASH_AT:]))
    np.testing.assert_array_equal(resumed.kf_corner_mask[:n],
                                  ref.kf_corner_mask[:n])


def test_supervisor_respawns_through_crashes(scans, tmp_path):
    """A step function that dies twice mid-run: the supervisor rebuilds
    from the checkpoint each time and the final map equals the
    uninterrupted run's (crash strikes right after a checkpoint
    boundary, so no steps are replayed with partial state)."""
    ref = _run_uninterrupted(scans)
    crashes = {"left": 2}

    def step(pipe, item):
        k, raw = item
        if k == CRASH_AT and crashes["left"] > 0:
            crashes["left"] -= 1
            raise RuntimeError("injected crash")
        pipe.step(raw, timestamp=0.2 * k)

    items = list(enumerate(scans))
    pipe, n_respawns = run_supervised(
        _build, items, step, str(tmp_path), checkpoint_every=1,
        max_respawns=5)
    assert n_respawns == 2
    assert crashes["left"] == 0
    assert load_cursor(str(tmp_path)) == N_SCANS
    n = ref.n_keyframes
    assert pipe.n_keyframes == n
    np.testing.assert_array_equal(pipe.kf_poses[:n], ref.kf_poses[:n])


def test_supervisor_gives_up_after_max_respawns(scans, tmp_path):
    def step(pipe, item):
        raise RuntimeError("always broken")

    with pytest.raises(RuntimeError, match="always broken"):
        run_supervised(_build, list(enumerate(scans[:2])), step,
                       str(tmp_path), max_respawns=2)


def test_run_plot_exporter(scans, tmp_path):
    """The rviz-analog exporter renders from both a live pipeline and a
    saved map directory (ref: launch/run.launch:19, config/rviz.rviz)."""
    pipe = _build()
    for k, raw in enumerate(scans[:4]):
        pipe.step(raw, timestamp=0.2 * k)
    from feature_base_pointcloud_registration_tpu.utils.viz import (
        export_run_plot)

    p1 = export_run_plot(pipe, str(tmp_path / "live.png"))
    assert os.path.getsize(p1) > 10000

    map_dir = tmp_path / "map"
    pipe.save_map(str(map_dir))
    p2 = export_run_plot(str(map_dir), str(tmp_path / "saved.png"),
                         gt_xy=np.array([[0.0, 0.0], [1.0, 0.5]]))
    assert os.path.getsize(p2) > 10000
