"""One run, every latent back-end path: loop closure + GPS factors +
keyframe eviction interacting in a single KITTI-format SLAM drive.

The reference's value proposition is these mapOptmization threads firing
together (ref: src/mapOptmization.h:346-389 laserCloudInfoHandler calling
addOdomFactor/addGPSFactor/addLoopFactor + the loop-closure thread
:582-782); each is proven in isolated unit tests elsewhere — this drives
them through examples/run_kitti_slam.py in one process on a generated
multi-lap drive and asserts all three actually fired, with a sane ATE.

Drive geometry: radius-3 m circle at 2 m/s recorded every 0.25 s ->
lap = 9.4 s / 38 scans; 68 scans = 1.8 laps.  Loop closure needs the
revisit (time-diff gate 6 s < lap time), GPS needs >5 m travel (diameter
6 m) and 5 m fix spacing, eviction needs keyframes (1 m spacing -> ~34)
to exceed max_keyframes=24.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from feature_base_pointcloud_registration_tpu.utils.log import (  # noqa: E402
    EventLog, set_logger)


def test_loop_gps_evict_in_one_run(tmp_path):
    from examples.run_kitti_slam import main

    log = EventLog()
    set_logger(log)
    try:
        ate, counts = main([
            "--scans", "68", "--radius", "3", "--speed", "2",
            "--period", "0.25",
            "--gps", "--pose-cov-threshold", "0",
            "--loop", "--loop-time-diff", "6",
            "--max-keyframes", "24", "--opt-window", "8",
            "--events", str(tmp_path / "events.jsonl"),
        ])
    finally:
        set_logger(None)

    assert counts.get("mapping/loop_closure", 0) >= 1, counts
    assert counts.get("mapping/gps_factor", 0) >= 1, counts
    assert counts.get("mapping/evict", 0) >= 1, counts
    # the interacting run must still track the oxts ground truth
    assert ate < 0.5, (ate, counts)
    # the event log is the publisher analog -- it must have been exported
    assert os.path.exists(tmp_path / "events.jsonl")
