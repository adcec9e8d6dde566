"""Structured event log: the pub/sub + rosconsole observability analog
(ref: src/mapOptmization.h:163-187 publishers; rosconsole severity)."""

import json

import numpy as np
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.config import Params
from feature_base_pointcloud_registration_tpu.utils.log import (
    EventLog, get_logger, set_logger)


def test_event_capture_and_drain():
    log = EventLog()
    log.info("mapping/odometry", pose=np.arange(6.0), n_corr=812)
    log.warn("imu/failure_reset", velocity=jnp.ones(3) * 31.0)
    assert len(log.events) == 2
    odo = log.drain("mapping/odometry")
    assert len(odo) == 1 and odo[0]["n_corr"] == 812
    assert odo[0]["pose"] == [0, 1, 2, 3, 4, 5]
    rest = log.drain()
    assert len(rest) == 1 and rest[0]["level"] == "warn"
    assert log.drain() == []


def test_min_level_and_sink(tmp_path):
    seen = []
    log = EventLog(min_level="warn", sink=seen.append)
    log.info("a")      # filtered
    log.error("b", detail="boom")
    assert [e["topic"] for e in log.events] == ["b"]
    assert seen[0]["detail"] == "boom"
    log.to_jsonl(str(tmp_path / "ev.jsonl"))
    lines = open(tmp_path / "ev.jsonl").read().splitlines()
    assert json.loads(lines[0])["topic"] == "b"


def test_large_arrays_summarized():
    log = EventLog()
    log.info("cloud", pts=np.zeros((1000, 3)))
    e = log.events[0]
    assert e["pts"] == {"shape": [1000, 3], "dtype": "float64"}


def test_pipeline_emits_odometry_events():
    """SlamPipeline.step must publish a mapping/odometry event per
    processed scan (the publishOdometry analog)."""
    from feature_base_pointcloud_registration_tpu.io.synthetic import (
        SyntheticWorld, simulate_scan)
    from feature_base_pointcloud_registration_tpu.pipeline.cloud_info \
        import RawScan
    from feature_base_pointcloud_registration_tpu.pipeline.slam import (
        SlamPipeline)

    log = EventLog()
    set_logger(log)
    try:
        params = Params(map_corner_cap=8192, map_surf_cap=65536)
        pipe = SlamPipeline(params, max_keyframes=16)
        world = SyntheticWorld()
        for k in range(2):
            s = simulate_scan(
                world, np.array([0, 0, 0, 0.3 * k, 0, 0], np.float32),
                seed=k)
            raw = RawScan.from_numpy(s["xyz"], s["intensity"], s["ring"],
                                     s["time"])
            raw = raw._replace(valid=jnp.asarray(s["valid"]))
            pipe.step(raw, timestamp=0.2 * k)
        odo = log.drain("mapping/odometry")
        # scan 0 has no local map yet (no keyframes) -> no event;
        # scan 1 registers and must publish
        assert len(odo) >= 1
        assert "n_corr" in odo[0] and "pose" in odo[0]
        kf = log.drain("mapping/keyframe")
        assert len(kf) >= 1
    finally:
        set_logger(None)
