import numpy as np
import pytest

from feature_base_pointcloud_registration_tpu.pipeline.cloud_info import RawScan
from feature_base_pointcloud_registration_tpu.pipeline.scan_buffer import (
    OdomQueue, ScanBuffer, ScanFieldError)


def _scan(n=8):
    rng = np.random.RandomState(0)
    return RawScan.from_numpy(
        rng.randn(n, 3).astype(np.float32), np.zeros(n, np.float32),
        np.zeros(n, np.int32), np.zeros(n, np.float32))


def test_buffer_requires_three_scans():
    buf = ScanBuffer()
    assert buf.push(_scan(), 0.0) is None
    assert buf.push(_scan(), 0.1) is None
    out = buf.push(_scan(), 0.2)
    assert out is not None
    assert out.time_scan_cur == 0.0
    assert out.time_scan_next == 0.1  # next queued scan's stamp
    assert out.deskew_enabled


def test_buffer_fatal_checks():
    with pytest.raises(ScanFieldError):
        ScanBuffer().push(_scan(), 0.0, is_dense=False)
    with pytest.raises(ScanFieldError):
        ScanBuffer().push(_scan(), 0.0, has_ring=False)


def test_buffer_missing_time_disables_deskew():
    buf = ScanBuffer()
    with pytest.warns(UserWarning):
        buf.push(_scan(), 0.0, has_time=False)
    buf.push(_scan(), 0.1)
    out = buf.push(_scan(), 0.2)
    assert not out.deskew_enabled


def test_odom_queue_brackets_scan():
    q = OdomQueue()
    for k in range(10):
        pose = np.array([0, 0, 0, 0.1 * k, 0, 0], np.float32)
        q.push(0.05 * k, pose, reset_id=7)
    ok, guess, rid, incre, flag = q.deskew_info(0.1, 0.2)
    assert ok and rid == 7 and flag
    # guess = first odom at/after scan start (t=0.1 -> k=2, x=0.2)
    np.testing.assert_allclose(guess[3], 0.2, atol=1e-6)
    # increment over [0.1, 0.2] = two odom steps of 0.1 m
    np.testing.assert_allclose(incre[0], 0.2, atol=1e-5)


def test_odom_queue_reset_id_mismatch_disables_positional():
    q = OdomQueue()
    for k in range(10):
        pose = np.array([0, 0, 0, 0.1 * k, 0, 0], np.float32)
        q.push(0.05 * k, pose, reset_id=0 if k < 5 else 1)
    ok, guess, rid, incre, flag = q.deskew_info(0.1, 0.3)
    assert ok and not flag  # start/end ids differ (ref :471)


def test_odom_queue_empty():
    ok, *_ = OdomQueue().deskew_info(0.0, 0.1)
    assert not ok
