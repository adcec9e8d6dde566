import numpy as np
import jax.numpy as jnp

from feature_base_pointcloud_registration_tpu.ops.voxel import voxel_downsample
from feature_base_pointcloud_registration_tpu.ops.knn import knn5, knn
from feature_base_pointcloud_registration_tpu.ops.cropbox import crop_box
import oracle


def test_voxel_matches_pcl_semantics():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-8, 8, (2000, 3)).astype(np.float32)
    mask = np.ones(2000, bool)
    mask[1500:] = rng.rand(500) > 0.5
    out, om, cnt = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 0.4, 4096)
    ref = oracle.voxel_downsample(pts[mask], 0.4)
    ours = np.array(out)[np.array(om)]
    assert int(cnt) == len(ref)
    oa = ours[np.lexsort(ours.T)]
    ob = ref[np.lexsort(ref.T)]
    np.testing.assert_allclose(oa, ob, atol=1e-5)


def test_voxel_overflow_drops_deterministically():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-50, 50, (4096, 3)).astype(np.float32)
    mask = np.ones(4096, bool)
    out, om, cnt = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 0.1, 256)
    assert int(np.array(om).sum()) == 256  # cap enforced


def test_knn_exact():
    rng = np.random.RandomState(2)
    q = rng.uniform(-20, 20, (256, 3)).astype(np.float32)
    ref = rng.uniform(-20, 20, (8192, 3)).astype(np.float32)
    m = np.ones(8192, bool)
    m[6000:] = False
    d2, idx = knn5(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(m), chunk=2048)
    gt_d, gt_i = oracle.knn5(q, ref[:6000])
    np.testing.assert_allclose(np.array(d2), gt_d, rtol=1e-4, atol=1e-3)
    assert (np.array(idx) == gt_i).mean() > 0.999


def test_knn_k1():
    rng = np.random.RandomState(3)
    q = rng.randn(32, 3).astype(np.float32)
    ref = rng.randn(1024, 3).astype(np.float32)
    d2, idx = knn(jnp.asarray(q), jnp.asarray(ref),
                  jnp.ones(1024, bool), k=1, chunk=256)
    gt = np.argmin(((q[:, None] - ref[None]) ** 2).sum(-1), 1)
    assert (np.array(idx)[:, 0] == gt).all()


def test_cropbox_order_and_bounds():
    rng = np.random.RandomState(4)
    pts = rng.uniform(-40, 40, (1000, 3)).astype(np.float32)
    center = jnp.asarray([5.0, -3.0, 1.0])
    he = jnp.asarray([30.0, 30.0, 10.0])
    out, m, cnt = crop_box(jnp.asarray(pts), jnp.ones(1000, bool), center, he, 1000)
    inside = (np.abs(pts - np.array(center)) <= np.array(he)).all(1)
    assert int(cnt) == inside.sum()
    np.testing.assert_allclose(np.array(out)[np.array(m)], pts[inside])


def test_voxel_far_from_origin():
    """Packed-key binning must stay correct far from the origin (the key
    is rebased to the cloud's min cell, not clamped around zero)."""
    import numpy as np
    import jax.numpy as jnp
    from feature_base_pointcloud_registration_tpu.ops.voxel import (
        voxel_downsample)

    rng = np.random.RandomState(0)
    base = np.array([850.0, -620.0, 140.0], np.float32)
    pts = base + rng.uniform(0, 4.0, (256, 3)).astype(np.float32)
    out, mask, n = voxel_downsample(jnp.asarray(pts),
                                    jnp.ones(256, bool), 0.2, 512)
    out = np.asarray(out)[np.asarray(mask)]
    # brute-force centroids
    ijk = np.floor(pts / 0.2).astype(np.int64)
    keys = {}
    for p, c in zip(pts, map(tuple, ijk)):
        keys.setdefault(c, []).append(p)
    ref = np.stack([np.mean(v, axis=0) for v in keys.values()])
    assert len(out) == len(ref)
    # match sets (order-independent)
    d = np.linalg.norm(out[:, None] - ref[None], axis=-1).min(1)
    assert d.max() < 1e-4, d.max()


def test_voxel_long_extent():
    """A >1 km-long cloud (highway-style) must bin exactly — the 2-key
    packing supports 32767 cells per y/z axis and unbounded x."""
    import numpy as np
    import jax.numpy as jnp
    from feature_base_pointcloud_registration_tpu.ops.voxel import (
        voxel_downsample)

    rng = np.random.RandomState(1)
    xs = rng.uniform(0, 1200.0, 512).astype(np.float32)
    pts = np.stack([xs, rng.uniform(-3, 3, 512).astype(np.float32),
                    rng.uniform(0, 2, 512).astype(np.float32)], -1)
    out, mask, n = voxel_downsample(jnp.asarray(pts),
                                    jnp.ones(512, bool), 0.2, 1024)
    out = np.asarray(out)[np.asarray(mask)]
    ijk = np.floor(pts / 0.2).astype(np.int64)
    keys = {}
    for p, c in zip(pts, map(tuple, ijk)):
        keys.setdefault(c, []).append(p)
    ref = np.stack([np.mean(v, axis=0) for v in keys.values()])
    assert len(out) == len(ref), (len(out), len(ref))
    d = np.linalg.norm(out[:, None] - ref[None], axis=-1).min(1)
    assert d.max() < 1e-4, d.max()
