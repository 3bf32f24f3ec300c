"""Native C++ host ops vs numpy references."""

import numpy as np
import pytest

from pointrcnn_tpu.utils import native, np_geometry
from pointrcnn_tpu.utils.box_ops import boxes3d_to_bev
import jax.numpy as jnp


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def random_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = rng.uniform(-20, 20, n)
    b[:, 1] = rng.uniform(-1, 2, n)
    b[:, 2] = rng.uniform(0, 60, n)
    b[:, 3:6] = rng.uniform(1.0, 4.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_native_points_in_boxes(lib):
    rng = np.random.RandomState(1)
    pts = rng.uniform(-30, 60, (2000, 3)).astype(np.float32)
    boxes = random_boxes(10, seed=2)
    got = native.points_in_boxes3d(pts, boxes)
    want = np_geometry.points_in_boxes3d(pts, boxes)
    np.testing.assert_array_equal(got, want)


def test_native_roipool_matches_semantics(lib):
    rng = np.random.RandomState(3)
    pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    feats = rng.randn(500, 4).astype(np.float32)
    boxes = random_boxes(5, seed=4)
    boxes[:, 0:3:2] = 0.0  # center some boxes near the points
    pooled, empty = native.roipool3d_cpu(pts, feats, boxes, 0.0, 32)
    pooled_np, empty_np = native._roipool3d_numpy(
        pts, feats, np_geometry.enlarge_box3d(boxes, 0.0), 32
    )
    np.testing.assert_array_equal(empty, empty_np)
    np.testing.assert_allclose(pooled, pooled_np, atol=1e-6)


def test_native_bev_overlap_vs_device(lib):
    boxes = random_boxes(16, seed=5)
    bev = np.asarray(boxes3d_to_bev(jnp.asarray(boxes)))
    from pointrcnn_tpu.ops.iou3d import boxes_overlap_bev

    want = np.asarray(boxes_overlap_bev(jnp.asarray(bev), jnp.asarray(bev)))
    got = native.bev_overlap(bev, bev)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_bev_overlap_numpy_fallback_matches_native(lib, monkeypatch):
    boxes = random_boxes(16, seed=6)
    bev = np.asarray(boxes3d_to_bev(jnp.asarray(boxes)))
    want = native.bev_overlap(bev, bev)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    got = native.bev_overlap(bev, bev)
    np.testing.assert_allclose(got, want, atol=1e-4)
