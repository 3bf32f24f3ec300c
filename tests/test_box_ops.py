import numpy as np
import jax.numpy as jnp

from pointrcnn_tpu.utils import box_ops


def ref_rotate_pc_along_y(pc, rot_angle):
    """NumPy oracle (reference kitti_utils.rotate_pc_along_y:32-42)."""
    pc = pc.copy()
    cosval = np.cos(rot_angle)
    sinval = np.sin(rot_angle)
    rotmat = np.array([[cosval, -sinval], [sinval, cosval]])
    pc[:, [0, 2]] = np.dot(pc[:, [0, 2]], np.transpose(rotmat))
    return pc


def ref_corners(boxes3d):
    """NumPy oracle for box corners (reference kitti_utils:66-101)."""
    n = boxes3d.shape[0]
    h, w, l, ry = boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 5], boxes3d[:, 6]
    x_c = np.stack([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2], axis=1)
    z_c = np.stack([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2], axis=1)
    y_c = np.zeros((n, 8))
    y_c[:, 4:8] = -h[:, None]
    out = np.zeros((n, 8, 3))
    for i in range(n):
        R = np.array(
            [
                [np.cos(ry[i]), 0, -np.sin(ry[i])],
                [0, 1, 0],
                [np.sin(ry[i]), 0, np.cos(ry[i])],
            ]
        )
        c = np.stack([x_c[i], y_c[i], z_c[i]], axis=1) @ R
        out[i] = c + boxes3d[i, 0:3]
    return out


def random_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0] = rng.uniform(-30, 30, n)
    boxes[:, 1] = rng.uniform(-1, 2, n)
    boxes[:, 2] = rng.uniform(0, 60, n)
    boxes[:, 3] = rng.uniform(1.2, 2.2, n)  # h
    boxes[:, 4] = rng.uniform(1.4, 2.0, n)  # w
    boxes[:, 5] = rng.uniform(3.0, 4.5, n)  # l
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_rotate_pc_along_y_matches_reference():
    rng = np.random.RandomState(1)
    pc = rng.randn(64, 5).astype(np.float32)
    angle = 0.7
    got = np.asarray(box_ops.rotate_pc_along_y(jnp.asarray(pc), jnp.float32(angle)))
    want = ref_rotate_pc_along_y(pc.astype(np.float64), angle)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotate_pc_batched_angles():
    rng = np.random.RandomState(2)
    pc = rng.randn(4, 16, 3).astype(np.float32)
    angles = rng.uniform(-np.pi, np.pi, 4).astype(np.float32)
    got = np.asarray(box_ops.rotate_pc_along_y(jnp.asarray(pc), jnp.asarray(angles)))
    for k in range(4):
        want = ref_rotate_pc_along_y(pc[k].astype(np.float64), angles[k])
        np.testing.assert_allclose(got[k], want, atol=1e-5)


def test_corners_match_reference():
    boxes = random_boxes(32)
    got = np.asarray(box_ops.boxes3d_to_corners3d(jnp.asarray(boxes)))
    want = ref_corners(boxes.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_corners_axis_aligned_geometry():
    box = np.array([[10.0, 1.0, 20.0, 1.5, 1.6, 3.9, 0.0]], dtype=np.float32)
    c = np.asarray(box_ops.boxes3d_to_corners3d(jnp.asarray(box)))[0]
    # bottom face at y=1, top at y=1-h
    np.testing.assert_allclose(c[:4, 1], 1.0, atol=1e-6)
    np.testing.assert_allclose(c[4:, 1], 1.0 - 1.5, atol=1e-6)
    assert np.isclose(c[:, 0].max() - c[:, 0].min(), 3.9, atol=1e-5)  # length on x
    assert np.isclose(c[:, 2].max() - c[:, 2].min(), 1.6, atol=1e-5)  # width on z


def test_bev_and_enlarge():
    boxes = random_boxes(8)
    bev = np.asarray(box_ops.boxes3d_to_bev(jnp.asarray(boxes)))
    np.testing.assert_allclose(bev[:, 0], boxes[:, 0] - boxes[:, 5] / 2, atol=1e-5)
    np.testing.assert_allclose(bev[:, 3], boxes[:, 2] + boxes[:, 4] / 2, atol=1e-5)
    np.testing.assert_allclose(bev[:, 4], boxes[:, 6], atol=1e-6)

    big = np.asarray(box_ops.enlarge_box3d(jnp.asarray(boxes), 0.2))
    np.testing.assert_allclose(big[:, 3:6], boxes[:, 3:6] + 0.4, atol=1e-5)
    np.testing.assert_allclose(big[:, 1], boxes[:, 1] + 0.2, atol=1e-5)
    np.testing.assert_allclose(big[:, [0, 2, 6]], boxes[:, [0, 2, 6]], atol=1e-6)


def test_points_in_boxes3d():
    box = np.array([[0.0, 1.0, 10.0, 2.0, 1.0, 4.0, np.pi / 2]], dtype=np.float32)
    # box rotated 90deg: length now along z, width along x
    pts = np.array(
        [
            [0.0, 0.0, 10.0],   # center -> in
            [0.0, 0.0, 11.9],   # within l/2 along z after rotation -> in
            [0.0, 0.0, 12.1],   # beyond l/2 -> out
            [0.45, 0.0, 10.0],  # within w/2 along x -> in
            [0.55, 0.0, 10.0],  # beyond w/2 -> out
            [0.0, 1.01, 10.0],  # below bottom -> out
            [0.0, -0.99, 10.0], # just above top -> in
        ],
        dtype=np.float32,
    )
    got = np.asarray(box_ops.points_in_boxes3d(jnp.asarray(pts), jnp.asarray(box)))[0]
    np.testing.assert_array_equal(got, [True, True, False, True, False, False, True])


def test_points_in_boxes_matches_corner_hull():
    """Random points vs a corner-derived oracle for unrotated boxes."""
    rng = np.random.RandomState(3)
    boxes = random_boxes(5, seed=4)
    boxes[:, 6] = 0.0
    pts = rng.uniform(-40, 60, size=(500, 3)).astype(np.float32)
    got = np.asarray(box_ops.points_in_boxes3d(jnp.asarray(pts), jnp.asarray(boxes)))
    for i, b in enumerate(boxes):
        x, y, z, h, w, l = b[:6]
        want = (
            (np.abs(pts[:, 0] - x) <= l / 2)
            & (pts[:, 1] <= y)
            & (pts[:, 1] >= y - h)
            & (np.abs(pts[:, 2] - z) <= w / 2)
        )
        np.testing.assert_array_equal(got[i], want)


def test_height_overlap():
    a = np.array([[0, 1.0, 0, 2.0, 1, 1, 0]], dtype=np.float32)  # y in [-1, 1]
    b = np.array([[0, 0.5, 0, 1.0, 1, 1, 0]], dtype=np.float32)  # y in [-0.5, 0.5]
    ov = np.asarray(box_ops.height_overlap(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ov, [[1.0]], atol=1e-6)
