"""3D box geometry in KITTI rect-camera coordinates, as pure jnp functions.

Boxes are ``(..., 7) = [x, y, z, h, w, l, ry]`` with y pointing down and the
box anchored at its *bottom* face (y is the bottom-center).  These are
vectorised, jit-friendly re-implementations of the reference geometry
(reference: lib/utils/kitti_utils.py:32-160, lib/utils/bbox_transform.py:5-21,
lib/utils/roipool3d/src/roipool3d_kernel.cu:14-28).
"""

from __future__ import annotations

import jax.numpy as jnp


def rotate_pc_along_y(pc: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate points around the camera y axis.

    ``pc``: (..., P, 3+C) points; ``angle``: (...) radians, broadcast over P.
    Matches reference semantics ``pc[:, [0, 2]] @ R.T`` with
    ``R = [[cos, -sin], [sin, cos]]`` (kitti_utils.py:32-63).
    """
    cosa = jnp.cos(angle)[..., None]
    sina = jnp.sin(angle)[..., None]
    x, z = pc[..., 0], pc[..., 2]
    new_x = cosa * x - sina * z
    new_z = sina * x + cosa * z
    return jnp.concatenate(
        [new_x[..., None], pc[..., 1:2], new_z[..., None], pc[..., 3:]], axis=-1
    )


def rotate_points_along_y(points_xz: jnp.ndarray, angle: jnp.ndarray):
    """Rotate bare (x, z) pairs; returns (new_x, new_z)."""
    cosa, sina = jnp.cos(angle), jnp.sin(angle)
    x, z = points_xz[..., 0], points_xz[..., 1]
    return cosa * x - sina * z, sina * x + cosa * z


def boxes3d_to_corners3d(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 8, 3) corners.

    Corner order matches reference kitti_utils.boxes3d_to_corners3d:66-101:
    bottom face first (y = y_c), then top face (y = y_c - h);
    x_corners = [l/2, l/2, -l/2, -l/2] x 2, z_corners = [w/2, -w/2, -w/2, w/2] x 2.
    """
    h, w, l = boxes3d[..., 3], boxes3d[..., 4], boxes3d[..., 5]
    ry = boxes3d[..., 6]

    xs = jnp.stack([l, l, -l, -l, l, l, -l, -l], axis=-1) / 2.0
    zs = jnp.stack([w, -w, -w, w, w, -w, -w, w], axis=-1) / 2.0
    ys = jnp.concatenate(
        [jnp.zeros_like(xs[..., :4]), -jnp.broadcast_to(h[..., None], xs[..., :4].shape)],
        axis=-1,
    )

    # rotate in the xz plane: corners (.., 8, 3) times R(ry) as in the reference
    # (temp_corners @ R_list with R rows [[c,0,-s],[0,1,0],[s,0,c]])
    cosa, sina = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    x_rot = xs * cosa + zs * sina
    z_rot = -xs * sina + zs * cosa

    x = boxes3d[..., 0:1] + x_rot
    y = boxes3d[..., 1:2] + ys
    z = boxes3d[..., 2:3] + z_rot
    return jnp.stack([x, y, z], axis=-1)


def boxes3d_to_bev(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 5) BEV rects ``[x1, z1, x2, z2, ry]``
    (reference kitti_utils.boxes3d_to_bev_torch:134-147)."""
    cu, cv = boxes3d[..., 0], boxes3d[..., 2]
    half_l, half_w = boxes3d[..., 5] / 2.0, boxes3d[..., 4] / 2.0
    return jnp.stack(
        [cu - half_l, cv - half_w, cu + half_l, cv + half_w, boxes3d[..., 6]], axis=-1
    )


def enlarge_box3d(boxes3d: jnp.ndarray, extra_width: float) -> jnp.ndarray:
    """Grow hwl by 2*extra_width and shift the bottom down by extra_width
    (reference kitti_utils.enlarge_box3d:150-160)."""
    return jnp.concatenate(
        [
            boxes3d[..., 0:1],
            boxes3d[..., 1:2] + extra_width,
            boxes3d[..., 2:3],
            boxes3d[..., 3:6] + extra_width * 2.0,
            boxes3d[..., 6:],
        ],
        axis=-1,
    )


def points_in_boxes3d(pts: jnp.ndarray, boxes3d: jnp.ndarray) -> jnp.ndarray:
    """Oriented point-in-box test.

    ``pts``: (..., N, 3); ``boxes3d``: (..., M, 7).  Returns bool (..., M, N).
    Faithful to ``pt_in_box3d`` (roipool3d_kernel.cu:14-28) including the
    10 m coarse |dx|,|dz| pre-gate and y measured from the box *center*
    (cy = bottom - h/2).
    """
    x, y, z = pts[..., None, :, 0], pts[..., None, :, 1], pts[..., None, :, 2]
    cx = boxes3d[..., 0:1]
    cy = boxes3d[..., 1:2] - boxes3d[..., 3:4] / 2.0
    cz = boxes3d[..., 2:3]
    h, w, l = boxes3d[..., 3:4], boxes3d[..., 4:5], boxes3d[..., 5:6]
    ry = boxes3d[..., 6:7]

    max_dis = 10.0
    coarse = (
        (jnp.abs(x - cx) <= max_dis)
        & (jnp.abs(y - cy) <= h / 2.0)
        & (jnp.abs(z - cz) <= max_dis)
    )

    cosa, sina = jnp.cos(ry), jnp.sin(ry)
    x_rot = (x - cx) * cosa - (z - cz) * sina
    z_rot = (x - cx) * sina + (z - cz) * cosa
    fine = (
        (x_rot >= -l / 2.0)
        & (x_rot <= l / 2.0)
        & (z_rot >= -w / 2.0)
        & (z_rot <= w / 2.0)
    )
    return coarse & fine


def height_overlap(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Vertical overlap (N, M) for y-down bottom-anchored boxes
    (reference iou3d_utils.boxes_iou3d_gpu:36-43)."""
    a_min = (boxes_a[..., 1] - boxes_a[..., 3])[..., :, None]
    a_max = boxes_a[..., 1][..., :, None]
    b_min = (boxes_b[..., 1] - boxes_b[..., 3])[..., None, :]
    b_max = boxes_b[..., 1][..., None, :]
    return jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0.0, None)
