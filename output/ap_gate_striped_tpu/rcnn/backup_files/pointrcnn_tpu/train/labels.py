"""On-device RPN training-label generation.

TPU-first replacement for the host-side
``KittiRCNNDataset.generate_rpn_training_labels`` (reference
kitti_rcnn_dataset.py:364-394): the host ships only the point cloud and the
(padded) gt boxes, and the per-point foreground/ignore labels + dense box
regression targets are computed inside the jitted train step.  The dense
(B, N, 7) reg-label tensor alone is ~29 MB/batch-16 — computing it on
device removes the single largest host->device transfer of the training
loop and ~30% of the host sample-prep time.

Order semantics are exactly the host generator's sequential loop, where a
LATER gt box overwrites earlier writes for points in overlapping
boxes/ignore rings: for each point, the final cls value comes from the last
box that touched it (1 if that touch was an interior hit, -1 if only the
enlarged ring), and the reg target comes from the last box containing it —
both expressed as index-max reductions over the box axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointrcnn_tpu.utils.box_ops import enlarge_box3d, points_in_boxes3d


def rpn_training_labels(pts: jnp.ndarray, gt_boxes3d: jnp.ndarray,
                        gt_valid: jnp.ndarray):
    """(N, 3), (G, 7), (G,) bool -> (cls (N,) int32, reg (N, 7) f32)."""
    G = gt_boxes3d.shape[0]
    fg = points_in_boxes3d(pts, gt_boxes3d) & gt_valid[:, None]  # (G, N)
    enlarged = enlarge_box3d(gt_boxes3d, extra_width=0.2)
    ring = (points_in_boxes3d(pts, enlarged) & gt_valid[:, None]) & ~fg

    iota = jnp.arange(G, dtype=jnp.int32)[:, None]  # (G, 1)
    kf = jnp.max(jnp.where(fg, iota, -1), axis=0)  # last fg box per point
    kr = jnp.max(jnp.where(ring, iota, -1), axis=0)  # last ring box per point
    cls = jnp.where(
        (kf < 0) & (kr < 0), 0, jnp.where(kf >= kr, 1, -1)
    ).astype(jnp.int32)

    # per-box targets: true-3D-center offset + size + ry
    center3d = gt_boxes3d[:, 0:3].at[:, 1].add(-gt_boxes3d[:, 3] / 2.0)
    # gather target rows by kf via one-hot contraction (bit-exact at
    # HIGHEST; XLA's indexed gather serializes per point)
    oh = (kf[:, None] == iota[:, 0][None, :]).astype(jnp.float32)  # (N, G)
    sel_center = jnp.einsum("ng,gc->nc", oh, center3d,
                            precision=jax.lax.Precision.HIGHEST)
    sel_size_ry = jnp.einsum("ng,gc->nc", oh, gt_boxes3d[:, 3:7],
                             precision=jax.lax.Precision.HIGHEST)
    reg = jnp.concatenate([sel_center - pts, sel_size_ry], axis=-1)
    reg = jnp.where((kf >= 0)[:, None], reg, 0.0).astype(jnp.float32)
    return cls, reg


def rpn_training_labels_batch(pts_input: jnp.ndarray, gt_boxes3d: jnp.ndarray,
                              gt_valid: jnp.ndarray):
    """Batched: (B, N, >=3), (B, G, 7), (B, G) -> ((B, N), (B, N, 7))."""
    return jax.vmap(rpn_training_labels)(
        pts_input[..., 0:3], gt_boxes3d, gt_valid.astype(bool)
    )
