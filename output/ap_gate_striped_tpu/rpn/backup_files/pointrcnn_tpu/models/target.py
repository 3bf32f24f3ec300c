"""RoI target sampling for RCNN training, fixed-shape and jittable.

Re-design of the reference ProposalTargetLayer
(lib/rpn/proposal_target_layer.py:10-341).  The reference's per-sample Python
loops, boolean partitions and per-roi retry-until-IoU while loops become:

- fg/easy-bg/hard-bg masks + rank-based random sampling (no dynamic shapes);
- ``aug_roi_by_noise``'s while loop -> a fixed block of ``aug_times``
  candidate jitters with masked first-success selection (identical
  accept/keep semantics, proposal_target_layer.py:213-240);
- everything vmapped over the batch with explicit RNG keys.

One intentional deviation: the reference's per-roi rotation augmentation
draws angles from ``(rand - 0.5/0.5)`` — i.e. [-1, 0) due to operator
precedence (proposal_target_layer.py:295) — which biases rotations negative;
we use the evidently intended symmetric [-1, 1) range.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pointrcnn_tpu.ops.iou3d import boxes_iou3d, boxes_iou3d_paired
from pointrcnn_tpu.ops.roipool3d import roipool3d
from pointrcnn_tpu.utils.box_ops import rotate_pc_along_y

# pos_range, hwl_range, angle_range per jitter scheme
# (reference random_aug_box3d 'multiple', proposal_target_layer.py:256-260)
_MULTI_RANGES = np.array(
    [
        [0.2, 0.1, np.pi / 12],
        [0.3, 0.15, np.pi / 12],
        [0.5, 0.15, np.pi / 9],
        [0.8, 0.15, np.pi / 6],
        [1.0, 0.15, np.pi / 3],
    ],
    dtype=np.float32,
)


def random_aug_box3d(key, boxes: jnp.ndarray, method: str) -> jnp.ndarray:
    """Jitter (P, 7) boxes (reference random_aug_box3d:242-283)."""
    P = boxes.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if method == "single":
        pos = jax.random.uniform(k1, (P, 3)) - 0.5
        hwl = (jax.random.uniform(k2, (P, 3)) - 0.5) / (0.5 / 0.15) + 1.0
        ang = (jax.random.uniform(k3, (P, 1)) - 0.5) / (0.5 / (np.pi / 12))
    elif method == "multiple":
        idx = jax.random.randint(k4, (P,), 0, len(_MULTI_RANGES))
        ranges = jnp.asarray(_MULTI_RANGES)[idx]  # (P, 3)
        pos = ((jax.random.uniform(k1, (P, 3)) - 0.5) / 0.5) * ranges[:, 0:1]
        hwl = ((jax.random.uniform(k2, (P, 3)) - 0.5) / 0.5) * ranges[:, 1:2] + 1.0
        ang = ((jax.random.uniform(k3, (P, 1)) - 0.5) / 0.5) * ranges[:, 2:3]
    elif method == "normal":
        stds = jnp.asarray([0.3, 0.2, 0.3], jnp.float32)
        pos = jax.random.normal(k1, (P, 3)) * stds
        hstd = jnp.asarray([0.25, 0.15, 0.5], jnp.float32)
        hwl_shift = jax.random.normal(k2, (P, 3)) * hstd
        ang = ((jax.random.uniform(k3, (P, 1)) - 0.5) / 0.5) * (np.pi / 12)
        return jnp.concatenate(
            [boxes[:, 0:3] + pos, boxes[:, 3:6] + hwl_shift, boxes[:, 6:7] + ang], axis=1
        )
    else:
        raise NotImplementedError(method)
    return jnp.concatenate(
        [boxes[:, 0:3] + pos, boxes[:, 3:6] * hwl, boxes[:, 6:7] + ang], axis=1
    )


def _sample_from_mask(key, mask: jnp.ndarray, num: int):
    """``num`` random picks (with replacement) of True positions in ``mask``.
    Falls back to index 0 when the mask is empty (callers guard on count)."""
    n = mask.shape[0]
    r = jax.random.uniform(key, (n,))
    order = jnp.argsort(jnp.where(mask, r, 2.0))  # mask rows first, random order
    cnt = jnp.sum(mask)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (num,))
    pick = jnp.floor(u * jnp.maximum(cnt, 1).astype(u.dtype)).astype(jnp.int32)
    pick = jnp.clip(pick, 0, n - 1)
    return order[pick], order  # picks with replacement; randomized mask order


def _sample_rois_one(key, rois, roi_valid, gt, gt_valid, cfg):
    """Single-sample roi selection (reference sample_rois_for_rcnn:78-182).

    :return: (sel (R,), is_fg_slot (R,), sampled iou (R,), gt_assign (R,))
        with R = ROI_PER_IMAGE.
    """
    c = cfg.RCNN
    R = c.ROI_PER_IMAGE
    fg_rois_per_image = int(np.round(c.FG_RATIO * R))
    fg_thresh = min(c.REG_FG_THRESH, c.CLS_FG_THRESH)

    iou = boxes_iou3d(rois, gt)  # (M, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_overlaps = jnp.max(iou, axis=1)
    gt_assignment = jnp.argmax(iou, axis=1)
    max_overlaps = jnp.where(roi_valid, max_overlaps, -1.0)

    fg_mask = roi_valid & (max_overlaps >= fg_thresh)
    easy_bg = roi_valid & (max_overlaps >= 0) & (max_overlaps < c.CLS_BG_THRESH_LO)
    hard_bg = roi_valid & (max_overlaps >= c.CLS_BG_THRESH_LO) & (max_overlaps < c.CLS_BG_THRESH)

    fg_cnt = jnp.sum(fg_mask)
    hard_cnt = jnp.sum(hard_bg)
    easy_cnt = jnp.sum(easy_bg)
    bg_cnt = hard_cnt + easy_cnt

    kf, kh, ke, kr = jax.random.split(key, 4)
    fg_repl, fg_order = _sample_from_mask(kf, fg_mask, R)
    hard_pick, _ = _sample_from_mask(kh, hard_bg, R)
    easy_pick, _ = _sample_from_mask(ke, easy_bg, R)

    # fg slots: without replacement when bg exists (perm prefix), else with
    fg_per_image = jnp.where(
        fg_cnt > 0,
        jnp.where(bg_cnt > 0, jnp.minimum(fg_rois_per_image, fg_cnt), R),
        0,
    )
    slot = jnp.arange(R)
    fg_sel = jnp.where(bg_cnt > 0, fg_order[slot], fg_repl)

    # bg slots: hard/easy mix (reference sample_bg_inds:184-211)
    bg_num = R - fg_per_image
    hard_num = jnp.where(
        (hard_cnt > 0) & (easy_cnt > 0),
        (bg_num.astype(jnp.float32) * c.HARD_BG_RATIO).astype(jnp.int32),
        jnp.where(hard_cnt > 0, bg_num, 0),
    )
    bg_rank = slot - fg_per_image
    bg_sel = jnp.where(bg_rank < hard_num, hard_pick, easy_pick)

    is_fg_slot = slot < fg_per_image
    sel = jnp.where(is_fg_slot, fg_sel, bg_sel)

    # degenerate scene (no fg, no bg): cycle over valid rois; labels will be
    # invalidated downstream (the reference pdb-crashes here,
    # proposal_target_layer.py:146-149)
    none_avail = (fg_cnt == 0) & (bg_cnt == 0)
    any_valid, _ = _sample_from_mask(kr, roi_valid, R)
    sel = jnp.where(none_avail, any_valid, sel)
    is_fg_slot = is_fg_slot & ~none_avail

    return sel, is_fg_slot, max_overlaps[sel], gt_assignment[sel], none_avail


def _aug_rois_by_noise_one(key, rois, gt_of_rois, iou_src, is_fg_slot, cfg):
    """Vectorised aug_roi_by_noise (reference proposal_target_layer.py:213-240)."""
    c = cfg.RCNN
    T = max(int(c.ROI_FG_AUG_TIMES), 1)
    if c.ROI_FG_AUG_TIMES == 0:
        return rois, iou_src
    R = rois.shape[0]
    pos_thresh = min(c.REG_FG_THRESH, c.CLS_FG_THRESH)

    def one_attempt(kt):
        k_keep, k_aug = jax.random.split(kt)
        keep = jax.random.uniform(k_keep, (R,)) < 0.2
        aug = random_aug_box3d(k_aug, rois, c.REG_AUG_METHOD)
        cand = jnp.where(keep[:, None], rois, aug)
        iou = boxes_iou3d_paired(cand, gt_of_rois)
        return cand, keep, iou

    keys = jax.random.split(key, T)
    cands, keeps, ious = jax.vmap(one_attempt)(keys)  # (T, R, 7), (T, R), (T, R)

    # per-slot attempt budget: fg rois try T times, bg rois once
    t_eff = jnp.where(is_fg_slot, T, 1)  # (R,)
    t_idx = jnp.arange(T)[:, None]
    in_budget = t_idx < t_eff[None, :]
    success = (ious >= pos_thresh) & in_budget
    first_success = jnp.argmax(success, axis=0)  # 0 if none
    any_success = jnp.any(success, axis=0)
    chosen_t = jnp.where(any_success, first_success, t_eff - 1)

    take = lambda arr: jnp.take_along_axis(arr, chosen_t[None, :, None] if arr.ndim == 3 else chosen_t[None, :], axis=0)[0]
    chosen = take(cands)
    chosen_keep = take(keeps)
    chosen_iou = take(ious)
    iou_out = jnp.where(chosen_keep, iou_src, chosen_iou)
    return chosen, iou_out


def _roi_augmentation_one(key, pts, rois, gt_of_rois, cfg):
    """Per-roi rotation/scaling/flip of pooled points + boxes
    (reference data_augmentation, proposal_target_layer.py:285-341)."""
    R = rois.shape[0]
    k_rot, k_scale, k_flip = jax.random.split(key, 3)

    # rotation with alpha-preserving ry recompute
    angles = (jax.random.uniform(k_rot, (R,)) * 2.0 - 1.0) * (np.pi / cfg.AUG_ROT_RANGE)

    def alpha(box):
        beta = jnp.arctan2(box[:, 2], box[:, 0])
        return -jnp.sign(beta) * np.pi / 2 + beta + box[:, 6]

    gt_alpha = alpha(gt_of_rois)
    roi_alpha = alpha(rois)

    pts = rotate_pc_along_y(pts, angles)  # (R, S, 3)
    gt_of_rois = rotate_pc_along_y(gt_of_rois[:, None, :], angles)[:, 0]
    rois = rotate_pc_along_y(rois[:, None, :], angles)[:, 0]

    def recompute_ry(box, a):
        beta = jnp.arctan2(box[:, 2], box[:, 0])
        return jnp.sign(beta) * np.pi / 2 + a - beta

    gt_of_rois = gt_of_rois.at[:, 6].set(recompute_ry(gt_of_rois, gt_alpha))
    rois = rois.at[:, 6].set(recompute_ry(rois, roi_alpha))

    # scaling
    scales = 1.0 + (jax.random.uniform(k_scale, (R,)) * 2.0 - 1.0) * 0.05
    pts = pts * scales[:, None, None]
    gt_of_rois = gt_of_rois.at[:, 0:6].multiply(scales[:, None])
    rois = rois.at[:, 0:6].multiply(scales[:, None])

    # flip
    flip = jnp.sign(jax.random.uniform(k_flip, (R,)) - 0.5)
    pts = pts.at[:, :, 0].multiply(flip[:, None])

    def flip_box(box):
        box = box.at[:, 0].multiply(flip)
        src_ry = box[:, 6]
        ry = jnp.where(flip == 1, src_ry, jnp.sign(src_ry) * np.pi - src_ry)
        return box.at[:, 6].set(ry)

    return pts, flip_box(rois), flip_box(gt_of_rois)


@partial(jax.jit, static_argnames=("cfg",))
def proposal_target_layer(
    cfg,
    key,
    rois,
    roi_valid,
    gt_boxes3d,
    gt_valid,
    rpn_xyz,
    rpn_features,
    seg_mask,
    pts_depth,
    rpn_intensity=None,
    gt_cls=None,
):
    """Full target pipeline (reference ProposalTargetLayer.forward:14-76).

    Shapes: rois (B, M, 7); gt_boxes3d (B, G, 7); rpn_xyz (B, N, 3);
    rpn_features (B, N, 128); seg_mask/pts_depth (B, N);
    gt_cls (B, G) int32 0-based foreground-class indices (None == all class 0,
    the single-class case).
    Returns a dict of per-roi tensors flattened to (B*R, ...).
    """
    B = rois.shape[0]
    c = cfg.RCNN
    keys = jax.random.split(key, B * 3).reshape(B, 3, 2)

    sel, is_fg, roi_iou, gt_assign, degenerate = jax.vmap(
        lambda k, r, rv, g, gv: _sample_rois_one(k, r, rv, g, gv, cfg)
    )(keys[:, 0], rois, roi_valid, gt_boxes3d, gt_valid)

    batch_rois = jnp.take_along_axis(rois, sel[..., None], axis=1)  # (B, R, 7)
    batch_gt = jnp.take_along_axis(gt_boxes3d, gt_assign[..., None], axis=1)
    if gt_cls is None:
        gt_cls = jnp.zeros(gt_boxes3d.shape[:2], jnp.int32)
    roi_cls = jnp.take_along_axis(gt_cls.astype(jnp.int32), gt_assign, axis=1)

    batch_rois, roi_iou = jax.vmap(
        lambda k, r, g, i, f: _aug_rois_by_noise_one(k, r, g, i, f, cfg)
    )(keys[:, 1], batch_rois, batch_gt, roi_iou, is_fg)

    # point pooling over the augmented rois
    extra = [seg_mask[..., None]]
    if c.USE_INTENSITY and rpn_intensity is not None:
        extra.insert(0, rpn_intensity[..., None])
    if c.USE_DEPTH:
        extra.append((pts_depth / 70.0 - 0.5)[..., None])
    pts_feature = jnp.concatenate(extra + [rpn_features], axis=-1)

    pooled, empty = roipool3d(
        rpn_xyz, pts_feature, batch_rois, c.POOL_EXTRA_WIDTH, c.NUM_POINTS,
        method=getattr(c, "ROIPOOL_METHOD", "auto"),
    )
    sampled_pts, sampled_feats = pooled[..., 0:3], pooled[..., 3:]

    if cfg.AUG_DATA:
        sampled_pts, batch_rois, batch_gt = jax.vmap(
            lambda k, p, r, g: _roi_augmentation_one(k, p, r, g, cfg)
        )(keys[:, 2], sampled_pts, batch_rois, batch_gt)

    # canonical transformation (proposal_target_layer.py:45-56)
    roi_ry = batch_rois[..., 6] % (2 * np.pi)
    roi_center = batch_rois[..., 0:3]
    sampled_pts = sampled_pts - roi_center[:, :, None, :]
    batch_gt = batch_gt.at[..., 0:3].add(-roi_center)
    batch_gt = batch_gt.at[..., 6].add(-roi_ry)
    sampled_pts = jax.vmap(rotate_pc_along_y)(sampled_pts, batch_rois[..., 6])
    batch_gt = jax.vmap(lambda g, a: rotate_pc_along_y(g[:, None, :], a)[:, 0])(
        batch_gt, roi_ry
    )

    # labels (proposal_target_layer.py:58-66); foreground label is the
    # 1-based gt class index, which reduces to the binary 0/1 convention in
    # the single-class case (roi_cls is all zeros there)
    valid_mask = ~empty & ~degenerate[:, None]
    reg_valid = ((roi_iou > c.REG_FG_THRESH) & valid_mask).astype(jnp.int32)
    cls_label = jnp.where(roi_iou > c.CLS_FG_THRESH, roi_cls + 1, 0)
    uncertain = (roi_iou > c.CLS_BG_THRESH) & (roi_iou < c.CLS_FG_THRESH)
    cls_label = jnp.where(~valid_mask | uncertain, -1, cls_label)

    R = c.ROI_PER_IMAGE
    return {
        "sampled_pts": sampled_pts.reshape(B * R, c.NUM_POINTS, 3),
        "pts_feature": sampled_feats.reshape(B * R, c.NUM_POINTS, -1),
        "cls_label": cls_label.reshape(-1),
        "reg_valid_mask": reg_valid.reshape(-1),
        "gt_of_rois": batch_gt.reshape(B * R, 7),
        "gt_iou": roi_iou.reshape(-1),
        "roi_boxes3d": batch_rois.reshape(B * R, 7),
        "gt_cls_of_rois": roi_cls.reshape(-1),
    }
