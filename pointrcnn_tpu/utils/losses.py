"""Detection losses as pure jnp functions.

Re-implementations of the reference losses (lib/utils/loss_utils.py:7-233)
with one structural change for TPU: the reference gathers foreground rows
with boolean fancy-indexing (dynamic shapes); here every loss takes the full
fixed-shape tensor plus a foreground mask and computes masked means, which is
numerically identical and jit-stable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.clip(jnp.sum(mask), 1.0, None)


def _select_bin(mat: jnp.ndarray, bin_idx: jnp.ndarray) -> jnp.ndarray:
    """Row-wise ``mat[i, bin_idx[i]]`` as a one-hot compare-reduce.

    Bit-exact replacement for ``take_along_axis(mat, bin_idx[:, None], 1)``
    for in-range indices (every caller computes bins via clip+floor).  This
    backend lowers take_along_axis to a serialized per-row gather (~2.5 ms
    per site at B*N=262144 in the RPN loss — measured, tools/probe_loss_opt2
    .py); the compare-reduce fuses into the surrounding elementwise work.
    """
    width = mat.shape[-1]
    oh = bin_idx[..., None] == jnp.arange(width, dtype=bin_idx.dtype)
    return jnp.sum(jnp.where(oh, mat, 0), axis=-1)


def sigmoid_cross_entropy_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """TF-style elementwise sigmoid CE (reference loss_utils.py:76-84)."""
    return jnp.clip(logits, 0.0, None) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def dice_loss(logits: jnp.ndarray, target: jnp.ndarray, ignore_target: float = -1.0) -> jnp.ndarray:
    """Soft-IoU loss over sigmoid scores (reference DiceLoss, loss_utils.py:7-21)."""
    p = jax.nn.sigmoid(logits.reshape(-1))
    t = target.reshape(-1).astype(p.dtype)
    mask = (t != ignore_target).astype(p.dtype)
    inter = jnp.sum(jnp.minimum(p, t) * mask)
    union = jnp.clip(jnp.sum(jnp.maximum(p, t) * mask), 1.0, None)
    return 1.0 - inter / union


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Elementwise sigmoid focal loss (reference loss_utils.py:24-73).
    Returns the unreduced per-element loss (caller sums, matching
    train_functions.py:69-79)."""
    ce = sigmoid_cross_entropy_with_logits(logits, targets)
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1.0 - targets) * (1.0 - p)
    modulating = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    alpha_w = targets * alpha + (1.0 - targets) * (1.0 - alpha) if alpha is not None else 1.0
    return modulating * alpha_w * ce * weights


def weighted_binary_cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    fg_weight: float,
    valid_mask: jnp.ndarray,
) -> jnp.ndarray:
    """BCE with a foreground up-weight, masked mean over valid entries
    (reference train_functions.py:83-90)."""
    weight = jnp.where(target > 0, fg_weight, 1.0)
    ce = sigmoid_cross_entropy_with_logits(logits, (target > 0).astype(logits.dtype))
    return _masked_mean(ce * weight, valid_mask)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def _masked_softmax_ce(logits: jnp.ndarray, label: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy over integer labels, mean over masked rows."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -_select_bin(logp, label)
    return _masked_mean(nll, mask)


def get_reg_loss(
    pred_reg: jnp.ndarray,
    reg_label: jnp.ndarray,
    fg_mask: jnp.ndarray,
    loc_scope: float,
    loc_bin_size: float,
    num_head_bin: int,
    anchor_size: jnp.ndarray,
    get_xz_fine: bool = True,
    get_y_by_bin: bool = False,
    loc_y_scope: float = 0.5,
    loc_y_bin_size: float = 0.25,
    get_ry_fine: bool = False,
):
    """Bin-based box regression loss (reference loss_utils.get_reg_loss:87-233).

    :param pred_reg: (N, C) raw regression output for every candidate
    :param reg_label: (N, 7) [dx, dy, dz, h, w, l, ry] targets
    :param fg_mask: (N,) foreground mask — losses are means over fg rows
    :param anchor_size: (3,) or (N, 3) mean size
    :return: (loc_loss, angle_loss, size_loss, dict of scalars)
    """
    per_loc_bin_num = int(loc_scope / loc_bin_size) * 2
    loc_y_bin_num = int(loc_y_scope / loc_y_bin_size) * 2
    fg = fg_mask.astype(pred_reg.dtype)
    d = {}

    # --- x/z bins ---
    x_off, y_off, z_off = reg_label[:, 0], reg_label[:, 1], reg_label[:, 2]
    x_shift = jnp.clip(x_off + loc_scope, 0.0, loc_scope * 2 - 1e-3)
    z_shift = jnp.clip(z_off + loc_scope, 0.0, loc_scope * 2 - 1e-3)
    x_bin = jnp.floor(x_shift / loc_bin_size).astype(jnp.int32)
    z_bin = jnp.floor(z_shift / loc_bin_size).astype(jnp.int32)

    x_bin_l, x_bin_r = 0, per_loc_bin_num
    z_bin_l, z_bin_r = per_loc_bin_num, per_loc_bin_num * 2
    start = z_bin_r

    loss_x_bin = _masked_softmax_ce(pred_reg[:, x_bin_l:x_bin_r], x_bin, fg)
    loss_z_bin = _masked_softmax_ce(pred_reg[:, z_bin_l:z_bin_r], z_bin, fg)
    d["loss_x_bin"], d["loss_z_bin"] = loss_x_bin, loss_z_bin
    loc_loss = loss_x_bin + loss_z_bin

    if get_xz_fine:
        x_res_l, x_res_r = per_loc_bin_num * 2, per_loc_bin_num * 3
        z_res_l, z_res_r = per_loc_bin_num * 3, per_loc_bin_num * 4
        start = z_res_r
        x_res_label = (x_shift - (x_bin.astype(x_shift.dtype) * loc_bin_size + loc_bin_size / 2)) / loc_bin_size
        z_res_label = (z_shift - (z_bin.astype(z_shift.dtype) * loc_bin_size + loc_bin_size / 2)) / loc_bin_size
        x_res_pred = _select_bin(pred_reg[:, x_res_l:x_res_r], x_bin)
        z_res_pred = _select_bin(pred_reg[:, z_res_l:z_res_r], z_bin)
        loss_x_res = _masked_mean(smooth_l1(x_res_pred, x_res_label), fg)
        loss_z_res = _masked_mean(smooth_l1(z_res_pred, z_res_label), fg)
        d["loss_x_res"], d["loss_z_res"] = loss_x_res, loss_z_res
        loc_loss = loc_loss + loss_x_res + loss_z_res

    # --- y ---
    if get_y_by_bin:
        y_bin_l, y_bin_r = start, start + loc_y_bin_num
        y_res_l, y_res_r = y_bin_r, y_bin_r + loc_y_bin_num
        start = y_res_r
        y_shift = jnp.clip(y_off + loc_y_scope, 0.0, loc_y_scope * 2 - 1e-3)
        y_bin = jnp.floor(y_shift / loc_y_bin_size).astype(jnp.int32)
        y_res_label = (y_shift - (y_bin.astype(y_shift.dtype) * loc_y_bin_size + loc_y_bin_size / 2)) / loc_y_bin_size
        y_res_pred = _select_bin(pred_reg[:, y_res_l:y_res_r], y_bin)
        loss_y_bin = _masked_softmax_ce(pred_reg[:, y_bin_l:y_bin_r], y_bin, fg)
        loss_y_res = _masked_mean(smooth_l1(y_res_pred, y_res_label), fg)
        d["loss_y_bin"], d["loss_y_res"] = loss_y_bin, loss_y_res
        loc_loss = loc_loss + loss_y_bin + loss_y_res
    else:
        loss_y_offset = _masked_mean(smooth_l1(pred_reg[:, start], y_off), fg)
        start = start + 1
        d["loss_y_offset"] = loss_y_offset
        loc_loss = loc_loss + loss_y_offset

    # --- heading ---
    ry_bin_l, ry_bin_r = start, start + num_head_bin
    ry_res_l, ry_res_r = ry_bin_r, ry_bin_r + num_head_bin
    ry_label = reg_label[:, 6]

    if get_ry_fine:
        # pi/2 bins with opposite-direction flip (RCNN refinement head)
        angle_per_class = (np.pi / 2) / num_head_bin
        ry_mod = ry_label % (2 * np.pi)
        opposite = (ry_mod > np.pi * 0.5) & (ry_mod < np.pi * 1.5)
        ry_mod = jnp.where(opposite, (ry_mod + np.pi) % (2 * np.pi), ry_mod)
        shift_angle = (ry_mod + np.pi * 0.5) % (2 * np.pi)
        shift_angle = jnp.clip(shift_angle - np.pi * 0.25, 1e-3, np.pi * 0.5 - 1e-3)
        ry_bin = jnp.floor(shift_angle / angle_per_class).astype(jnp.int32)
        ry_res_label = shift_angle - (ry_bin.astype(shift_angle.dtype) * angle_per_class + angle_per_class / 2)
    else:
        angle_per_class = (2 * np.pi) / num_head_bin
        heading = ry_label % (2 * np.pi)
        shift_angle = (heading + angle_per_class / 2) % (2 * np.pi)
        ry_bin = jnp.floor(shift_angle / angle_per_class).astype(jnp.int32)
        ry_res_label = shift_angle - (ry_bin.astype(shift_angle.dtype) * angle_per_class + angle_per_class / 2)
    ry_res_norm_label = ry_res_label / (angle_per_class / 2)

    ry_res_pred = _select_bin(pred_reg[:, ry_res_l:ry_res_r], ry_bin)
    loss_ry_bin = _masked_softmax_ce(pred_reg[:, ry_bin_l:ry_bin_r], ry_bin, fg)
    loss_ry_res = _masked_mean(smooth_l1(ry_res_pred, ry_res_norm_label), fg)
    d["loss_ry_bin"], d["loss_ry_res"] = loss_ry_bin, loss_ry_res
    angle_loss = loss_ry_bin + loss_ry_res

    # --- size ---
    size_res_l, size_res_r = ry_res_r, ry_res_r + 3
    assert pred_reg.shape[1] == size_res_r, f"{pred_reg.shape[1]} vs {size_res_r}"
    anchor_size = jnp.asarray(anchor_size)
    size_label = (reg_label[:, 3:6] - anchor_size) / anchor_size
    size_loss = _masked_mean(
        jnp.mean(smooth_l1(pred_reg[:, size_res_l:size_res_r], size_label), axis=1), fg
    )

    d["loss_loc"], d["loss_angle"], d["loss_size"] = loc_loss, angle_loss, size_loss
    return loc_loss, angle_loss, size_loss, d
