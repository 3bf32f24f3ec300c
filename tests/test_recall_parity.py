"""Micro-parity of the evaluator's recall bookkeeping vs the reference loop.

The joint evaluator accumulates per-gt recall from device-computed
``gt_max_iou`` / ``roi_gt_max_iou`` masked by ``gt_valid``
(eval/evaluator.py:301-312).  The reference instead trims *trailing
all-zero* gt rows per sample and maxes a host IoU matrix over all preds
(eval_rcnn.py:539-566).  These must agree on padded batches — including an
all-padding sample (the reference skips it via ``tmp_idx < 0``), trailing
zero rows, and invalid (padded) roi slots.

The transcription below recomputes recall counts the reference's way from
the SAME device outputs, with the host numpy IoU oracle (utils/np_geometry,
itself reference-parity-tested in test_reference_parity.py) standing in for
boxes_iou3d_gpu.
"""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointrcnn_tpu.config import load_config
from pointrcnn_tpu.eval.evaluator import THRESH_LIST, build_joint_eval_step
from pointrcnn_tpu.models.point_rcnn import PointRCNN
from pointrcnn_tpu.utils import np_geometry

REPO = pathlib.Path(__file__).resolve().parent.parent


def _reference_recall_counts(pred_boxes, gt_boxes_padded):
    """Transcription of eval_rcnn.py:539-566 (one stage's accumulation).

    pred_boxes: (B, M, 7) — ALL decoded boxes, pre-NMS/pre-threshold, as the
    reference uses them; gt_boxes_padded: (B, G, 7) with zero-row padding.
    """
    recalled = np.zeros(len(THRESH_LIST), np.int64)
    total_gt = 0
    for k in range(pred_boxes.shape[0]):
        cur_gt = gt_boxes_padded[k]
        tmp_idx = len(cur_gt) - 1
        while tmp_idx >= 0 and cur_gt[tmp_idx].sum() == 0:
            tmp_idx -= 1
        if tmp_idx < 0:
            continue
        cur_gt = cur_gt[: tmp_idx + 1]
        iou3d = np_geometry.boxes_iou3d(
            np.asarray(pred_boxes[k], np.float32), cur_gt.astype(np.float32)
        )
        gt_max_iou = iou3d.max(axis=0)
        for i, th in enumerate(THRESH_LIST):
            recalled[i] += int((gt_max_iou > th).sum())
        total_gt += cur_gt.shape[0]
    return recalled, total_gt


def _evaluator_recall_counts(gt_max_iou, gt_valid):
    """The accumulation exactly as eval_one_epoch_joint.process does it."""
    recalled = np.zeros(len(THRESH_LIST), np.int64)
    total_gt = 0
    for k in range(gt_max_iou.shape[0]):
        v = gt_valid[k]
        if v.sum() == 0:
            continue
        gmi = gt_max_iou[k][v]
        for i, th in enumerate(THRESH_LIST):
            recalled[i] += int((gmi > th).sum())
        total_gt += int(v.sum())
    return recalled, total_gt


@pytest.fixture(scope="module")
def joint_outputs():
    cfg = load_config(str(REPO / "tests" / "cfgs_tiny.yaml")).thaw()
    cfg.RPN.ENABLED = True
    cfg.RPN.FIXED = True
    cfg.RCNN.ENABLED = True
    cfg = cfg.freeze()
    model = PointRCNN(cfg=cfg, mode="TEST")
    B, N, G = 3, cfg.RPN.NUM_POINTS, 6

    rng = np.random.RandomState(7)
    pts = np.zeros((B, N, 3), np.float32)
    pts[..., 0] = rng.uniform(-20, 20, (B, N))
    pts[..., 1] = rng.uniform(-1, 3, (B, N))
    pts[..., 2] = rng.uniform(0, 40, (B, N))

    gt = np.zeros((B, G, 7), np.float32)
    gt_valid = np.zeros((B, G), bool)
    # sample 0: two real boxes, trailing padding
    gt[0, 0] = [2.0, 1.0, 15.0, 1.5, 1.6, 3.9, 0.3]
    gt[0, 1] = [-5.0, 1.2, 25.0, 1.5, 1.7, 4.1, -1.1]
    gt_valid[0, :2] = True
    # sample 1: one real box
    gt[1, 0] = [0.0, 1.0, 10.0, 1.4, 1.6, 3.6, 2.0]
    gt_valid[1, 0] = True
    # sample 2: NO gt at all (all padding) — the reference skips it entirely
    # cluster some points inside each real box so preds aren't degenerate
    for b, n_boxes in ((0, 2), (1, 1)):
        for g in range(n_boxes):
            c = gt[b, g]
            m = 40
            local = rng.uniform(-0.4, 0.4, (m, 3)).astype(np.float32) * [
                c[5] / 2, c[3] / 2, c[4] / 2
            ]
            pts[b, g * m : (g + 1) * m] = local + [c[0], c[1] - c[3] / 2, c[2]]

    batch = {
        "pts_input": jnp.asarray(pts),
        "gt_boxes3d": jnp.asarray(gt),
        "gt_valid": jnp.asarray(gt_valid),
    }
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "target": jax.random.PRNGKey(2),
    }
    variables = model.init(rngs, {"pts_input": batch["pts_input"]}, train=False)
    step = build_joint_eval_step(model, cfg, with_gt=True)
    out = step(variables, batch["pts_input"], batch["gt_boxes3d"], batch["gt_valid"])
    out = jax.device_get(out)
    return cfg, out, gt, gt_valid


def test_pred_recall_matches_reference_loop(joint_outputs):
    cfg, out, gt, gt_valid = joint_outputs
    ours, ours_gt = _evaluator_recall_counts(out["gt_max_iou"], gt_valid)
    ref, ref_gt = _reference_recall_counts(out["pred_boxes3d"], gt)
    assert ours_gt == ref_gt
    np.testing.assert_array_equal(ours, ref)


def test_roi_recall_matches_reference_loop(joint_outputs):
    cfg, out, gt, gt_valid = joint_outputs
    ours, ours_gt = _evaluator_recall_counts(out["roi_gt_max_iou"], gt_valid)
    # reference: iou3d_in = boxes_iou3d_gpu(roi_boxes3d[k], cur_gt) over the
    # zero-padded (POST_NMS_TOP_N, 7) roi tensor — padded zero rois
    # contribute IoU 0 and never change the per-gt max
    ref, ref_gt = _reference_recall_counts(out["rois"], gt)
    assert ours_gt == ref_gt
    np.testing.assert_array_equal(ours, ref)


def test_device_gt_max_iou_matches_host_oracle(joint_outputs):
    """The device boxes_iou3d inside the jitted step agrees with the host
    oracle on the valid gt columns (padded gt columns are masked out by the
    accumulation and may hold garbage IoU)."""
    cfg, out, gt, gt_valid = joint_outputs
    for k in range(gt.shape[0]):
        v = gt_valid[k]
        if v.sum() == 0:
            continue
        iou = np_geometry.boxes_iou3d(
            np.asarray(out["pred_boxes3d"][k], np.float32), gt[k][v].astype(np.float32)
        )
        np.testing.assert_allclose(
            out["gt_max_iou"][k][v], iou.max(axis=0), atol=1e-3
        )


def test_seg_iou_matches_reference_formula(joint_outputs):
    """RPN seg IoU per sample: correct/(fg + positive - correct), clamp 1
    (reference eval_rcnn.py:209-213; macro-averaged over samples via cnt)."""
    import torch

    cfg, out, gt, gt_valid = joint_outputs
    seg_result = np.asarray(out["seg_result"])  # (B, N) 0/1
    # fabricate labels: mark the clustered points fg
    rpn_cls_label = np.zeros(seg_result.shape, np.int64)
    rpn_cls_label[0, :80] = 1
    rpn_cls_label[1, :40] = 1

    from pointrcnn_tpu.eval.evaluator import seg_iou_sample

    for k in range(seg_result.shape[0]):
        # the reference's own torch formulation, verbatim semantics
        cur_seg = torch.from_numpy(seg_result[k].astype(np.int64))
        cur_label = torch.from_numpy(rpn_cls_label[k])
        fg_mask = cur_label > 0
        correct = ((cur_seg == cur_label) & fg_mask).sum().float()
        union = fg_mask.sum().float() + (cur_seg > 0).sum().float() - correct
        ref_iou = (correct / torch.clamp(union, min=1.0)).item()
        assert seg_iou_sample(seg_result[k], rpn_cls_label[k]) == pytest.approx(
            ref_iou, rel=1e-6
        )
