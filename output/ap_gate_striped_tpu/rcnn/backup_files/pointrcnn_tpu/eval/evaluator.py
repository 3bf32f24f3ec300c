"""Detection evaluation pipelines (reference tools/eval_rcnn.py:113-683).

Each mode builds ONE jitted, fixed-shape eval step (model forward + box
decode + score threshold + final rotated NMS + recall IoUs all on device);
the host loop only does file IO, recall accounting and KITTI-format output.
"""

from __future__ import annotations

import logging
import os

import numpy as np
import jax
import jax.numpy as jnp

from pointrcnn_tpu.ops.iou3d import boxes_iou3d
from pointrcnn_tpu.ops.nms import nms_bev
from pointrcnn_tpu.utils.box_coder import decode_bbox_target
from pointrcnn_tpu.utils.box_ops import boxes3d_to_bev
from pointrcnn_tpu.utils.np_geometry import boxes3d_to_corners3d

THRESH_LIST = (0.1, 0.3, 0.5, 0.7, 0.9)


def seg_iou_sample(seg_result, rpn_cls_label) -> float:
    """Foreground seg IoU of ONE sample (reference eval_rcnn.py:209-213):
    correct / max(fg + positive - correct, 1)."""
    seg = np.asarray(seg_result).astype(np.int64)
    label = np.asarray(rpn_cls_label).astype(np.int64)
    fg = label > 0
    correct = float(((seg == label) & fg).sum())
    union = float(fg.sum()) + float((seg > 0).sum()) - correct
    return correct / max(union, 1.0)


FG_CLASS_NAMES = {
    "Car": ("Car",),
    "Pedestrian": ("Pedestrian",),
    "Cyclist": ("Cyclist",),
    "People": ("Pedestrian", "Cyclist"),
}


def save_kitti_format(sample_id, calib, bbox3d, kitti_output_dir, scores,
                      img_shape, class_name="Car", pred_cls=None):
    """Write detections as KITTI result lines (reference eval_rcnn.py:69-94):
    3D->2D corner projection, clipped; boxes covering >80% of the image are
    vetoed; alpha from beta + ry.  For multi-class configs ``pred_cls`` is a
    per-box 0-based foreground-class index used to pick the output name."""
    names = FG_CLASS_NAMES.get(class_name, (class_name,))
    corners3d = boxes3d_to_corners3d(bbox3d)
    img_boxes, _ = calib.corners3d_to_img_boxes(corners3d)
    img_boxes[:, 0] = np.clip(img_boxes[:, 0], 0, img_shape[1] - 1)
    img_boxes[:, 1] = np.clip(img_boxes[:, 1], 0, img_shape[0] - 1)
    img_boxes[:, 2] = np.clip(img_boxes[:, 2], 0, img_shape[1] - 1)
    img_boxes[:, 3] = np.clip(img_boxes[:, 3], 0, img_shape[0] - 1)
    w = img_boxes[:, 2] - img_boxes[:, 0]
    h = img_boxes[:, 3] - img_boxes[:, 1]
    valid = (w < img_shape[1] * 0.8) & (h < img_shape[0] * 0.8)

    path = os.path.join(kitti_output_dir, "%06d.txt" % sample_id)
    with open(path, "w") as f:
        for k in range(bbox3d.shape[0]):
            if not valid[k]:
                continue
            x, z, ry = bbox3d[k, 0], bbox3d[k, 2], bbox3d[k, 6]
            beta = np.arctan2(z, x)
            alpha = -np.sign(beta) * np.pi / 2 + beta + ry
            name = names[int(pred_cls[k])] if pred_cls is not None else names[0]
            print(
                "%s -1 -1 %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f"
                % (
                    name, alpha,
                    img_boxes[k, 0], img_boxes[k, 1], img_boxes[k, 2], img_boxes[k, 3],
                    bbox3d[k, 3], bbox3d[k, 4], bbox3d[k, 5],
                    bbox3d[k, 0], bbox3d[k, 1], bbox3d[k, 2], bbox3d[k, 6], scores[k],
                ),
                file=f,
            )


def save_rpn_features(result_dir, sample_id, seg_result, rpn_scores_raw,
                      pts_intensity, backbone_xyz, backbone_features):
    """On-disk stage interface (reference eval_rcnn.py:97-110)."""
    np.save(os.path.join(result_dir, "%06d.npy" % sample_id), backbone_features)
    np.save(os.path.join(result_dir, "%06d_xyz.npy" % sample_id), backbone_xyz)
    np.save(os.path.join(result_dir, "%06d_seg.npy" % sample_id), seg_result)
    np.save(os.path.join(result_dir, "%06d_intensity.npy" % sample_id), pts_intensity)
    np.save(os.path.join(result_dir, "%06d_rawscore.npy" % sample_id), rpn_scores_raw)


def build_joint_eval_step(model, cfg, with_gt: bool):
    """Jitted full two-stage eval step (reference eval_one_epoch_joint
    body, eval_rcnn.py:459-630)."""

    from pointrcnn_tpu.models.point_rcnn import num_classes_for

    n_cls = num_classes_for(cfg)

    def step(variables, pts_input, gt_boxes3d=None, gt_valid=None):
        out = model.apply(variables, {"pts_input": pts_input}, train=False)
        B = pts_input.shape[0]
        rois = out["rois"]
        M = rois.shape[1]
        rcnn_reg = out["rcnn_reg"].reshape(B, M, -1)

        if n_cls == 2:
            rcnn_cls = out["rcnn_cls"].reshape(B, M)
            raw_scores = rcnn_cls
            norm_scores = jax.nn.sigmoid(raw_scores)
            pred_cls = jnp.zeros((B, M), jnp.int32)
            anchor = jnp.asarray(cfg.CLS_MEAN_SIZE[0])
        else:
            # multi-class head: softmax over (bg + fg classes); the box is
            # decoded with the predicted class's anchor
            logits = out["rcnn_cls"].reshape(B, M, n_cls)
            probs = jax.nn.softmax(logits, axis=-1)
            pred_cls = jnp.argmax(probs[..., 1:], axis=-1).astype(jnp.int32)
            norm_scores = jnp.max(probs[..., 1:], axis=-1)
            # rank by log softmax probability, NOT the max fg logit: the raw
            # logit is not monotone with the probability across boxes (the
            # bg logit shifts it), which would misorder NMS and the AP
            # ranking score written to the KITTI file
            raw_scores = jnp.max(
                jax.nn.log_softmax(logits, axis=-1)[..., 1:], axis=-1
            )
            anchor = jnp.asarray(cfg.CLS_MEAN_SIZE)[pred_cls.reshape(-1)]

        pred_boxes3d = decode_bbox_target(
            rois.reshape(-1, 7), rcnn_reg.reshape(B * M, -1),
            anchor_size=anchor,
            loc_scope=cfg.RCNN.LOC_SCOPE,
            loc_bin_size=cfg.RCNN.LOC_BIN_SIZE,
            num_head_bin=cfg.RCNN.NUM_HEAD_BIN,
            get_xz_fine=True, get_y_by_bin=cfg.RCNN.LOC_Y_BY_BIN,
            loc_y_scope=cfg.RCNN.LOC_Y_SCOPE, loc_y_bin_size=cfg.RCNN.LOC_Y_BIN_SIZE,
            get_ry_fine=True,
        ).reshape(B, M, 7)

        keep_score = (norm_scores > cfg.RCNN.SCORE_THRESH) & out["roi_valid"]

        def final_nms(boxes, scores, valid):
            bev = boxes3d_to_bev(boxes)
            idx, ok = nms_bev(
                bev, scores, thresh=cfg.RCNN.NMS_THRESH, pre_max=M, post_max=M,
                rotated=True, valid=valid,
            )
            return idx, ok

        sel_idx, sel_valid = jax.vmap(final_nms)(pred_boxes3d, raw_scores, keep_score)

        result = {
            "rois": rois,
            "roi_scores_raw": out["roi_scores_raw"],
            "roi_valid": out["roi_valid"],
            "seg_result": out["seg_result"],
            "pred_boxes3d": pred_boxes3d,
            "raw_scores": raw_scores,
            "norm_scores": norm_scores,
            "pred_cls": pred_cls,
            "sel_idx": sel_idx,
            "sel_valid": sel_valid,
            "rpn_cls": out["rpn_cls"],
            "backbone_xyz": out["backbone_xyz"],
            "backbone_features": out["backbone_features"],
        }
        if with_gt and gt_boxes3d is not None:
            def gt_iou(pred, roi, gt):
                iou_p = boxes_iou3d(pred, gt)  # (M, G)
                iou_r = boxes_iou3d(roi, gt)
                return jnp.max(iou_p, axis=0), jnp.max(iou_r, axis=0)

            gt_max_iou, roi_gt_max_iou = jax.vmap(gt_iou)(pred_boxes3d, rois, gt_boxes3d)
            result["gt_max_iou"] = gt_max_iou
            result["roi_gt_max_iou"] = roi_gt_max_iou
        return result

    return jax.jit(step)


def _put(batch_arrays, mesh):
    if mesh is None:
        return batch_arrays
    from pointrcnn_tpu.parallel.mesh import shard_batch

    return shard_batch(batch_arrays, mesh)


_STEP_CACHE: dict = {}


def _cached_step(builder, model, cfg, with_gt: bool):
    """Memoise jitted eval steps across epochs/checkpoints.

    The builders close over ``model``/``cfg``; a fresh ``jax.jit`` per call
    recompiles the whole two-stage graph (~50 s) on every epoch of an
    ``--eval_all`` sweep.  ConfigNode is hashable by design, so (builder,
    cfg, mode, n_cls, with_gt) identifies the traced program exactly —
    ``num_classes`` is user-overridable independently of cfg.CLASSES, so it
    must key the cache too."""
    from pointrcnn_tpu.models.point_rcnn import num_classes_for

    n_cls = model.num_classes or num_classes_for(cfg)
    key = (builder.__name__, cfg, model.mode, n_cls, with_gt)
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = builder(model, cfg, with_gt)
    return _STEP_CACHE[key]


@jax.jit
def _flatpack(arrs):
    """Concatenate arbitrary arrays into ONE flat f32 device buffer."""
    return jnp.concatenate([a.astype(jnp.float32).reshape(-1) for a in arrs])


def _pack_fetch(out: dict, fetch: list):
    """Pack the fetch-relevant outputs into a single device array + spec.

    Every fetched array costs a full transfer round-trip on this backend
    (~10 ms each through the relay); seven arrays per batch made the fetch,
    not the compute, the eval-loop bottleneck.  All fetched values survive
    an f32 round-trip exactly (f32 scores/boxes/IoUs, small int32 indices,
    bools)."""
    spec = [(k, out[k].shape, out[k].dtype) for k in fetch if k in out]
    packed = _flatpack(tuple(out[k] for k, _, _ in spec))
    return packed, spec


def _unpack_fetch(flat: np.ndarray, spec) -> dict:
    out, off = {}, 0
    for k, shape, dtype in spec:
        n = int(np.prod(shape)) if shape else 1
        out[k] = flat[off : off + n].reshape(shape).astype(dtype)
        off += n
    return out


def _pipelined_epoch(loader, enqueue, process):
    """Drive an eval epoch one batch ahead of host post-processing.

    ``enqueue(batch)`` uploads + dispatches the jitted step and returns the
    un-fetched device output; ``process(batch, out)`` consumes the fetched
    host arrays (KITTI decode, recall accounting, file writes).  Dispatch is
    asynchronous, so fetching batch i only after batch i+1 is enqueued
    overlaps all host work (loader, decode, IO) with device compute — the
    reference gets the same overlap from CUDA stream asynchrony + DataLoader
    workers (eval_rcnn.py's tqdm loop).  ``jax.device_get`` is the only
    reliable sync point on this backend (see docs/ROUND_NOTES.md)."""
    def fetch(handles):
        packed, spec = handles
        return _unpack_fetch(np.asarray(jax.device_get(packed)), spec)

    pending = None
    for batch in loader:
        handles = enqueue(batch)
        if pending is not None:
            pb, ph = pending
            process(pb, fetch(ph))
        pending = (batch, handles)
    if pending is not None:
        pb, ph = pending
        process(pb, fetch(ph))


def eval_one_epoch_joint(model, variables, cfg, loader, result_dir,
                         logger=None, test_mode=False, save_result=False,
                         mesh=None):
    logger = logger or logging.getLogger(__name__)
    dataset = loader.dataset
    final_output_dir = os.path.join(result_dir, "final_result", "data")
    os.makedirs(final_output_dir, exist_ok=True)

    if save_result:
        roi_output_dir = os.path.join(result_dir, "roi_result", "data")
        refine_output_dir = os.path.join(result_dir, "refine_result", "data")
        rpn_output_dir = os.path.join(result_dir, "rpn_result", "data")
        for d in (roi_output_dir, refine_output_dir, rpn_output_dir):
            os.makedirs(d, exist_ok=True)

    with_gt = not test_mode
    step = _cached_step(build_joint_eval_step, model, cfg, with_gt)

    total_recalled = np.zeros(len(THRESH_LIST), np.int64)
    total_roi_recalled = np.zeros(len(THRESH_LIST), np.int64)
    total_gt = 0
    final_total = 0

    # fetch only what the host loop reads: un-fetched device outputs are
    # dropped without ever crossing the wire (backbone features alone are
    # ~34 MB/batch — >1 s/batch through this backend's transfer path)
    fetch = ["pred_boxes3d", "raw_scores", "pred_cls", "sel_idx", "sel_valid"]
    if with_gt:
        fetch += ["gt_max_iou", "roi_gt_max_iou"]
    if save_result:
        fetch += ["rpn_cls", "backbone_xyz", "rois", "roi_valid", "roi_scores_raw"]

    def enqueue(batch):
        dev = _put(
            {k: batch[k] for k in ("pts_input", "gt_boxes3d", "gt_valid") if k in batch},
            mesh,
        )
        if with_gt and "gt_boxes3d" in batch:
            out = step(variables, dev["pts_input"], dev["gt_boxes3d"], dev["gt_valid"])
        else:
            out = step(variables, dev["pts_input"])
        return _pack_fetch(out, fetch)

    def process(batch, out):
        nonlocal total_gt, final_total
        B = batch["pts_input"].shape[0]
        if with_gt and "gt_max_iou" in out:
            gt_valid = batch["gt_valid"]
            for k in range(B):
                v = gt_valid[k]
                if v.sum() == 0:
                    continue
                gmi = out["gt_max_iou"][k][v]
                rmi = out["roi_gt_max_iou"][k][v]
                for i, th in enumerate(THRESH_LIST):
                    total_recalled[i] += int((gmi > th).sum())
                    total_roi_recalled[i] += int((rmi > th).sum())
                total_gt += int(v.sum())

        if save_result:
            # intermediate dumps (reference eval_rcnn.py:584-608)
            seg = (jax.nn.sigmoid(out["rpn_cls"][..., 0]) > cfg.RPN.SCORE_THRESH)
            dump = np.concatenate(
                [out["backbone_xyz"], out["rpn_cls"],
                 np.asarray(seg)[..., None].astype(np.float32)], axis=2
            ).astype(np.float32)
            for k in range(B):
                sid = int(batch["sample_id"][k])
                calib = dataset.get_calib(sid)
                img_shape = dataset.get_image_shape(sid)
                v = out["roi_valid"][k]
                save_kitti_format(sid, calib, out["rois"][k][v], roi_output_dir,
                                  out["roi_scores_raw"][k][v], img_shape, cfg.CLASSES)
                save_kitti_format(sid, calib, out["pred_boxes3d"][k][v], refine_output_dir,
                                  out["raw_scores"][k][v], img_shape, cfg.CLASSES)
                np.save(os.path.join(rpn_output_dir, "%06d.npy" % sid), dump[k])

        for k in range(B):
            sel = out["sel_idx"][k][out["sel_valid"][k]]
            if sel.size == 0:
                continue
            boxes = out["pred_boxes3d"][k][sel]
            scores = out["raw_scores"][k][sel]
            sample_id = int(batch["sample_id"][k])
            calib = dataset.get_calib(sample_id)
            img_shape = dataset.get_image_shape(sample_id)
            final_total += boxes.shape[0]
            save_kitti_format(
                sample_id, calib, boxes, final_output_dir, scores, img_shape,
                class_name=cfg.CLASSES, pred_cls=out["pred_cls"][k][sel],
            )

    _pipelined_epoch(loader, enqueue, process)

    # empty files for samples with no detections (reference eval_rcnn.py:631-642)
    split_file_ids = [int(s) for s in dataset.image_idx_list]
    for sid in split_file_ids:
        path = os.path.join(final_output_dir, "%06d.txt" % sid)
        if not os.path.exists(path):
            open(path, "w").close()

    ret = {"final_total": final_total, "total_gt_bbox": max(total_gt, 1)}
    for i, th in enumerate(THRESH_LIST):
        ret[f"recall_{th}"] = total_recalled[i] / max(total_gt, 1)
        ret[f"roi_recall_{th}"] = total_roi_recalled[i] / max(total_gt, 1)
        logger.info(
            "recall@%.1f: %.4f (roi %.4f)", th, ret[f"recall_{th}"], ret[f"roi_recall_{th}"]
        )
    return ret, final_output_dir


def build_rcnn_offline_eval_step(model, cfg, with_gt: bool):
    """Jitted RCNN-only eval step over saved RPN proposals + features
    (reference eval_one_epoch_rcnn, eval_rcnn.py:256-456)."""
    from pointrcnn_tpu.models.point_rcnn import canonical_transform, num_classes_for
    from pointrcnn_tpu.ops.roipool3d import roipool3d

    n_cls = num_classes_for(cfg)

    def step(variables, rpn_xyz, rpn_features, rpn_intensity, seg_mask,
             pts_depth, rois, roi_valid, roi_scores, gt_boxes3d=None):
        B, M = rois.shape[0], rois.shape[1]
        extra = [seg_mask[..., None]]
        if cfg.RCNN.USE_INTENSITY:
            extra.insert(0, rpn_intensity[..., None])
        if cfg.RCNN.USE_DEPTH:
            extra.append((pts_depth / 70.0 - 0.5)[..., None])
        pts_feature = jnp.concatenate(extra + [rpn_features], axis=-1)
        pooled, empty = roipool3d(
            rpn_xyz, pts_feature, rois, cfg.RCNN.POOL_EXTRA_WIDTH, cfg.RCNN.NUM_POINTS,
            method=getattr(cfg.RCNN, "ROIPOOL_METHOD", "auto"),
        )
        pooled = pooled.at[..., 0:3].set(canonical_transform(pooled[..., 0:3], rois))
        pts_input = pooled.reshape(B * M, cfg.RCNN.NUM_POINTS, -1)
        out = model.apply(variables, {"pts_input": pts_input}, train=False)

        rcnn_reg = out["rcnn_reg"].reshape(B, M, -1)
        if n_cls == 2:
            rcnn_cls = out["rcnn_cls"].reshape(B, M)
            raw_scores = rcnn_cls
            norm_scores = jax.nn.sigmoid(raw_scores)
            pred_cls = jnp.zeros((B, M), jnp.int32)
            anchor = jnp.asarray(cfg.CLS_MEAN_SIZE[0])
        else:
            # multi-class head (same semantics as the joint step): box
            # decoded with the predicted class's anchor; ranking by log
            # softmax probability (monotone with the thresholded score)
            logits = out["rcnn_cls"].reshape(B, M, n_cls)
            probs = jax.nn.softmax(logits, axis=-1)
            pred_cls = jnp.argmax(probs[..., 1:], axis=-1).astype(jnp.int32)
            norm_scores = jnp.max(probs[..., 1:], axis=-1)
            raw_scores = jnp.max(
                jax.nn.log_softmax(logits, axis=-1)[..., 1:], axis=-1
            )
            anchor = jnp.asarray(cfg.CLS_MEAN_SIZE)[pred_cls.reshape(-1)]
        pred_boxes3d = decode_bbox_target(
            rois.reshape(-1, 7), rcnn_reg.reshape(B * M, -1),
            anchor_size=anchor,
            loc_scope=cfg.RCNN.LOC_SCOPE, loc_bin_size=cfg.RCNN.LOC_BIN_SIZE,
            num_head_bin=cfg.RCNN.NUM_HEAD_BIN,
            get_xz_fine=True, get_y_by_bin=cfg.RCNN.LOC_Y_BY_BIN,
            loc_y_scope=cfg.RCNN.LOC_Y_SCOPE, loc_y_bin_size=cfg.RCNN.LOC_Y_BIN_SIZE,
            get_ry_fine=True,
        ).reshape(B, M, 7)

        keep_score = (norm_scores > cfg.RCNN.SCORE_THRESH) & roi_valid

        def final_nms(boxes, scores, valid):
            bev = boxes3d_to_bev(boxes)
            return nms_bev(bev, scores, thresh=cfg.RCNN.NMS_THRESH, pre_max=M,
                           post_max=M, rotated=True, valid=valid)

        sel_idx, sel_valid = jax.vmap(final_nms)(pred_boxes3d, raw_scores, keep_score)
        result = {
            "pred_boxes3d": pred_boxes3d,
            "raw_scores": raw_scores,
            "norm_scores": norm_scores,
            "pred_cls": pred_cls,
            "sel_idx": sel_idx,
            "sel_valid": sel_valid,
        }
        if with_gt and gt_boxes3d is not None:
            def gt_iou(pred, gt):
                return jnp.max(boxes_iou3d(pred, gt), axis=0)

            result["gt_max_iou"] = jax.vmap(gt_iou)(pred_boxes3d, gt_boxes3d)
        return result

    return jax.jit(step)


def eval_one_epoch_rcnn_offline(model, variables, cfg, loader, result_dir,
                                logger=None, test_mode=False, mesh=None):
    """RCNN refinement over saved proposals (reference eval_rcnn.py:256-456)."""
    logger = logger or logging.getLogger(__name__)
    dataset = loader.dataset
    final_output_dir = os.path.join(result_dir, "final_result", "data")
    os.makedirs(final_output_dir, exist_ok=True)

    with_gt = not test_mode
    step = _cached_step(build_rcnn_offline_eval_step, model, cfg, with_gt)
    total_recalled = np.zeros(len(THRESH_LIST), np.int64)
    total_gt = 0

    fetch = ["pred_boxes3d", "raw_scores", "pred_cls", "sel_idx", "sel_valid"]
    if with_gt:
        fetch += ["gt_max_iou"]

    def enqueue(batch):
        keys = ["rpn_xyz", "rpn_features", "rpn_intensity", "seg_mask",
                "pts_depth", "roi_boxes3d", "roi_valid", "roi_scores"]
        dev = _put({k: batch[k] for k in keys if k in batch}, mesh)
        args = [dev[k] for k in keys if k != "roi_scores"]
        args.append(dev.get("roi_scores", jnp.zeros(dev["roi_valid"].shape)))
        if with_gt and "gt_boxes3d" in batch:
            out = step(variables, *args, jnp.asarray(batch["gt_boxes3d"]))
        else:
            out = step(variables, *args)
        return _pack_fetch(out, fetch)

    def process(batch, out):
        nonlocal total_gt
        B = batch["rpn_xyz"].shape[0]
        if with_gt and "gt_max_iou" in out:
            for k in range(B):
                v = batch["gt_valid"][k]
                if v.sum() == 0:
                    continue
                gmi = out["gt_max_iou"][k][v]
                for i, th in enumerate(THRESH_LIST):
                    total_recalled[i] += int((gmi > th).sum())
                total_gt += int(v.sum())

        for k in range(B):
            sel = out["sel_idx"][k][out["sel_valid"][k]]
            if sel.size == 0:
                continue
            sample_id = int(batch["sample_id"][k])
            calib = dataset.get_calib(sample_id)
            img_shape = dataset.get_image_shape(sample_id)
            save_kitti_format(
                sample_id, calib, out["pred_boxes3d"][k][sel], final_output_dir,
                out["raw_scores"][k][sel], img_shape, class_name=cfg.CLASSES,
                pred_cls=out["pred_cls"][k][sel],
            )

    _pipelined_epoch(loader, enqueue, process)

    for s in dataset.image_idx_list:
        path = os.path.join(final_output_dir, "%06d.txt" % int(s))
        if not os.path.exists(path):
            open(path, "w").close()

    ret = {"total_gt_bbox": max(total_gt, 1)}
    for i, th in enumerate(THRESH_LIST):
        ret[f"recall_{th}"] = total_recalled[i] / max(total_gt, 1)
        logger.info("rcnn recall@%.1f: %.4f", th, ret[f"recall_{th}"])
    return ret, final_output_dir


def build_rpn_eval_step(model, cfg, with_gt: bool):
    """Jitted RPN-only eval step (reference eval_one_epoch_rpn,
    eval_rcnn.py:113-253)."""

    def step(variables, pts_input, gt_boxes3d=None):
        out = model.apply(variables, {"pts_input": pts_input}, train=False)
        # RPN-only models don't run the proposal layer internally
        # (reference calls rpn.proposal_layer explicitly, eval_rcnn.py:150)
        if "rois" not in out:
            from pointrcnn_tpu.models.proposal import proposal_layer

            rois, roi_scores_raw, roi_valid = proposal_layer(
                cfg, model.mode, out["rpn_cls"][..., 0], out["rpn_reg"],
                out["backbone_xyz"],
            )
            out = {**out, "rois": rois, "roi_scores_raw": roi_scores_raw,
                   "roi_valid": roi_valid}
        result = {
            "rpn_cls": out["rpn_cls"],
            "backbone_xyz": out["backbone_xyz"],
            "backbone_features": out["backbone_features"],
            "rois": out["rois"],
            "roi_scores_raw": out["roi_scores_raw"],
            "roi_valid": out["roi_valid"],
            "seg_result": (jax.nn.sigmoid(out["rpn_cls"][..., 0]) > cfg.RPN.SCORE_THRESH),
        }
        if with_gt and gt_boxes3d is not None:
            def gt_iou(roi, gt):
                return jnp.max(boxes_iou3d(roi, gt), axis=0)

            result["roi_gt_max_iou"] = jax.vmap(gt_iou)(out["rois"], gt_boxes3d)
        return result

    return jax.jit(step)


def eval_one_epoch_rpn(model, variables, cfg, loader, result_dir,
                       logger=None, test_mode=False, save_rpn_feature=False,
                       mesh=None):
    logger = logger or logging.getLogger(__name__)
    dataset = loader.dataset
    rpn_output_dir = os.path.join(result_dir, "rpn_result", "data")
    os.makedirs(rpn_output_dir, exist_ok=True)
    if save_rpn_feature:
        features_dir = os.path.join(result_dir, "features")
        seg_dir = os.path.join(result_dir, "seg_result")
        os.makedirs(features_dir, exist_ok=True)
        os.makedirs(seg_dir, exist_ok=True)

    with_gt = not test_mode
    step = _cached_step(build_rpn_eval_step, model, cfg, with_gt)

    total_recalled = np.zeros(len(THRESH_LIST), np.int64)
    total_gt = 0
    seg_iou_sum, seg_cnt = 0.0, 0

    fetch = ["rois", "roi_valid", "roi_scores_raw", "seg_result"]
    if with_gt:
        fetch += ["roi_gt_max_iou"]
    if save_rpn_feature:
        fetch += ["rpn_cls", "backbone_xyz", "backbone_features"]

    def enqueue(batch):
        dev = _put(
            {k: batch[k] for k in ("pts_input", "gt_boxes3d") if k in batch}, mesh
        )
        if with_gt and "gt_boxes3d" in batch:
            out = step(variables, dev["pts_input"], dev["gt_boxes3d"])
        else:
            out = step(variables, dev["pts_input"])
        return _pack_fetch(out, fetch)

    def process(batch, out):
        nonlocal total_gt, seg_iou_sum, seg_cnt
        B = batch["pts_input"].shape[0]

        if with_gt and "roi_gt_max_iou" in out:
            for k in range(B):
                v = batch["gt_valid"][k]
                if v.sum() == 0:
                    continue
                gmi = out["roi_gt_max_iou"][k][v]
                for i, th in enumerate(THRESH_LIST):
                    total_recalled[i] += int((gmi > th).sum())
                total_gt += int(v.sum())
            if "rpn_cls_label" in batch:
                # macro-average over samples, as the reference does
                # (rpn_iou_avg summed per sample / cnt, eval_rcnn.py:209-213,141)
                for k in range(B):
                    seg_iou_sum += seg_iou_sample(
                        out["seg_result"][k], batch["rpn_cls_label"][k]
                    )
                    seg_cnt += 1

        for k in range(B):
            sample_id = int(batch["sample_id"][k])
            calib = dataset.get_calib(sample_id)
            img_shape = dataset.get_image_shape(sample_id)
            v = out["roi_valid"][k]
            save_kitti_format(
                sample_id, calib, out["rois"][k][v], rpn_output_dir,
                out["roi_scores_raw"][k][v], img_shape, class_name=cfg.CLASSES,
            )
            if save_rpn_feature:
                save_rpn_features(
                    features_dir, sample_id,
                    out["seg_result"][k].astype(np.float32),
                    out["rpn_cls"][k][..., 0],
                    batch["pts_features"][k][:, 0],
                    out["backbone_xyz"][k],
                    out["backbone_features"][k],
                )

    _pipelined_epoch(loader, enqueue, process)

    ret = {"total_gt_bbox": max(total_gt, 1)}
    for i, th in enumerate(THRESH_LIST):
        ret[f"recall_{th}"] = total_recalled[i] / max(total_gt, 1)
        logger.info("rpn recall@%.1f: %.4f", th, ret[f"recall_{th}"])
    if seg_cnt > 0:
        ret["rpn_seg_iou"] = seg_iou_sum / seg_cnt
    return ret, rpn_output_dir
