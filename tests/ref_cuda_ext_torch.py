"""Pure-host stand-ins for the reference's CUDA extensions.

``iou3d_cuda`` (SURVEY.md N1) and ``roipool3d_cuda`` (N2) with the same call
signatures the reference wrappers use (lib/utils/iou3d/iou3d_utils.py:6-87,
lib/utils/roipool3d/roipool3d_utils.py:7-29), so the reference's REAL
proposal/NMS/pooling code paths execute on CPU for whole-pipeline parity
tests.  The geometry comes from this repo's host twin
(pointrcnn_tpu.utils.native / np_geometry), itself oracle-pinned against
shapely; the selection semantics (greedy sorted-order NMS sweep
iou3d.cpp:100-116, first-K-in-order + cyclic-duplicate pooling
roipool3d_kernel.cu:123-160) are implemented here directly.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

from pointrcnn_tpu.utils import native
from pointrcnn_tpu.utils.np_geometry import points_in_boxes3d


# --------------------------------------------------------------- iou3d_cuda


def _bev_overlap(rects_a: np.ndarray, rects_b: np.ndarray) -> np.ndarray:
    """(M, 5) x (N, 5) [x1, z1, x2, z2, ry] -> rotated intersection areas."""
    return native.bev_overlap(
        np.ascontiguousarray(rects_a, np.float32),
        np.ascontiguousarray(rects_b, np.float32),
    ).astype(np.float32)


def boxes_overlap_bev_gpu(boxes_a, boxes_b, ans_overlap):
    ans_overlap.copy_(torch.from_numpy(
        _bev_overlap(boxes_a.numpy(), boxes_b.numpy())))


def boxes_iou_bev_gpu(boxes_a, boxes_b, ans_iou):
    a, b = boxes_a.numpy(), boxes_b.numpy()
    ov = _bev_overlap(a, b)
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    iou = ov / np.maximum(area_a + area_b - ov, 1e-8)
    ans_iou.copy_(torch.from_numpy(iou.astype(np.float32)))


def _nms_sweep(iou: np.ndarray, thresh: float) -> np.ndarray:
    """Sequential greedy suppression over pre-sorted boxes
    (iou3d.cpp:100-116)."""
    n = iou.shape[0]
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
    return np.asarray(keep, np.int64)


def nms_gpu(boxes, keep, thresh):
    """boxes: (N, 5) pre-sorted; writes survivor indices into ``keep`` and
    returns their count (rotated-IoU criterion, nms_kernel)."""
    a = boxes.numpy()
    ov = _bev_overlap(a, a)
    area = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    iou = ov / np.maximum(area[:, None] + area[None, :] - ov, 1e-8)
    out = _nms_sweep(iou, float(thresh))
    keep[: len(out)] = torch.from_numpy(out)
    return len(out)


def nms_normal_gpu(boxes, keep, thresh):
    """Axis-aligned-IoU variant (iou3d_kernel.cu:295-303 ignores ry)."""
    a = boxes.numpy()
    x1, z1, x2, z2 = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    xx1 = np.maximum(x1[:, None], x1[None, :])
    zz1 = np.maximum(z1[:, None], z1[None, :])
    xx2 = np.minimum(x2[:, None], x2[None, :])
    zz2 = np.minimum(z2[:, None], z2[None, :])
    ov = np.maximum(xx2 - xx1, 0) * np.maximum(zz2 - zz1, 0)
    area = (x2 - x1) * (z2 - z1)
    iou = ov / np.maximum(area[:, None] + area[None, :] - ov, 1e-8)
    out = _nms_sweep(iou, float(thresh))
    keep[: len(out)] = torch.from_numpy(out)
    return len(out)


# ----------------------------------------------------------- roipool3d_cuda


def forward(pts, pooled_boxes3d, pts_feature, pooled_features,
            pooled_empty_flag):
    """In-place pooling: first ``sampled_pt_num`` in-box points in index
    order, cyclic duplication when short, empty flag when none
    (roipool3d_kernel.cu:123-194).  ``pooled_boxes3d`` arrives pre-enlarged
    by the wrapper."""
    B, M, K = (pooled_features.shape[0], pooled_features.shape[1],
               pooled_features.shape[2])
    p = pts.numpy()
    f = pts_feature.numpy()
    boxes = pooled_boxes3d.numpy()
    for b in range(B):
        mask = points_in_boxes3d(p[b], boxes[b])  # (M, N) bool
        for m in range(M):
            hits = np.flatnonzero(mask[m])
            if len(hits) == 0:
                pooled_empty_flag[b, m] = 1
                continue
            idx = hits[:K]
            if len(idx) < K:
                idx = idx[np.arange(K) % len(idx)]
            merged = np.concatenate([p[b][idx], f[b][idx]], axis=1)
            pooled_features[b, m] = torch.from_numpy(merged)


def pts_in_boxes3d_cpu(pts_flag, pts, boxes3d):
    mask = points_in_boxes3d(pts.numpy(), boxes3d.numpy())
    pts_flag.copy_(torch.from_numpy(mask.astype(np.int64)))


# ------------------------------------------------------------- installation


def install() -> None:
    """Populate the ``iou3d_cuda`` / ``roipool3d_cuda`` modules (reusing any
    placeholder modules already registered, so install order vs the reference
    wrapper imports doesn't matter) and shim the ``torch.cuda.*Tensor``
    constructors the wrappers allocate results with."""
    iou = sys.modules.setdefault("iou3d_cuda", types.ModuleType("iou3d_cuda"))
    iou.boxes_overlap_bev_gpu = boxes_overlap_bev_gpu
    iou.boxes_iou_bev_gpu = boxes_iou_bev_gpu
    iou.nms_gpu = nms_gpu
    iou.nms_normal_gpu = nms_normal_gpu

    pool = sys.modules.setdefault(
        "roipool3d_cuda", types.ModuleType("roipool3d_cuda"))
    pool.forward = forward
    pool.pts_in_boxes3d_cpu = pts_in_boxes3d_cpu

    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor
        torch.cuda.IntTensor = torch.IntTensor
        torch.cuda.LongTensor = torch.LongTensor
        torch.cuda.ByteTensor = torch.ByteTensor
        # decode_bbox_target does anchor.to(roi.get_device()); on CPU
        # get_device() returns -1, which .to() rejects — map it to "cpu"
        # (same shim as tests/test_reference_parity.py)
        if not getattr(torch.Tensor.get_device, "_cpu_shim", False):
            orig_get_device = torch.Tensor.get_device

            def _get_device(self):
                d = orig_get_device(self)
                return "cpu" if d == -1 else d

            _get_device._cpu_shim = True
            torch.Tensor.get_device = _get_device
