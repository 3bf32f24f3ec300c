"""Order-dependent semantics pinned against sequential host oracles.

These are the semantics that determine whether detections match the
reference implementation (SURVEY.md 'hard parts' #2): sorted-order greedy
NMS suppression (iou3d.cpp:105-116) and the distance-zone proposal budget
arithmetic + zone-2 fallback (proposal_layer.py:58-119).  The device path
expresses both as fixed-shape batched programs (Jacobi-fixpoint NMS, masked
zone selection); here each is checked against a direct sequential
transcription of the reference control flow running on the host.
"""

import numpy as np
import jax.numpy as jnp

from pointrcnn_tpu.ops.nms import nms_bev
from pointrcnn_tpu.utils import native
from pointrcnn_tpu.utils.box_ops import boxes3d_to_bev
from pointrcnn_tpu.models.proposal import distance_based_proposal


def clustered_boxes3d(rng, n, n_clusters=8, z_range=(5, 75)):
    """Heavily overlapping clusters — the stress case for suppression order."""
    boxes = np.zeros((n, 7), np.float32)
    centers = np.stack([
        rng.uniform(-25, 25, n_clusters),
        np.full(n_clusters, 1.6),
        rng.uniform(*z_range, n_clusters),
    ], 1)
    per = n // n_clusters
    for k in range(n_clusters):
        s = k * per
        e = n if k == n_clusters - 1 else s + per
        m = e - s
        boxes[s:e, 0:3] = centers[k] + rng.normal(0, 0.5, (m, 3))
        boxes[s:e, 3:6] = [1.5, 1.6, 3.9] + rng.normal(0, 0.05, (m, 3))
        boxes[s:e, 6] = rng.normal(0, 0.4, m)
    return boxes


def greedy_nms_host(boxes3d, scores, thresh, rotated):
    """Sequential greedy NMS in score order (reference bitmask sweep
    semantics, iou3d.cpp:100-116), exact rotated IoU via the native clipper."""
    order = np.argsort(-scores, kind="stable")
    b = boxes3d[order]
    if rotated:
        rects = np.stack([
            b[:, 0] - b[:, 5] / 2, b[:, 2] - b[:, 4] / 2,
            b[:, 0] + b[:, 5] / 2, b[:, 2] + b[:, 4] / 2, b[:, 6],
        ], 1).astype(np.float32)
        areas = b[:, 4] * b[:, 5]
    else:
        x1 = b[:, 0] - b[:, 5] / 2; z1 = b[:, 2] - b[:, 4] / 2
        x2 = b[:, 0] + b[:, 5] / 2; z2 = b[:, 2] + b[:, 4] / 2
        areas = (x2 - x1) * (z2 - z1)
    alive = np.ones(len(order), bool)
    keep = []
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(int(order[i]))
        rest = np.nonzero(alive[i + 1:])[0] + i + 1
        if rest.size == 0:
            continue
        if rotated:
            ov = native.bev_overlap(rects[i:i + 1], rects[rest])[0]
        else:
            iw = np.minimum(x2[i], x2[rest]) - np.maximum(x1[i], x1[rest])
            ih = np.minimum(z2[i], z2[rest]) - np.maximum(z1[i], z1[rest])
            ov = np.clip(iw, 0, None) * np.clip(ih, 0, None)
        iou = ov / np.maximum(areas[i] + areas[rest] - ov, 1e-8)
        alive[rest[iou > thresh]] = False
    return keep


def test_rotated_nms_matches_sequential_greedy():
    rng = np.random.RandomState(3)
    boxes = clustered_boxes3d(rng, 256)
    scores = rng.rand(256).astype(np.float32)
    bev = np.asarray(boxes3d_to_bev(jnp.asarray(boxes)))
    idx, valid = nms_bev(jnp.asarray(bev), jnp.asarray(scores), thresh=0.8,
                         pre_max=256, post_max=256, rotated=True)
    got = np.asarray(idx)[np.asarray(valid)]
    want = greedy_nms_host(boxes, scores, 0.8, rotated=True)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_distance_zone_proposals_match_reference_control_flow():
    """distance_based_proposal == a direct transcription of the reference's
    per-zone Python loop (proposal_layer.py:58-119): 70/30 pre/post budgets,
    zone-2 fallback into zone-1's leftovers, concatenation order."""
    rng = np.random.RandomState(4)
    n = 2048
    boxes = np.concatenate([
        clustered_boxes3d(rng, n // 2, z_range=(5, 38)),
        clustered_boxes3d(rng, n // 2, z_range=(42, 78)),
    ])
    scores = rng.rand(n).astype(np.float32)
    pre_n, post_n, thresh = 512, 64, 0.8

    got_boxes, got_scores, got_valid = distance_based_proposal(
        jnp.asarray(boxes), jnp.asarray(scores), pre_n, post_n, thresh,
        rotated=True, max_cand=n,
    )
    got_boxes = np.asarray(got_boxes)[np.asarray(got_valid)]

    want = _reference_zone_oracle(boxes, scores, pre_n, post_n, thresh)
    np.testing.assert_array_equal(got_boxes.round(4), boxes[want].round(4))


def _reference_zone_oracle(boxes, scores, pre_n, post_n, thresh):
    """Direct transcription of reference proposal_layer.py:58-119: per-zone
    pre-NMS budgets in score order; zone 2 falls back to zone 1's boxes past
    its budget ONLY when zone 2 is completely empty."""
    pre_list = (int(pre_n * 0.7), pre_n - int(pre_n * 0.7))
    post_list = (int(post_n * 0.7), post_n - int(post_n * 0.7))
    dist = boxes[:, 2]
    masks = [(dist > 0) & (dist <= 40.0), (dist > 40.0) & (dist <= 80.0)]
    order = np.argsort(-scores, kind="stable")
    want = []
    for zi in (0, 1):
        zone_idx = order[masks[zi][order]]
        if zi == 1 and zone_idx.size == 0:
            first_idx = order[masks[0][order]]
            take = first_idx[pre_list[0]:][: pre_list[1]]
        else:
            take = zone_idx[: pre_list[zi]]
        keep_local = greedy_nms_host(boxes[take], scores[take], thresh, True)
        want.append(take[keep_local][: post_list[zi]])
    return np.concatenate(want)


def test_zone2_empty_fallback_matches_reference():
    """All boxes near: zone 2 empty, its budget must come from zone 1's
    leftovers (reference proposal_layer.py:92-100 else-branch)."""
    rng = np.random.RandomState(5)
    boxes = clustered_boxes3d(rng, 1024, z_range=(5, 38))
    scores = rng.rand(1024).astype(np.float32)
    pre_n, post_n, thresh = 512, 64, 0.8

    got_boxes, _, got_valid = distance_based_proposal(
        jnp.asarray(boxes), jnp.asarray(scores), pre_n, post_n, thresh,
        rotated=True, max_cand=1024,
    )
    got_boxes = np.asarray(got_boxes)[np.asarray(got_valid)]
    want = _reference_zone_oracle(boxes, scores, pre_n, post_n, thresh)
    np.testing.assert_array_equal(got_boxes.round(4), boxes[want].round(4))
