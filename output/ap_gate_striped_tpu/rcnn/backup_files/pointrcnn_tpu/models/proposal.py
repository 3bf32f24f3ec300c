"""Proposal decoding + distance-zoned NMS, fully batched and jittable.

Re-design of the reference ProposalLayer (lib/rpn/proposal_layer.py:9-142):
the per-sample Python loop and dynamic-size zone splits become a vmapped,
fixed-shape computation — zone membership masks + in-zone score ranks replace
boolean indexing, and survivors are padded to RPN_POST_NMS_TOP_N (the
reference zero-pads to the same bound, proposal_layer.py:38-39).

One bounded deviation: each zone's NMS considers only its top
``RPN.NMS_MAX_CANDIDATES`` scoring candidates (default 2048) instead of the
full pre-NMS budget (9000); suppression past 2k candidates essentially never
changes the top-512 survivors for 16384-point KITTI scenes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointrcnn_tpu.ops.nms import nms_bev
from pointrcnn_tpu.utils.box_coder import decode_bbox_target
from pointrcnn_tpu.utils.box_ops import boxes3d_to_bev

NMS_RANGES = (0.0, 40.0, 80.0)  # reference proposal_layer.py:65


def _zone_proposals(boxes, scores, zone_valid, pre_n, post_n, nms_thresh, rotated, max_cand):
    """NMS within one distance zone.  boxes (N, 7), scores (N,),
    zone_valid (N,) -> (boxes (post_n, 7), scores (post_n,), valid (post_n,))."""
    n = scores.shape[0]
    zone_scores = jnp.where(zone_valid, scores, -jnp.inf)
    # enforce the pre-NMS budget: only the top pre_n in-zone boxes compete
    k = min(max_cand, n)
    top_scores, top_idx = jax.lax.top_k(zone_scores, k)
    rank_ok = jnp.arange(k) < pre_n
    cand_valid = (top_scores > -jnp.inf) & rank_ok
    cand_boxes = boxes[top_idx]

    bev = boxes3d_to_bev(cand_boxes)
    keep_idx, keep_valid = nms_bev(
        bev, top_scores, thresh=nms_thresh, pre_max=k, post_max=post_n,
        rotated=rotated, valid=cand_valid,
    )
    out_boxes = cand_boxes[keep_idx] * keep_valid[:, None]
    out_scores = jnp.where(keep_valid, top_scores[keep_idx], 0.0)
    return out_boxes, out_scores, keep_valid


def _zone2_with_fallback(proposals, scores, pre1):
    """Per-batch zone masks with the zone-2 fallback (reference
    proposal_layer.py:92-100): when a sample's 40-80m zone is empty, its
    zone-2 budget reuses zone-1 boxes ranked past the zone-1 pre budget.
    The fallback needs a full per-sample score sort, but fires only for
    degenerate scenes — so it sits behind a batch-level ``lax.cond`` and
    costs nothing on the common path.  proposals (B, N, 7), scores (B, N)."""
    dist = proposals[..., 2]
    mask1 = (dist > NMS_RANGES[0]) & (dist <= NMS_RANGES[1])
    mask2 = (dist > NMS_RANGES[1]) & (dist <= NMS_RANGES[2])
    has2 = jnp.any(mask2, axis=1)  # (B,)

    def fallback():
        def one(m1, s):
            n = s.shape[0]
            order = jnp.argsort(-s)
            rank_in_1 = jnp.cumsum(m1[order]) - 1  # rank within zone 1
            leftover_sorted = m1[order] & (rank_in_1 >= pre1)
            return jnp.zeros((n,), bool).at[order].set(leftover_sorted)

        return jax.vmap(one)(mask1, scores)

    leftover = jax.lax.cond(jnp.all(has2), lambda: jnp.zeros_like(mask2), fallback)
    zone2 = jnp.where(has2[:, None], mask2, leftover)
    return mask1, zone2


def distance_based_proposal(
    proposals, scores, pre_top_n, post_top_n, nms_thresh, rotated, max_cand
):
    """Single-sample zoned proposal selection (reference
    proposal_layer.py:58-119).  proposals (N, 7), scores (N,)."""
    mask1, zone2 = _zone2_with_fallback(
        proposals[None], scores[None], int(pre_top_n * 0.7)
    )
    return _distance_zones_nms(
        proposals, scores, mask1[0], zone2[0],
        pre_top_n, post_top_n, nms_thresh, rotated, max_cand,
    )


def _distance_zones_nms(
    proposals, scores, mask1, zone2, pre_top_n, post_top_n, nms_thresh, rotated, max_cand
):
    """Zoned NMS on one sample with precomputed zone masks
    (:func:`_zone2_with_fallback`)."""
    pre_list = (int(pre_top_n * 0.7), pre_top_n - int(pre_top_n * 0.7))
    post_list = (int(post_top_n * 0.7), post_top_n - int(post_top_n * 0.7))

    b1, s1, v1 = _zone_proposals(
        proposals, scores, mask1, pre_list[0], post_list[0], nms_thresh, rotated, max_cand
    )
    b2, s2, v2 = _zone_proposals(
        proposals, scores, zone2, pre_list[1], post_list[1], nms_thresh, rotated, max_cand
    )
    return (
        jnp.concatenate([b1, b2], axis=0),
        jnp.concatenate([s1, s2], axis=0),
        jnp.concatenate([v1, v2], axis=0),
    )


def score_based_proposal(proposals, scores, pre_top_n, post_top_n, nms_thresh, rotated, max_cand):
    """Plain top-K + NMS (reference proposal_layer.py:121-142)."""
    valid = jnp.ones(scores.shape, bool)
    return _zone_proposals(
        proposals, scores, valid, pre_top_n, post_top_n, nms_thresh, rotated, max_cand
    )


def proposal_layer(cfg, mode: str, rpn_scores, rpn_reg, xyz):
    """Decode per-point regressions and select proposals.

    :param rpn_scores: (B, N) raw cls logits
    :param rpn_reg: (B, N, C); xyz: (B, N, 3)
    :return: (rois (B, M, 7), roi_scores_raw (B, M), roi_valid (B, M))
        with M = cfg[mode].RPN_POST_NMS_TOP_N.
    """
    B, N = rpn_scores.shape
    mode_cfg = cfg[mode]
    anchor = jnp.asarray(cfg.CLS_MEAN_SIZE[0])

    proposals = decode_bbox_target(
        xyz.reshape(-1, 3),
        rpn_reg.reshape(-1, rpn_reg.shape[-1]),
        loc_scope=cfg.RPN.LOC_SCOPE,
        loc_bin_size=cfg.RPN.LOC_BIN_SIZE,
        num_head_bin=cfg.RPN.NUM_HEAD_BIN,
        anchor_size=anchor,
        get_xz_fine=cfg.RPN.LOC_XZ_FINE,
        get_y_by_bin=False,
        get_ry_fine=False,
    )
    # set y to the box bottom (reference proposal_layer.py:31)
    proposals = proposals.at[:, 1].add(proposals[:, 3] / 2)
    proposals = proposals.reshape(B, N, 7)

    rotated = cfg.RPN.NMS_TYPE == "rotate"
    common = (
        mode_cfg.RPN_PRE_NMS_TOP_N,
        mode_cfg.RPN_POST_NMS_TOP_N,
        mode_cfg.RPN_NMS_THRESH,
        rotated,
        cfg.RPN.NMS_MAX_CANDIDATES,
    )
    if mode_cfg.RPN_DISTANCE_BASED_PROPOSE:
        pre1 = int(mode_cfg.RPN_PRE_NMS_TOP_N * 0.7)
        mask1, zone2 = _zone2_with_fallback(proposals, rpn_scores, pre1)
        return jax.vmap(
            lambda p, s, m1, z2: _distance_zones_nms(p, s, m1, z2, *common)
        )(proposals, rpn_scores, mask1, zone2)
    return jax.vmap(
        lambda p, s: score_based_proposal(p, s, *common)
    )(proposals, rpn_scores)
