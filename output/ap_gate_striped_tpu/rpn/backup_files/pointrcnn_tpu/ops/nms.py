"""Fixed-shape greedy NMS.

TPU-native equivalent of the reference's bitmask NMS (``nms_gpu`` /
``nms_normal_gpu``, iou3d_kernel.cu:244-345 + sequential CPU sweep
iou3d.cpp:100-116).  Identical greedy semantics — boxes sorted by score,
a box is suppressed iff some higher-scoring *kept* box overlaps it above
threshold — expressed as a precomputed K x K suppression matrix plus a
blockwise sequential sweep, all fixed-shape so it vmaps over the batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pointrcnn_tpu.ops.iou3d import aligned_iou_bev, boxes_iou_bev

_BLOCK = 32


def greedy_suppress(over_thresh: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy suppression over a (K, K) boolean overlap matrix
    (score-sorted rows): box j is suppressed iff some higher-ranked *kept*
    box overlaps it.

    The greedy solution is the unique fixpoint of
    ``kept[j] = not any(over[i, j] and kept[i] for i < j)`` (well-founded in
    rank order).  We Jacobi-iterate that equation — each step is ONE masked
    (K,) x (K, K) matvec on the MXU — and stop at the fixpoint; it converges
    in the longest suppression-chain depth (~10 for detection workloads)
    instead of the K sequential steps of the reference's bitmask sweep
    (iou3d.cpp:100-116).  Exact: two equal consecutive iterates imply the
    unique fixpoint.
    """
    K = over_thresh.shape[0]
    # strict upper triangle: i can only suppress j > i
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    O = (over_thresh & (col > row)).astype(jnp.bfloat16)

    def cond(state):
        kept, prev, i = state
        return (i < K) & jnp.any(kept != prev)

    def body(state):
        kept, prev, i = state
        suppressed = (kept.astype(jnp.bfloat16) @ O) > 0.5
        return jnp.logical_not(suppressed), kept, i + 1

    kept0 = jnp.ones((K,), bool)
    kept, _, _ = jax.lax.while_loop(cond, body, (kept0, jnp.zeros((K,), bool), 0))
    return kept


@partial(jax.jit, static_argnames=("thresh", "rotated", "pre_max", "post_max"))
def nms_bev(
    boxes_bev: jnp.ndarray,
    scores: jnp.ndarray,
    thresh: float,
    pre_max: int,
    post_max: int,
    rotated: bool,
    valid: jnp.ndarray | None = None,
):
    """Score-sorted greedy NMS over (N, 5) BEV boxes.

    :param valid: optional (N,) mask of real (non-padding) boxes
    :return: (idx, keep_valid) — (post_max,) indices into the *input* order
        and a boolean mask of which of them are genuine survivors.  Padded
        slots point at index 0.
    """
    n = boxes_bev.shape[0]
    pre = min(pre_max, n)
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    top_scores, order = jax.lax.top_k(scores, pre)  # score-descending
    cand = boxes_bev[order]

    iou = boxes_iou_bev(cand, cand) if rotated else aligned_iou_bev(cand, cand)
    over = iou > thresh
    alive = top_scores > -jnp.inf
    over = over & alive[None, :] & alive[:, None]
    keep = greedy_suppress(over) & alive

    # first post_max survivors in score order
    rank = jnp.where(keep, jnp.arange(pre), pre)
    neg, _ = jax.lax.top_k(-rank, min(post_max, pre))
    sel = -neg  # ascending positions of survivors
    keep_valid = sel < pre
    sel = jnp.where(keep_valid, sel, 0)
    idx = order[sel]
    if post_max > pre:
        idx = jnp.pad(idx, (0, post_max - pre))
        keep_valid = jnp.pad(keep_valid, (0, post_max - pre))
    return idx, keep_valid
