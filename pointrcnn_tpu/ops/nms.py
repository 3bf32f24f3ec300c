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
    """Greedy sweep over a (K, K) boolean overlap matrix (score-sorted rows).

    Returns keep mask (K,).  Row i's overlaps only matter when i survives;
    processed in _BLOCK-row blocks: within a block the 32 steps are unrolled
    (cheap vector ops), across blocks a fori_loop carries the suppressed mask.
    """
    K = over_thresh.shape[0]
    assert K % _BLOCK == 0, f"NMS size {K} must be a multiple of {_BLOCK}"
    # strict upper triangle: i can only suppress j > i
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    O = over_thresh & (col > row)

    def block_body(b, suppressed):
        rows = jax.lax.dynamic_slice(O, (b * _BLOCK, 0), (_BLOCK, K))  # (32, K)
        base = b * _BLOCK
        for i in range(_BLOCK):
            kept_i = jnp.logical_not(suppressed[base + i])
            suppressed = suppressed | (kept_i & rows[i])
        return suppressed

    suppressed = jax.lax.fori_loop(0, K // _BLOCK, block_body, jnp.zeros((K,), bool))
    return jnp.logical_not(suppressed)


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
    pad = (-pre) % _BLOCK
    over = iou > thresh
    alive = top_scores > -jnp.inf
    over = over & alive[None, :] & alive[:, None]
    if pad:
        over = jnp.pad(over, ((0, pad), (0, pad)))
    keep = greedy_suppress(over)[:pre] & alive

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
