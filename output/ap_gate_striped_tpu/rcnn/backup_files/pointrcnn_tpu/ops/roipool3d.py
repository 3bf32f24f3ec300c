"""RoI-aware point pooling.

TPU-native equivalent of the reference's roipool3d CUDA extension
(lib/utils/roipool3d/src/roipool3d_kernel.cu).  Matches the kernel's exact
selection semantics: the first ``num_sampled`` in-box points *in point
order*, cyclically duplicated (slot k takes hit ``k % cnt``) when a box has
fewer, and an empty flag when it has none (roipool3d_kernel.cu:123-160).
Selection is a top-k over integer order keys instead of a sequential scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointrcnn_tpu.ops.common import first_k_in_order, gather_points
from pointrcnn_tpu.utils.box_ops import enlarge_box3d, points_in_boxes3d


def roipool3d(
    xyz: jnp.ndarray,
    features: jnp.ndarray,
    boxes3d: jnp.ndarray,
    extra_width: float,
    num_sampled: int,
    method: str = "auto",
):
    """Pool points + features inside (enlarged) boxes.

    :param xyz: (B, N, 3); features: (B, N, C); boxes3d: (B, M, 7)
    :param method: "auto" picks approx first-K on TPU for large N and exact
        otherwise; "exact"/"approx" force a path.
    :return: (pooled (B, M, num_sampled, 3 + C), empty_flag (B, M) bool)
        pooled xyz are in the original frame (canonical transform is the
        caller's job, as in the reference rcnn_net.py:146-153).
    """
    if method not in ("auto", "exact", "approx"):
        raise ValueError(
            f"roipool3d method must be 'auto'|'exact'|'approx', got {method!r}"
        )
    B, N, _ = xyz.shape
    big = enlarge_box3d(boxes3d, extra_width)
    mask = points_in_boxes3d(xyz, big)  # (B, M, N)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_approx = method == "approx" or (method == "auto" and on_tpu and N >= 4096)
    if use_approx:
        # default TPU path: approx_min_k (PartialReduce) over order keys —
        # "approximately the first K in point order".  Upstream shuffling
        # makes point order random, so any in-box subset is equivalent; the
        # A/B harness (tools/ab_approximations.py) measured bit-identical
        # final boxes vs exact.
        order = jnp.where(
            mask, jax.lax.broadcasted_iota(jnp.int32, mask.shape, 2), N
        )
        vals, _ = jax.lax.approx_min_k(order.astype(jnp.float32), num_sampled)
        hits = vals.astype(jnp.int32)
        # recall<1 can leave no-hit sentinels among real hits; backfill with
        # the first hit so downstream cyclic duplication stays in-box
        hits = jnp.where(hits >= N, jnp.minimum(hits[..., 0:1], N - 1), hits)
    elif on_tpu and B * boxes3d.shape[1] * N * num_sampled <= (1 << 33):
        # EXACT first-K-in-order selection (ops.common.first_k_in_order),
        # making the config-selectable exact path cheap (~2.6 ms over approx
        # at RCNN eval shapes instead of the ~40 ms a top_k sort costs).
        # Slots past the hit count come out 0; cyclic duplication below only
        # reads slots < cnt, so no sentinel/backfill is needed.
        # The rank compare-and-reduce implies a LOGICAL (B, M, N, K) tensor
        # that must stay fused (never hit HBM); that fusion is A/B-measured
        # at the eval shapes 4x100x16384x512 = 2^31.6 cells.  Past ~2^33
        # cells fall back to the materialisation-free top_k path below
        # rather than bet on the compiler.
        hits = first_k_in_order(mask, num_sampled)
    else:
        order = jnp.where(
            mask, jax.lax.broadcasted_iota(jnp.int32, mask.shape, 2), N
        )
        neg, _ = jax.lax.top_k(-order, num_sampled)
        hits = -neg  # (B, M, K) ascending first-hit indices, N where no hit
    cnt = jnp.sum(mask, axis=-1)  # (B, M)
    empty = cnt == 0

    k = jax.lax.broadcasted_iota(jnp.int32, hits.shape, 2)
    wrap = k % jnp.maximum(cnt[..., None], 1)
    sel = jnp.where(k < cnt[..., None], k, wrap)
    if on_tpu:
        # lane-wise wrap-gather as a one-hot contraction: XLA lowers
        # take_along_axis here to a serialized per-element gather (~2.6 ms at
        # eval shapes); the compare+reduce fuses on-chip instead (~2.4x).
        # HIGHEST keeps the single-nonzero dot bit-exact (indices < N << 2^24).
        oh = (sel[..., None] == jnp.arange(num_sampled, dtype=jnp.int32)).astype(
            jnp.float32
        )
        idx = jnp.einsum(
            "bmkj,bmj->bmk", oh, hits.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
    else:
        idx = jnp.take_along_axis(hits, sel, axis=-1)
    idx = jnp.where(empty[..., None], 0, idx)

    # one gather over the concatenated (3 + C) table instead of two: the
    # XLA gather cost is per-row, not per-channel
    table = jnp.concatenate([xyz, features.astype(xyz.dtype)], axis=-1)
    pooled = gather_points(table, idx)  # (B, M, K, 3 + C)
    pooled = jnp.where(empty[..., None, None], 0.0, pooled)
    return pooled, empty


def pts_in_boxes3d(pts: jnp.ndarray, boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) x (M, 7) -> (M, N) bool; unbatched point-in-box test
    (reference roipool3d.cpp:97-125 CPU op, used by gt-database tooling)."""
    return points_in_boxes3d(pts, boxes3d)
