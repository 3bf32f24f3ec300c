"""Shared helpers for the point-cloud op library."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_hilo(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split f32 coordinates into (hi, lo) bf16 with hi + lo == x to
    ~|x| * 2^-15 (the two-term bf16 expansion the hi/lo Pallas kernels
    reconstruct on the MXU).

    ``hi`` is the TRUNCATED bf16 — the top 16 bits of the f32 pattern,
    obtained by bit-masking rather than the natural
    ``bf16(x - f32(bf16(x)))`` round-trip: XLA's excess-precision pass
    treats convert(convert(x, bf16), f32) as the identity on TPU and folds
    the residual to exactly ZERO (measured on chip, round 5 — the naive
    form loses the entire lo term, ~half a bf16 ulp ≈ 6 cm at 30 m).  A
    bitcast+mask cannot be folded.  lo = bf16(x - hi) with |x - hi| <
    ulp(x), so the bf16 round of the residual costs ≤ |x| * 2^-15.
    """
    xf = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32)
    hi = hi_f32.astype(jnp.bfloat16)  # exact: hi_f32 is bf16-representable
    lo = (xf - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def first_k_in_order(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the first ``k`` True lanes per row, in index order.

    ``mask`` (..., N) bool -> (..., k) int32.  Slots past the per-row hit
    count come out 0 (callers add their own backfill semantics).  EXACT
    first-K-in-order via hit ranks: the j-th selected lane is the one whose
    running hit count equals j, extracted by a compare-and-reduce that XLA
    fuses (no (..., N, K) tensor in HBM) — ~5x faster on TPU than the full
    sort a top_k over order keys lowers to.  Shared by the exact roipool and
    ball-query selection paths (reference roipool3d_kernel.cu:123-140 /
    ball_query_gpu.cu fill order).
    """
    N = mask.shape[-1]
    rank = jnp.cumsum(mask, axis=-1, dtype=jnp.int32) - 1
    kk = jnp.arange(k, dtype=jnp.int32)
    sel = (rank[..., None] == kk) & mask[..., None]
    # integer indices up to N must survive the dot exactly -> HIGHEST
    return jnp.einsum(
        "...nk,n->...k", sel.astype(jnp.float32),
        jnp.arange(N, dtype=jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)


def square_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distance.

    ``a``: (..., S, 3), ``b``: (..., N, 3) -> (..., S, N).
    Computed as |a|^2 + |b|^2 - 2 a.b so the inner product lands on the MXU.
    """
    # center first: |a|^2 + |b|^2 - 2ab cancels catastrophically in f32 at
    # scene-scale coordinates (~1e-2 m error at |x| ~ 70 m); distances are
    # translation-invariant, so subtract a common centroid
    center = jnp.mean(b, axis=-2, keepdims=True)
    a = a - center
    b = b - center
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    # geometry needs full f32 — the TPU default matmul precision is bf16,
    # which perturbs neighbor selection; the K=3 contraction is cheap anyway
    ab = jnp.einsum(
        "...sc,...nc->...sn", a, b,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def square_distance_exact(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Direct-difference pairwise squared distance (same shapes as
    :func:`square_distance`).

    f32-faithful to the CUDA kernels' per-pair dx^2+dy^2+dz^2 arithmetic
    (ball_query_gpu.cu and friends): the matmul form above, even centered,
    rounds differently and can flip in-radius membership for points at the
    radius boundary.  VPU-bound ((S, N, 3) broadcast), so reserved for the
    ``method='exact'`` CUDA-parity selection paths; the production approx
    paths keep the MXU form.
    """
    d = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(d * d, axis=-1)


def chunked_map(fn, x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Apply ``fn: (B, chunk, ...) -> (B, chunk, ...out)`` sequentially over
    fixed-size chunks of axis 1.

    Bounds peak memory of dense pairwise computations (distance matrices,
    IoU matrices) without dynamic shapes: the chunk count is static and the
    loop is a ``lax.map``.  ``chunk`` must divide the axis length; callers use
    power-of-two sizes throughout.
    """
    B, S = x.shape[0], x.shape[1]
    if chunk >= S:
        return fn(x)
    assert S % chunk == 0, f"chunk {chunk} must divide axis length {S}"
    xs = x.reshape((B, S // chunk, chunk) + x.shape[2:])
    xs = jnp.moveaxis(xs, 1, 0)  # (num_chunks, B, chunk, ...)
    ys = jax.lax.map(fn, xs)  # (num_chunks, B, chunk, ...out)
    ys = jnp.moveaxis(ys, 0, 1)  # (B, num_chunks, chunk, ...out)
    return ys.reshape((B, S) + ys.shape[3:])


def gather_points(points: jnp.ndarray, idx: jnp.ndarray, exact: bool = True) -> jnp.ndarray:
    """Batched index gather.

    ``points``: (B, N, C); ``idx``: (B, ...) int32 -> (B, ..., C).
    TPU-native replacement for the reference's ``gather_points`` /
    ``group_points`` CUDA ops (Pointnet2.PyTorch src/).

    On TPU with small tables (N <= 1024) this runs as a one-hot matmul on the
    MXU — ~8x faster than the XLA gather lowering for the RoI-stage shapes.
    A one-hot dot selects exactly one operand element per output, so with
    f32 operands it is bit-exact; ``exact=False`` additionally allows bf16
    operands (values round to bf16 — fine for features feeding bf16 MLPs).
    """
    B, N, C = points.shape
    flat = idx.reshape(B, -1)
    M = flat.shape[1]

    if jax.default_backend() in ("tpu", "axon") and N <= 1024 and M * N >= 1 << 16:
        dt = jnp.float32 if exact else jnp.bfloat16
        # exact mode needs full f32 passes — a one-hot dot has a single
        # nonzero per output, so HIGHEST makes it bit-exact; DEFAULT (bf16
        # multiplies) would truncate the gathered values
        prec = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
        # chunk the batch so the one-hot tensor stays ~<=64 MB
        per_b = M * N * (4 if exact else 2)
        chunk = max(1, min(B, (1 << 26) // max(per_b, 1)))
        while B % chunk:
            chunk -= 1

        def one(args):
            t, i = args
            oh = jax.nn.one_hot(i, N, dtype=dt)
            return jnp.einsum(
                "bmn,bnc->bmc", oh, t.astype(dt),
                precision=prec, preferred_element_type=jnp.float32,
            )

        ts = points.reshape(B // chunk, chunk, N, C)
        is_ = flat.reshape(B // chunk, chunk, M)
        out = jax.lax.map(one, (ts, is_)).reshape(B, M, C)
        return out.reshape(idx.shape + (C,))

    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(idx.shape + (C,))


@jax.custom_vjp
def _gather_mm_bwd(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis forward, transposed one-hot MATMUL backward.

    XLA's native VJP for a gather is a scatter-add, which serialises on TPU
    and is data-dependent (heavily-overlapping neighborhoods collide); the
    transposed one-hot einsum grad_P = sum_m [idx_m == n] g_m runs on the MXU
    at a fixed cost (same trick as ops.grouping._interp_matmul_bwd).  Used by
    group_points for mid-size tables (1024 < N <= 4096) where the one-hot
    FORWARD would be too much HBM traffic but the backward still wins.
    Gradients are bf16-rounded (the gathered features feed bf16 MLPs).
    """
    B, N, C = points.shape
    flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(idx.shape + (C,))


def _gather_mm_fwd_rule(points, idx):
    # zero-size proxy carries the primal dtype through the residuals
    # (dtype objects are not pytree leaves)
    return _gather_mm_bwd(points, idx), (
        idx, jnp.shape(points), jnp.zeros((0,), points.dtype))


def _gather_mm_bwd_rule(res, g):
    import numpy as _np

    idx, pshape, pproxy = res
    pdtype = pproxy.dtype
    B, N, C = pshape
    flat = idx.reshape(B, -1)
    M = flat.shape[1]
    g2 = g.reshape(B, M, C).astype(jnp.bfloat16)
    # chunk M so the (B, chunk, N) one-hot stays ~<=256 MB bf16
    chunk = max(128, min(M, (1 << 27) // max(B * N, 1)))
    while M % chunk:
        chunk -= 1

    def one(carry, args):
        idx_c, g_c = args
        cols = jax.lax.broadcasted_iota(jnp.int32, idx_c.shape + (N,), 2)
        oh = (cols == idx_c[..., None]).astype(jnp.bfloat16)
        return carry + jnp.einsum(
            "bmn,bmc->bnc", oh, g_c, preferred_element_type=jnp.float32
        ), None

    if chunk >= M:
        grad_p = one(jnp.zeros((B, N, C), jnp.float32), (flat, g2))[0]
    else:
        ic = jnp.moveaxis(flat.reshape(B, M // chunk, chunk), 1, 0)
        gc = jnp.moveaxis(g2.reshape(B, M // chunk, chunk, C), 1, 0)
        grad_p, _ = jax.lax.scan(
            one, jnp.zeros((B, N, C), jnp.float32), (ic, gc))
    # cotangent dtype must match the primal aval (custom_vjp contract)
    return grad_p.astype(pdtype), _np.zeros(idx.shape, jax.dtypes.float0)


_gather_mm_bwd.defvjp(_gather_mm_fwd_rule, _gather_mm_bwd_rule)
