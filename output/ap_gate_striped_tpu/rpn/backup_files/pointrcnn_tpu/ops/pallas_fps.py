"""Pallas furthest-point-sampling kernels.

FPS is inherently sequential (argmax iteration over a distance cache); the
XLA fori_loop version (ops.sampling) pays high per-step loop overhead, which
made sampling the hottest op in both stages.  This kernel runs the whole
loop on-core with everything resident in VMEM and — crucially — vectorises
the per-step work across the *batch* dimension (scene batch for the RPN,
rois for the RCNN), so one iteration costs a handful of (B, N) vector ops
regardless of B.

Same semantics as the CUDA ``furthest_point_sampling`` and ops.sampling:
first index 0, then greedy max-min-distance (ties -> lowest index).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# interpret mode for CPU-side CI (tests monkeypatch this)
_INTERPRET = False

# VMEM budget gate: 4 live (B, N) f32 planes (xs/ys/zs/dists) + slack
MAX_CELLS = 1 << 20
# per-grid-step (rows, N) working set for the plain kernel (~6 live f32
# planes of this size on the Mosaic stack + double-buffered input blocks)
_CHUNK_CELLS = 1 << 17


def _fps_kernel(xyz_ref, out_ref, dists, last):
    """xyz_ref: (3, B, N) VMEM; out_ref: (npoint, B) int32 VMEM;
    dists: (B, N) f32 scratch; last: (B, 128) int32 scratch (col 0 used)."""
    npoint = out_ref.shape[0]
    B, N = dists.shape

    xs = xyz_ref[0, :, :]
    ys = xyz_ref[1, :, :]
    zs = xyz_ref[2, :, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    dists[...] = jnp.full((B, N), 1e10, jnp.float32)
    last[...] = jnp.zeros((B, 128), jnp.int32)
    out_ref[0, :] = jnp.zeros((B,), jnp.int32)

    def body(i, _):
        lastcol = last[:, 0:1]  # (B, 1)
        mask = col == lastcol
        zero = jnp.float32(0.0)
        px = jnp.sum(jnp.where(mask, xs, zero), axis=1, keepdims=True)
        py = jnp.sum(jnp.where(mask, ys, zero), axis=1, keepdims=True)
        pz = jnp.sum(jnp.where(mask, zs, zero), axis=1, keepdims=True)
        d = jnp.square(xs - px) + jnp.square(ys - py) + jnp.square(zs - pz)
        new = jnp.minimum(dists[...], d)
        dists[...] = new
        m = jnp.max(new, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(new == m, col, 2**30), axis=1)  # (B,)
        out_ref[i, :] = nxt
        last[...] = jnp.broadcast_to(nxt[:, None], (B, 128))
        return 0

    jax.lax.fori_loop(1, npoint, body, 0)


def _fps_kernel_striped(s: int):
    """Variant for B < 8: each batch row is split into ``s`` stripes so the
    (R=B*s, N/s) planes use all 8 sublanes (a (4, 16384) layout leaves half
    the VPU idle).  Cross-stripe reductions (the pasted point's coordinates,
    the global max, the tie-break argmin) run as log2(s) butterfly exchanges
    on (R, 1) vectors — pure sublane rolls, bit-exact."""

    def kernel(xyz_ref, out_ref, dists, last):
        npoint = out_ref.shape[0]
        R, Ns = dists.shape

        xs = xyz_ref[0, :, :]
        ys = xyz_ref[1, :, :]
        zs = xyz_ref[2, :, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (R, Ns), 1)
        row_local = jax.lax.broadcasted_iota(jnp.int32, (R, Ns), 0) % s
        gcol = row_local * Ns + col  # original in-batch point index
        rowl1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % s

        def exchange(x, dist):
            # partner value within the batch's stripe group (no wrap across
            # batches: groups are aligned, pairs exchange symmetric rolls)
            sel = (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % (2 * dist)) < dist
            return jnp.where(sel, jnp.roll(x, -dist, axis=0), jnp.roll(x, dist, axis=0))

        def greduce(x, op):
            d = 1
            while d < s:
                x = op(x, exchange(x, d))
                d *= 2
            return x

        dists[...] = jnp.full((R, Ns), 1e10, jnp.float32)
        last[...] = jnp.zeros((R, 128), jnp.int32)
        out_ref[0, :] = jnp.zeros((R,), jnp.int32)

        def body(i, _):
            lastv = last[:, 0:1]  # (R, 1) in-batch index, replicated per stripe
            lrow = lastv // Ns
            lcol = lastv % Ns
            mask = (rowl1 == lrow) & (col == lcol)
            zero = jnp.float32(0.0)
            px = greduce(jnp.sum(jnp.where(mask, xs, zero), axis=1, keepdims=True), jnp.add)
            py = greduce(jnp.sum(jnp.where(mask, ys, zero), axis=1, keepdims=True), jnp.add)
            pz = greduce(jnp.sum(jnp.where(mask, zs, zero), axis=1, keepdims=True), jnp.add)
            d = jnp.square(xs - px) + jnp.square(ys - py) + jnp.square(zs - pz)
            new = jnp.minimum(dists[...], d)
            dists[...] = new
            m = greduce(jnp.max(new, axis=1, keepdims=True), jnp.maximum)
            cand = jnp.min(jnp.where(new == m, gcol, 2**30), axis=1, keepdims=True)
            c = greduce(cand, jnp.minimum)  # (R, 1) winner, replicated
            out_ref[i, :] = c[:, 0]
            last[...] = jnp.broadcast_to(c, (R, 128))
            return 0

        jax.lax.fori_loop(1, npoint, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32.  Requires B*N <= MAX_CELLS and
    N % 128 == 0."""
    B, N, _ = xyz.shape

    s = 1
    if B < 8 and 8 % B == 0:
        s = 8 // B
        while s > 1 and (N % (s * 128) != 0):
            s //= 2
    if s > 1:
        Ns = N // s
        xyz_t = jnp.transpose(
            xyz.astype(jnp.float32).reshape(B * s, Ns, 3), (2, 0, 1)
        )  # (3, R, Ns)
        R = B * s
        out = pl.pallas_call(
            _fps_kernel_striped(s),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((3, R, Ns), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((npoint, R), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((npoint, R), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((R, Ns), jnp.float32),
                pltpu.VMEM((R, 128), jnp.int32),
            ],
            interpret=_INTERPRET,
        )(xyz_t)
        # every stripe row of a batch carries the same answer; take the first
        return out.T.reshape(B, s, npoint)[:, 0, :]

    # chunk the batch across separate kernel launches: the greedy loop keeps
    # ~6 live (B, N) f32 temporaries on the Mosaic stack, so an
    # everything-resident launch runs out of VMEM past ~(8, 16384) cells
    # (observed at batch-16 eval).  Rows are independent; full-array blocks
    # per launch sidestep Mosaic's partial-block lane-divisibility rules.
    rows = min(B, max(1, _CHUNK_CELLS // N))
    while B % rows:
        rows -= 1

    def one_chunk(xyz_chunk):  # (rows, N, 3) -> (npoint, rows)
        xyz_t = jnp.transpose(xyz_chunk.astype(jnp.float32), (2, 0, 1))
        return pl.pallas_call(
            _fps_kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((3, rows, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((npoint, rows), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((npoint, rows), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((rows, N), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.int32),
            ],
            interpret=_INTERPRET,
        )(xyz_t)

    if rows == B:
        return one_chunk(xyz).T
    outs = [one_chunk(xyz[c : c + rows]) for c in range(0, B, rows)]
    return jnp.concatenate(outs, axis=1).T
