"""Pallas furthest-point-sampling kernel.

FPS is inherently sequential (argmax iteration over a distance cache);
the XLA fori_loop version (ops.sampling) pays ~20 us of loop overhead per
step, which makes stage-1 sampling (16384 -> 4096) the single hottest op in
the RPN.  This kernel runs the whole loop on-core with the distance cache
held in VMEM as an (8, N/8) tile (so each update is ~N/1024 vector registers
wide) and the selected indices accumulated in SMEM.

Same semantics as the CUDA ``furthest_point_sampling`` and ops.sampling:
first index 0, then greedy max-min-distance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8  # sublane tiling of the distance cache


def _fps_kernel(xyz_tiled_ref, xyz_rows_ref, out_ref, dists):
    """xyz_tiled_ref: (1, 3*_SUB, N/_SUB) VMEM — coordinate c, sublane s holds
    points [ (c*_SUB+s) stripe ]; xyz_rows_ref: (1, N, 3) VMEM for dynamic
    row reads; out_ref: (1, 1, npoint) int32 SMEM; dists: (_SUB, N/_SUB) VMEM.
    """
    npoint = out_ref.shape[2]
    cols = dists.shape[1]

    xs = xyz_tiled_ref[0, 0:_SUB, :]
    ys = xyz_tiled_ref[0, _SUB : 2 * _SUB, :]
    zs = xyz_tiled_ref[0, 2 * _SUB : 3 * _SUB, :]

    dists[...] = jnp.full((_SUB, cols), 1e10, jnp.float32)
    out_ref[0, 0, 0] = 0

    # flat C-order point index of each (sublane, lane) cell
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUB, cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUB, cols), 1)
    flat_ids = row_ids * cols + col_ids

    def body(i, last):
        px = xyz_rows_ref[0, last, 0]
        py = xyz_rows_ref[0, last, 1]
        pz = xyz_rows_ref[0, last, 2]
        d = (
            jnp.square(xs - px)
            + jnp.square(ys - py)
            + jnp.square(zs - pz)
        )
        new = jnp.minimum(dists[...], d)
        dists[...] = new
        # argmax without relayout: global max, then min flat id attaining it
        gmax = jnp.max(new)
        nxt = jnp.min(jnp.where(new == gmax, flat_ids, jnp.int32(2**30)))
        out_ref[0, 0, i] = nxt
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32; N must be a multiple of 8*128."""
    B, N, _ = xyz.shape
    cols = N // _SUB
    xyz = xyz.astype(jnp.float32)
    # (B, 3, _SUB, cols) in C order: stripe s of coordinate c covers points
    # [s*cols, (s+1)*cols), matching flat argmax index recovery
    xyz_tiled = jnp.transpose(xyz, (0, 2, 1)).reshape(B, 3 * _SUB, cols)

    return pl.pallas_call(
        _fps_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3 * _SUB, cols), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_SUB, cols), jnp.float32)],
    )(xyz_tiled, xyz)[:, 0, :]
