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

# VMEM budget gate: 4 live (B, N) f32 planes (xs/ys/zs/dists) + slack
MAX_CELLS = 1 << 20


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


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """(B, N, 3) -> (B, npoint) int32.  Requires B*N <= MAX_CELLS and
    N % 128 == 0."""
    B, N, _ = xyz.shape
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # (3, B, N)

    out = pl.pallas_call(
        _fps_kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((3, B, N), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((npoint, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npoint, B), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, N), jnp.float32),
            pltpu.VMEM((B, 128), jnp.int32),
        ],
    )(xyz_t)
    return out.T
