"""Pallas row-gather kernel.

XLA's gather lowering on TPU serialises to ~0.4 us/element, which makes the
PointNet++ grouping/interpolation gathers (up to 8x the table size per SA
stage) the dominant cost of the whole network.  The point tables are small
(N x C <= a few MB), so this kernel pins the whole per-batch table in VMEM
and streams output rows with dynamic VMEM reads — orders of magnitude faster
than the XLA gather for this shape regime.

Falls back to ``jnp.take_along_axis`` on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows of output produced per grid step
_BLK = 512


def _gather_kernel(idx_ref, table_ref, out_ref):
    """idx_ref: (1, 1, _BLK) int32 SMEM block; table_ref: (1, N, C) VMEM
    (current batch); out_ref: (1, _BLK, C) VMEM block."""

    def body(j, _):
        k = idx_ref[0, 0, j]
        out_ref[0, j, :] = table_ref[0, k, :]
        return 0

    jax.lax.fori_loop(0, _BLK, body, 0)


@functools.partial(jax.jit, static_argnames=())
def _gather_padded(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    B, N, C = points.shape
    m = idx.shape[1]
    idx = idx.reshape(B, 1, m)
    grid = (B, m // _BLK)
    return pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, _BLK), lambda b, i: (b, 0, i), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _BLK, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, m, C), points.dtype),
    )(idx, points)


def gather_rows(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather: points (B, N, C), idx (B, ...) -> (B, ..., C).

    TPU: Pallas VMEM-resident kernel; other backends: take_along_axis.
    """
    if jax.default_backend() not in ("tpu", "axon"):
        flat = idx.reshape(idx.shape[0], -1)
        out = jnp.take_along_axis(points, flat[..., None], axis=1)
        return out.reshape(idx.shape + (points.shape[-1],))

    B, N, C = points.shape
    flat = idx.reshape(B, -1).astype(jnp.int32)
    m = flat.shape[1]
    pad_m = (-m) % _BLK
    if pad_m:
        flat = jnp.pad(flat, ((0, 0), (0, pad_m)))
    out = _gather_padded(points, flat)
    if pad_m:
        out = out[:, :m]
    return out.reshape(idx.shape + (C,))
