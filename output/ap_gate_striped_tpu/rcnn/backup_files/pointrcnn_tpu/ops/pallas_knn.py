"""Fused 3-nearest-neighbor Pallas kernel for feature propagation.

The XLA formulation of three_nn materialises the (n, m) distance matrix in
HBM and traverses it three times for the min-extractions; this kernel
computes each distance block on the MXU and keeps it in VMEM across all
three extractions, so HBM traffic reduces to the coordinate reads and the
(n, 3) outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# interpret mode for CPU-side CI (tests monkeypatch this)
_INTERPRET = False

_CHUNK = 256  # unknown points per grid step


def _knn_kernel(u_ref, kt_ref, out_ref, d2_scratch):
    """u_ref: (1, _CHUNK, 3); kt_ref: (1, 3, m) (transposed knowns);
    out_ref: (1, _CHUNK, 8) packed [d0 d1 d2 i0 i1 i2 pad pad];
    d2_scratch: (_CHUNK, m) f32."""
    u = u_ref[0]  # (CHUNK, 3)
    kt = kt_ref[0]  # (3, m)
    m = kt.shape[1]

    # direct coordinate differences: the |u|^2+|k|^2-2uk matmul form loses
    # ~1e-2 m to f32 cancellation at scene-scale coordinates
    d2 = jnp.square(u[:, 0:1] - kt[0:1, :])
    d2 = d2 + jnp.square(u[:, 1:2] - kt[1:2, :])
    d2 = d2 + jnp.square(u[:, 2:3] - kt[2:3, :])
    d2_scratch[...] = d2

    col = jax.lax.broadcasted_iota(jnp.int32, (u.shape[0], m), 1)
    outs = []
    for _ in range(3):
        d2 = d2_scratch[...]
        mval = jnp.min(d2, axis=1, keepdims=True)  # (CHUNK, 1)
        idx = jnp.min(jnp.where(d2 == mval, col, 2**30), axis=1, keepdims=True)
        outs.append((jnp.sqrt(mval), idx))
        d2_scratch[...] = jnp.where(col == idx, jnp.float32(jnp.inf), d2)

    packed = jnp.concatenate(
        [outs[0][0], outs[1][0], outs[2][0]]
        + [o[1].astype(jnp.float32) for o in outs]
        + [jnp.zeros((u.shape[0], 2), jnp.float32)],
        axis=1,
    )
    out_ref[0] = packed


@functools.partial(jax.jit, static_argnames=())
def _three_nn_pallas(unknown: jnp.ndarray, known_t: jnp.ndarray):
    B, n, _ = unknown.shape
    m = known_t.shape[2]
    grid = (B, n // _CHUNK)
    packed = pl.pallas_call(
        _knn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _CHUNK, 3), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _CHUNK, 8), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_CHUNK, m), jnp.float32)],
        interpret=_INTERPRET,
    )(unknown, known_t)
    return packed[..., :3], packed[..., 3:6].astype(jnp.int32)


def three_nn_pallas_supported(n: int, m: int) -> bool:
    return (
        jax.default_backend() in ("tpu", "axon")
        and n % _CHUNK == 0
        and _CHUNK * m * 4 <= (1 << 23)  # distance block fits VMEM
    )


def three_nn_pallas(unknown: jnp.ndarray, known: jnp.ndarray):
    """(B, n, 3) x (B, m, 3) -> (dist (B, n, 3), idx (B, n, 3))."""
    unknown = unknown.astype(jnp.float32)
    known_t = jnp.transpose(known.astype(jnp.float32), (0, 2, 1))
    return _three_nn_pallas(unknown, known_t)
