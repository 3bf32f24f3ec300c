"""Fused neighborhood-gather Pallas kernel (one-hot built in VMEM, MXU
matmul gather) for the BN-train SA stages.

The reference trains its SA stages by materialising (B, S, K, 3+C)
neighborhoods with a CUDA ``group_points`` scatter/gather
(Pointnet2.PyTorch src/group_points_gpu.cu) and backpropagating with a
serialized ``atomicAdd`` scatter.  The TPU story before this kernel:

- forward: ``jnp.take_along_axis`` lowers to a serialized row gather
  (~20 ns/row — 786k rows at the SA2 train shape = ~12 ms/step), or, for
  small tables, a one-hot einsum whose (B, M, N) one-hot operand round-trips
  HBM;
- backward: the transposed one-hot einsum (ops.common._gather_mm_bwd) also
  streams those one-hot tiles from HBM — ~6.4 GB of traffic per SA2 step.

Here the one-hot never exists outside VMEM: per (batch row, centroid chunk)
grid step the kernel rebuilds the (rows, N) one-hot from the int32 index
block with an iota compare and feeds it straight to the MXU —

- forward: ``g = onehot @ table`` where the table packs hi/lo-split bf16
  coordinates with the bf16 features ``[xhi, xlo, feats]``; the kernel then
  emits QueryAndGroup semantics directly: ``[(hi + lo) - centroid, feats]``
  (relative coordinates are exact to ~|xyz| * 2^-16 ≈ 0.6 mm, then round to
  bf16 exactly like the XLA path's final cast);
- backward: ``dtable += onehot^T @ ct`` accumulated across centroid chunks
  in a revisited f32 VMEM block (the MXU replaces the scatter-add), plus the
  per-centroid ``-sum_K drel`` block.  The hi and lo lanes receive identical
  cotangents, and the lo cast carries zero derivative, so dxyz is the rel
  cotangent scattered once.

Used by ops.grouping.group_points on TPU for 256 <= N <= 4096 feature
tables (RPN SA2-SA4 under BN training; the BN-free RCNN stack and the eval
path use the fully fused gather+MLP+max kernel in ops.pallas_mlp instead).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# interpret mode for CPU-side CI (tests monkeypatch this)
_INTERPRET = False

# VMEM working-set budget per grid step, in bytes (one-hot + gathered f32
# block + output block + the pinned table); leaves headroom for Mosaic's
# double buffering in ~16 MB of VMEM
_VMEM_BUDGET = 12 << 20


def _ceil128(x: int) -> int:
    return (x + 127) // 128 * 128


def _pick_chunk(S: int, K: int, N: int, CT: int, Cout: int,
                extra_row_bytes: int) -> int:
    """Largest centroid chunk whose per-step buffers fit the VMEM budget."""
    table_bytes = N * CT * 2
    row_bytes = N * 2 + _ceil128(CT) * 4 + _ceil128(Cout) * 2 + extra_row_bytes
    chunk = max(1, min(S, (_VMEM_BUDGET - table_bytes) // max(K * row_bytes, 1)))
    while S % chunk:
        chunk -= 1
    return chunk


def _make_fwd_kernel(K: int, C: int):
    def kernel(table_ref, idx_ref, cent_ref, out_ref):
        """table: (1, N, CT) bf16 [xhi(3) | xlo(3) | feats(C)];
        idx: (1, chunk, K) int32; cent: (1, chunk, 3) f32;
        out: (1, chunk*K, 3+C) bf16 [rel(3) | feats(C)]."""
        n = table_ref.shape[1]
        chunk = idx_ref.shape[1]
        rows = chunk * K

        # one-hot built in (chunk, K, N) layout: reshaping (chunk, K) ->
        # (rows, 1) would cross the lane dim, which Mosaic cannot shape-cast
        idx3 = idx_ref[0][:, :, None]
        cols3 = jax.lax.broadcasted_iota(jnp.int32, (chunk, K, n), 2)
        oh = (cols3 == idx3).astype(jnp.bfloat16).reshape(rows, n)

        g = jnp.dot(oh, table_ref[0], preferred_element_type=jnp.float32)

        rel = (g[:, 0:3] + g[:, 3:6]).reshape(chunk, K, 3) \
            - cent_ref[0][:, None, :]
        out_ref[0] = jnp.concatenate(
            [rel.reshape(rows, 3).astype(jnp.bfloat16),
             g[:, 6:6 + C].astype(jnp.bfloat16)], axis=-1)

    return kernel


def _make_bwd_kernel(K: int, Cout: int):
    def kernel(idx_ref, ct_ref, dtable_ref, dcent_ref):
        """idx: (1, chunk, K) int32; ct: (1, chunk*K, Cout) bf16;
        dtable: (1, N, Cout) f32 [drel->dxyz(3) | dfeats(C)], accumulated
        over the centroid chunks of one batch row; dcent: (1, chunk, 3)."""
        n = dtable_ref.shape[1]
        chunk = idx_ref.shape[1]
        rows = chunk * K

        @pl.when(pl.program_id(1) == 0)
        def _zero_dtable():
            dtable_ref[...] = jnp.zeros(dtable_ref.shape, dtable_ref.dtype)

        idx3 = idx_ref[0][:, :, None]
        cols3 = jax.lax.broadcasted_iota(jnp.int32, (chunk, K, n), 2)
        oh = (cols3 == idx3).astype(jnp.bfloat16).reshape(rows, n)

        ct = ct_ref[0]
        # transposed gather on the MXU (replaces XLA's serialized
        # scatter-add VJP); bf16 cotangents match the op's bf16 output
        dtable_ref[0] += jax.lax.dot_general(
            oh, ct, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dcent_ref[0] = -jnp.sum(
            ct[:, 0:3].astype(jnp.float32).reshape(chunk, K, 3), axis=1)

    return kernel


def _fwd_pallas(table, idx, cent, C: int):
    B, N, CT = table.shape
    S, K = idx.shape[1], idx.shape[2]
    Cout = 3 + C
    chunk = _pick_chunk(S, K, N, CT, Cout, 0)
    grid = (B, S // chunk)
    return pl.pallas_call(
        _make_fwd_kernel(K, C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, CT), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, K), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 3), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk * K, Cout), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S * K, Cout), jnp.bfloat16),
        interpret=_INTERPRET,
    )(table, idx, cent).reshape(B, S, K, Cout)


def _bwd_pallas_call(idx, ct, N: int):
    """ct: (B, S, K, Cout) -> (dtable (B, N, Cout) f32, dcent (B, S, 3))."""
    B, S, K, Cout = ct.shape
    # per-step buffers: one-hot (rows, N) bf16 + ct block (rows, Cout) bf16,
    # against the pinned (N, Cout) f32 dtable block
    pinned = N * _ceil128(Cout) * 4
    row_bytes = N * 2 + _ceil128(Cout) * 2
    chunk = max(1, min(S, (_VMEM_BUDGET - pinned) // max(K * row_bytes, 1)))
    while S % chunk:
        chunk -= 1
    grid = (B, S // chunk)
    dtable, dcent = pl.pallas_call(
        _make_bwd_kernel(K, Cout),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, K), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk * K, Cout), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, N, Cout), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 3), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, Cout), jnp.float32),
            jax.ShapeDtypeStruct((B, S, 3), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(idx, ct.reshape(B, S * K, Cout))
    return dtable, dcent


def group_points_pallas_supported(features, idx) -> bool:
    import os

    if os.environ.get("POINTRCNN_DISABLE_PALLAS_GATHER"):
        # A/B hook: falls back to the XLA gather + matmul-VJP path so the
        # kernel's train-step win stays attributable (tools/bench_train.py)
        return False
    if not _INTERPRET and jax.default_backend() not in ("tpu", "axon"):
        return False
    if features is None:
        return False
    B, N, C = features.shape
    S, K = idx.shape[1], idx.shape[2]
    CT = _ceil128(6 + C)
    chunk = _pick_chunk(S, K, N, CT, 3 + C, 0)
    return 256 <= N <= 4096 and chunk >= 8 and C >= 1


@jax.custom_vjp
def group_points_pallas(xyz, features, new_xyz, idx):
    """QueryAndGroup on the MXU: (B, S, K, 3+C) bf16 ``[xyz[idx] - new_xyz,
    features[idx]]``.  Drop-in for the grouped-neighborhood materialisation
    of ops.grouping.group_points (use_xyz=True) where supported."""
    return _group_fwd(xyz, features, new_xyz, idx)[0]


def _pack_table(xyz, features):
    from pointrcnn_tpu.ops.common import split_hilo

    B, N, C = features.shape
    # bitmask split — the naive convert round-trip gets folded to lo == 0
    # by XLA's excess-precision pass on TPU (see split_hilo)
    xhi, xlo = split_hilo(xyz)
    CT = _ceil128(6 + C)
    parts = [xhi, xlo, features.astype(jnp.bfloat16)]
    if CT > 6 + C:
        parts.append(jnp.zeros((B, N, CT - 6 - C), jnp.bfloat16))
    return jnp.concatenate(parts, axis=-1)


def _group_fwd(xyz, features, new_xyz, idx):
    C = features.shape[-1]
    table = _pack_table(xyz, features)
    out = _fwd_pallas(table, idx.astype(jnp.int32), new_xyz.astype(jnp.float32), C)
    # zero-size proxies carry the primal dtypes through the residuals
    # (dtype objects are not pytree leaves)
    return out, (idx, xyz.shape[1],
                 (jnp.zeros((0,), xyz.dtype), jnp.zeros((0,), features.dtype),
                  jnp.zeros((0,), new_xyz.dtype)))


def _group_bwd(res, ct):
    idx, N, proxies = res
    xyz_dt, feat_dt, cent_dt = (p.dtype for p in proxies)
    dtable, dcent = _bwd_pallas_call(
        idx.astype(jnp.int32), ct.astype(jnp.bfloat16), N)
    # hi/lo lanes carry identical rel cotangents; the lo cast has zero
    # derivative, so dxyz is the rel cotangent scattered once
    dxyz = dtable[..., 0:3]
    dfeatures = dtable[..., 3:]
    # cotangent dtypes must match the primal avals (custom_vjp contract) —
    # the kernel accumulates f32, so cast back to whatever came in
    return (dxyz.astype(xyz_dt), dfeatures.astype(feat_dt),
            dcent.astype(cent_dt),
            np.zeros(idx.shape, jax.dtypes.float0))


group_points_pallas.defvjp(_group_fwd, _group_bwd)
