"""Fused neighborhood-gather + grouped-MLP + max Pallas kernel.

The per-group shared MLPs of PointNet++ (Dense+ReLU stacks over (B, S, K, C)
neighborhoods followed by a max over K) are gather-bound under XLA: the
neighborhood gather either materialises the (B, S, K, C) tensor in HBM
(one-hot matmul formulation, ~6 GB of traffic per RCNN batch) or serialises
through XLA's native gather (~24 ms for the RCNN stage's 3.3M rows).  This
kernel does neither: per centroid chunk it builds the one-hot selection
matrix *in VMEM*, gathers features and geometry with ONE MXU matmul against
the VMEM-resident point table, applies the whole MLP stack and the K-max
in-core, and writes back only the (B, S, Cout) maxima.

Geometry precision: a bf16 gather of absolute coordinates would round ~70 m
scene positions to ~0.3 m, so coordinates ride along as a bf16 hi/lo split
(x = hi + lo with hi = bf16(x), lo = bf16(x - hi), reconstruction error
~0.6 mm at 70 m) packed into extra table lanes; the first-layer weight rows
for xyz are duplicated so hi and lo recombine inside the layer-1 matmul:
(hi - c)·w + lo·w = (x - c)·w.

Used by models.layers.SharedMLP on the eval path (BatchNorm folded into the
weights); training keeps the XLA formulation (batch statistics need the full
pre-activation tensor).  Reference semantics: QueryAndGroup + SharedMLP +
max_pool2d (Pointnet2.PyTorch, consumed at rcnn_net.py:28-42).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# max centroids per grid step (tuned on v5e; VMEM at chunk 128, K=64, N=512:
# one-hot bf16 8 MB + gathered f32 8 MB fits with double-buffered blocks off)
_CHUNK_S_MAX = 64
# cap on one-hot rows per step (VMEM guard)
_MAX_ROWS = 8192
# largest point table the kernel pins in VMEM / widest affordable one-hot
_MAX_N = 2048
# geometry block width (xyz hi/lo occupy 6 lanes; 128 keeps slices aligned)
_GEO = 128


def _pick_chunk(S: int, K: int) -> int:
    chunk = min(_CHUNK_S_MAX, S, max(1, _MAX_ROWS // K))
    while S % chunk:
        chunk -= 1
    return chunk


def _make_kernel(n_layers: int, K: int, C: int, use_xyz: bool):
    def kernel(*refs):
        # refs: table, idx, [cent, w0x], w0f, w1.., b0.., out
        p = 0
        table_ref = refs[p]; p += 1
        idx_ref = refs[p]; p += 1
        if use_xyz:
            cent_ref = refs[p]; p += 1
            w0x_ref = refs[p]; p += 1
        ws = refs[p : p + n_layers]; p += n_layers
        bs = refs[p : p + n_layers]; p += n_layers
        out_ref = refs[p]

        n = table_ref.shape[1]
        s_chunk = idx_ref.shape[1]
        rows = s_chunk * K

        # one-hot built in (S, K, N) layout: reshaping (S, K) -> (S*K, 1)
        # would cross the lane dim, which Mosaic cannot shape-cast
        idx3 = idx_ref[0][:, :, None]  # (s_chunk, K, 1) int32
        cols3 = jax.lax.broadcasted_iota(jnp.int32, (s_chunk, K, n), 2)
        oh = (cols3 == idx3).astype(jnp.bfloat16).reshape(rows, n)

        # ONE matmul gathers features and hi/lo geometry together
        g = jnp.dot(oh, table_ref[0], preferred_element_type=jnp.float32)

        x = jnp.dot(g[:, :C].astype(jnp.bfloat16), ws[0][...].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if use_xyz:
            geo = g[:, C:]  # (rows, _GEO): xyz-hi in 0:3, xyz-lo in 3:6
            rel = (geo.reshape(s_chunk, K, _GEO)
                   - cent_ref[0][:, None, :]).reshape(rows, _GEO)
            x = x + jnp.dot(rel.astype(jnp.bfloat16),
                            w0x_ref[...].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)

        x = jnp.maximum(x + bs[0][...].astype(jnp.float32), 0.0)
        for i in range(1, n_layers):
            x = jnp.dot(x.astype(jnp.bfloat16), ws[i][...].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            x = jnp.maximum(x + bs[i][...].astype(jnp.float32), 0.0)

        cout = x.shape[-1]
        out_ref[0] = jnp.max(x.reshape(s_chunk, K, cout), axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("use_xyz", "C"))
def _fused_group(table, idx, cent, w0x, w0f, ws, bs, use_xyz, C):
    B, N, CT = table.shape
    S, K = idx.shape[1], idx.shape[2]
    n_layers = 1 + len(ws)
    cout = (ws[-1] if ws else w0f).shape[1]
    chunk_s = _pick_chunk(S, K)
    grid = (B, S // chunk_s)

    fixed = lambda b, s: (0, 0)
    in_specs = [
        pl.BlockSpec((1, N, CT), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk_s, K), lambda b, s: (b, s, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [table, idx]
    if use_xyz:
        in_specs.append(pl.BlockSpec((1, chunk_s, _GEO), lambda b, s: (b, s, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(cent)
        in_specs.append(pl.BlockSpec(w0x.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(w0x)
    in_specs.append(pl.BlockSpec(w0f.shape, fixed, memory_space=pltpu.VMEM))
    operands.append(w0f)
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(w)
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(b)

    return pl.pallas_call(
        _make_kernel(n_layers, K, C, use_xyz),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, chunk_s, cout), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, cout), jnp.float32),
    )(*operands)


def fused_group_mlp_max_supported(features, idx) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if features is None:
        return False
    B, N, C = features.shape
    S, K = idx.shape[1], idx.shape[2]
    return N <= _MAX_N and C % 128 == 0 and _pick_chunk(S, K) >= 8


def fused_group_mlp_max(xyz, features, new_xyz, idx, weights, biases,
                        use_xyz: bool = True):
    """Fused ``group_points`` + MLP stack + max-over-K.

    :param xyz: (B, N, 3) f32; features: (B, N, C); new_xyz: (B, S, 3)
    :param idx: (B, S, K) int32 neighborhood indices
    :param weights: list of (Ci, Ci+1); biases: list of (Ci+1,) — BN folded.
        ``weights[0]`` has Cin = 3 + C when ``use_xyz`` else C.
    :return: (B, S, Cout) f32
    """
    B, N, C = features.shape
    S = idx.shape[1]
    w0 = weights[0]
    feat_b = features.astype(jnp.bfloat16)
    if use_xyz:
        w0x3, w0f = w0[:3], w0[3:]
        f0 = w0.shape[1]
        # hi/lo split so geometry survives the bf16 gather exactly
        xhi = xyz.astype(jnp.bfloat16)
        xlo = (xyz - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        geo = jnp.zeros((B, N, _GEO), jnp.bfloat16)
        geo = geo.at[..., 0:3].set(xhi).at[..., 3:6].set(xlo)
        table = jnp.concatenate([feat_b, geo], axis=-1)
        cent = jnp.zeros((B, S, _GEO), jnp.float32).at[..., 0:3].set(new_xyz)
        # duplicate xyz weight rows: (hi - c) w + lo w == (xyz - c) w
        w0x = jnp.zeros((_GEO, f0), jnp.float32)
        w0x = w0x.at[0:3].set(w0x3).at[3:6].set(w0x3)
    else:
        table, cent, w0x, w0f = feat_b, None, None, w0
    ws = [w.astype(jnp.float32) for w in weights[1:]]
    bs = [b.reshape(1, -1).astype(jnp.float32) for b in biases]
    return _fused_group(
        table, idx.astype(jnp.int32), cent,
        w0x, w0f.astype(jnp.float32), tuple(ws), tuple(bs), use_xyz, C,
    )


def fused_mlp_max(grouped, weights, biases, compute_dtype=jnp.bfloat16):
    """(B, S, K, Cin) -> (B, S, Cout): per-point MLP stack + max over K, on an
    already-materialised neighborhood tensor (XLA; the fusion win lives in
    :func:`fused_group_mlp_max`, which skips this materialisation entirely)."""
    x = grouped.astype(compute_dtype)
    for w, b in zip(weights, biases):
        x = jnp.dot(x, w.astype(compute_dtype), preferred_element_type=jnp.float32)
        x = jnp.maximum(x + b.astype(jnp.float32), 0.0).astype(compute_dtype)
    return jnp.max(x.astype(jnp.float32), axis=2)
