"""Fused neighborhood-gather + grouped-MLP + max Pallas kernel.

The per-group shared MLPs of PointNet++ (Dense+ReLU stacks over (B, S, K, C)
neighborhoods followed by a max over K) are gather-bound under XLA: the
neighborhood gather either materialises the (B, S, K, C) tensor in HBM
(one-hot matmul formulation, ~6 GB of traffic per RCNN batch) or serialises
through XLA's native gather (~24 ms for the RCNN stage's 3.3M rows).  This
kernel does neither: per centroid chunk it builds the one-hot selection
matrix *in VMEM*, gathers with ONE MXU matmul against the VMEM-resident
table, applies the MLP stack and the K-max in-core, and writes back only the
(B, S, Cout) maxima.

Two flop-saving table tricks:

- **Layer-1 commute (features)**: the feature half of layer 1 is linear and
  per-point, so it commutes with the gather — the table stores
  ``P = features @ w0_feat`` (f0 lanes) instead of raw features (C lanes).
  The gather matmul then costs f0 lanes instead of C, and layer 1's feature
  matmul disappears from the per-neighbor (rows = S*K) domain entirely.  No
  cancellation risk: P carries no positional term.
- **Geometry hi/lo split**: relative coordinates must be formed by
  *subtraction after the gather* (commuting them through bf16 would lose
  the (x - c) signal to cancellation at scene coordinates), so coordinates
  ride along as a bf16 hi/lo pair (x = hi + lo, reconstruction ~0.6 mm at
  70 m) in extra table lanes; the layer-1 xyz weight rows are duplicated so
  hi and lo recombine inside the in-kernel matmul: (hi - c)w + lo*w = (x-c)w.

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


def _make_kernel(n_layers: int, K: int, f0p: int, use_xyz: bool):
    def kernel(*refs):
        # refs: table, idx, [cent, w0x], w1.., b0.., out
        p = 0
        table_ref = refs[p]; p += 1
        idx_ref = refs[p]; p += 1
        if use_xyz:
            cent_ref = refs[p]; p += 1
            w0x_ref = refs[p]; p += 1
        ws = refs[p : p + n_layers - 1]; p += n_layers - 1
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

        # ONE matmul gathers the commuted layer-1 partials and hi/lo
        # geometry together
        g = jnp.dot(oh, table_ref[0], preferred_element_type=jnp.float32)

        x = g[:, :f0p]  # feature half of layer-1 pre-activation
        if use_xyz:
            geo = g[:, f0p:]  # (rows, _GEO): xyz-hi in 0:3, xyz-lo in 3:6
            rel = (geo.reshape(s_chunk, K, _GEO)
                   - cent_ref[0][:, None, :]).reshape(rows, _GEO)
            x = x + jnp.dot(rel.astype(jnp.bfloat16),
                            w0x_ref[...].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)

        x = jnp.maximum(x + bs[0][...].astype(jnp.float32), 0.0)
        for i in range(1, n_layers):
            x = jnp.dot(x.astype(jnp.bfloat16), ws[i - 1][...].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            x = jnp.maximum(x + bs[i][...].astype(jnp.float32), 0.0)

        cout = x.shape[-1]
        out_ref[0] = jnp.max(x.reshape(s_chunk, K, cout), axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("use_xyz", "f0p"))
def _fused_group(table, idx, cent, w0x, ws, bs, use_xyz, f0p):
    B, N, CT = table.shape
    S, K = idx.shape[1], idx.shape[2]
    n_layers = 1 + len(ws)
    cout = bs[-1].shape[1]
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
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(w)
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(b)

    return pl.pallas_call(
        _make_kernel(n_layers, K, f0p, use_xyz),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, chunk_s, cout), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, cout), jnp.float32),
    )(*operands)


# one-hot cells (rows x N) per grid step the VMEM budget tolerates (bf16
# one-hot + f32 gather result + activations; all production SA shapes are
# <= 2M cells, the header calibration point)
_MAX_OH_CELLS = 1 << 22


def fused_group_mlp_max_supported(features, idx,
                                  compute_dtype=jnp.bfloat16) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if features is None:
        return False
    if compute_dtype != jnp.bfloat16:
        # the kernel's gather matmul and MLP stack are bf16 by construction;
        # full-f32 configs (COMPUTE_DTYPE: float32) must keep the XLA path,
        # which honors the requested dtype end to end
        return False
    B, N, C = features.shape
    S, K = idx.shape[1], idx.shape[2]
    chunk = _pick_chunk(S, K)
    return N <= _MAX_N and chunk >= 8 and chunk * K * N <= _MAX_OH_CELLS


def _ceil128(x: int) -> int:
    return (x + 127) // 128 * 128


def fused_group_mlp_max(xyz, features, new_xyz, idx, weights, biases,
                        use_xyz: bool = True):
    """Fused ``group_points`` + MLP stack + max-over-K.

    :param xyz: (B, N, 3) f32; features: (B, N, C); new_xyz: (B, S, 3)
    :param idx: (B, S, K) int32 neighborhood indices
    :param weights: list of (Ci, Ci+1); biases: list of (Ci+1,) — BN folded.
        ``weights[0]`` has Cin = 3 + C when ``use_xyz`` else C.
    :return: (B, S, Cout) f32

    Differentiable with a caveat: the backward pass recomputes through the
    *XLA* formulation (bf16 group_points + fused_mlp_max) while the forward
    kernel uses a commuted layer-1 P table — numerically equivalent in f32
    but not bit-identical in bf16, so live gradients are of a slightly
    different function than the forward values (mismatch on the order of
    bf16 rounding).  That is exact where cotangents are zero — the intended
    use, the FIXED RPN under ``stop_gradient`` inside the rcnn-stage train
    step, where XLA dead-code-eliminates the bwd.  Training a module through
    this op should prefer the XLA path (see ``fused_path_supported`` gates).
    """
    return _fused_group_mlp_max_diff(
        use_xyz, xyz, features, new_xyz, idx.astype(jnp.int32),
        tuple(weights), tuple(biases),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_group_mlp_max_diff(use_xyz, xyz, features, new_xyz, idx, weights,
                              biases):
    return _fused_group_mlp_max_impl(
        use_xyz, xyz, features, new_xyz, idx, weights, biases
    )


def _fused_group_mlp_max_fwd(use_xyz, xyz, features, new_xyz, idx, weights,
                             biases):
    out = _fused_group_mlp_max_impl(
        use_xyz, xyz, features, new_xyz, idx, weights, biases
    )
    return out, (xyz, features, new_xyz, idx, weights, biases)


def _fused_group_mlp_max_bwd(use_xyz, res, ct):
    xyz, features, new_xyz, idx, weights, biases = res
    from pointrcnn_tpu.ops.grouping import group_points

    def reference(xyz, features, new_xyz, weights, biases):
        g = group_points(xyz, features, new_xyz, idx, use_xyz,
                         out_dtype=jnp.bfloat16)
        return fused_mlp_max(g, list(weights), list(biases))

    _, vjp = jax.vjp(reference, xyz, features, new_xyz, weights, biases)
    gx, gf, gn, gw, gb = vjp(ct)
    import numpy as _np

    gidx = _np.zeros(idx.shape, jax.dtypes.float0)
    return gx, gf, gn, gidx, gw, gb


_fused_group_mlp_max_diff.defvjp(_fused_group_mlp_max_fwd, _fused_group_mlp_max_bwd)


def _fused_group_mlp_max_impl(use_xyz, xyz, features, new_xyz, idx, weights,
                              biases):
    B, N, C = features.shape
    S = idx.shape[1]
    w0 = weights[0]
    f0 = w0.shape[1]
    f0p = _ceil128(f0)

    def pad_lanes(a, width, axis):
        pads = [(0, 0)] * a.ndim
        pads[axis] = (0, width - a.shape[axis])
        return jnp.pad(a, pads) if width != a.shape[axis] else a

    if use_xyz:
        w0x3, w0f = w0[:3], w0[3:]
    else:
        w0f = w0
    # layer-1 commute: P = features @ w0_feat rides in the table instead of
    # raw features (bf16 inputs feed the MXU, matching the kernel's own
    # compute dtype)
    P = jnp.dot(features.astype(jnp.bfloat16), w0f.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    if use_xyz:
        # hi/lo split so geometry survives the bf16 gather exactly; ONE
        # concatenate builds the whole table (pad + .at[].set would cost
        # two extra full-tensor HBM rewrites at ~26 MB each)
        xhi = xyz.astype(jnp.bfloat16)
        xlo = (xyz - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        zero_pf = jnp.zeros((B, N, f0p - f0), jnp.bfloat16)
        zero_geo = jnp.zeros((B, N, _GEO - 6), jnp.bfloat16)
        table = jnp.concatenate([P, zero_pf, xhi, xlo, zero_geo], axis=-1)
        cent = jnp.concatenate(
            [new_xyz.astype(jnp.float32),
             jnp.zeros((B, S, _GEO - 3), jnp.float32)], axis=-1)
        # duplicate xyz weight rows: (hi - c) w + lo w == (xyz - c) w
        w0x = jnp.zeros((_GEO, f0p), jnp.float32)
        w0x = w0x.at[0:3, :f0].set(w0x3).at[3:6, :f0].set(w0x3)
    else:
        table, cent, w0x = pad_lanes(P, f0p, 2), None, None
    # padded layer-1 lanes carry zero P, zero bias and zero w1 rows, so they
    # stay zero through the ReLU and contribute nothing downstream
    ws = [pad_lanes(weights[1].astype(jnp.float32), f0p, 0)] if len(weights) > 1 else []
    ws += [w.astype(jnp.float32) for w in weights[2:]]
    bs = [pad_lanes(biases[0].reshape(1, -1).astype(jnp.float32), f0p, 1)]
    bs += [b.reshape(1, -1).astype(jnp.float32) for b in biases[1:]]
    out = _fused_group(
        table, idx.astype(jnp.int32), cent, w0x, tuple(ws), tuple(bs),
        use_xyz, f0p,
    )
    # single-layer stacks max over the padded layer-1 lanes; trim them
    return out[..., :f0] if len(weights) == 1 else out


def fused_mlp_max(grouped, weights, biases, compute_dtype=jnp.bfloat16):
    """(B, S, K, Cin) -> (B, S, Cout): per-point MLP stack + max over K, on an
    already-materialised neighborhood tensor (XLA; the fusion win lives in
    :func:`fused_group_mlp_max`, which skips this materialisation entirely)."""
    x = grouped.astype(compute_dtype)
    for w, b in zip(weights, biases):
        x = jnp.dot(x, w.astype(compute_dtype), preferred_element_type=jnp.float32)
        x = jnp.maximum(x + b.astype(jnp.float32), 0.0).astype(compute_dtype)
    return jnp.max(x.astype(jnp.float32), axis=2)
