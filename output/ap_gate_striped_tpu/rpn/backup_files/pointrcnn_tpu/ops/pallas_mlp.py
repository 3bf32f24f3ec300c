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
- **Geometry hi/lo split** (mode ``"hilo"``): relative coordinates must be
  formed by *subtraction after the gather* (commuting them through bf16
  would lose the (x - c) signal to cancellation at scene coordinates), so
  coordinates ride along as a bf16 hi/lo pair (x = hi + lo, reconstruction
  ~0.6 mm at 70 m) in extra table lanes; the layer-1 xyz weight rows are
  duplicated so hi and lo recombine inside the in-kernel matmul:
  (hi - c)w + lo*w = (x-c)w.
- **Geometry fold** (mode ``"fold"``, opt-in via ``fold_geometry=True``):
  for canonical-frame inputs (the RCNN SA stages, |xyz| bounded by the
  enlarged-roi extent ~5 m) the geometry commutes through the gather too —
  the table stores ``bf16(features @ w0_feat + xyz @ w0_xyz)`` and the
  kernel subtracts the per-centroid term ``c @ w0_xyz`` (f32, computed
  outside) after the gather: (x-c)w == xw - cw.  This removes the _GEO
  lanes entirely, HALVING the dominant gather-matmul (CT 256 -> 128 at the
  RCNN SA1 shape).  Cost: the bf16 table rounding now covers the combined
  pre-activation, adding geometry noise of at most 2^-9 * max|xyz| * |w|
  (~1 cm equivalent coordinate noise in the canonical frame) vs hilo's
  2^-9 * radius.  NOT safe at scene-frame coordinate magnitudes (the RPN
  SA stages, |x| ~ 70 m) — callers gate it to canonical-frame stages.

Used by models.layers.SharedMLP on the eval path (BatchNorm folded into the
weights) and, for BN-free stacks (the RCNN SA stack), on the training path
too: a matching Pallas *backward* kernel (bottom of this file) recomputes the
gather+MLP in VMEM and backprops in-core, so neither direction materialises
the (B, S, K, C) neighborhoods in HBM.  BN'd stacks under training keep the
XLA formulation (batch statistics need the full pre-activation tensor).
Reference semantics: QueryAndGroup + SharedMLP + max_pool2d
(Pointnet2.PyTorch, consumed at rcnn_net.py:28-42).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# interpret mode for CPU-side CI of the kernels (tests monkeypatch this;
# every pallas_call below threads it)
_INTERPRET = False

# max centroids per grid step (tuned on v5e; VMEM at chunk 128, K=64, N=512:
# one-hot bf16 8 MB + gathered f32 8 MB fits with double-buffered blocks off)
# env overrides are the autotune hook (tools/tune_fused_mlp.py)
_CHUNK_S_MAX = int(os.environ.get("POINTRCNN_MLP_CHUNK_S", 64))
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


def _make_kernel(n_layers: int, K: int, f0p: int, mode: str, bb: int = 1):
    use_xyz = mode == "hilo"
    fold = mode == "fold"

    def kernel(*refs):
        # refs: table, idx, [cent, w0x | cent], w1.., b0.., out
        p = 0
        table_ref = refs[p]; p += 1
        idx_ref = refs[p]; p += 1
        cent_ref = w0x_ref = None
        if use_xyz:
            cent_ref = refs[p]; p += 1
            w0x_ref = refs[p]; p += 1
        elif fold:
            cent_ref = refs[p]; p += 1  # per-centroid c @ w0_xyz term (f0p lanes)
        ws = refs[p : p + n_layers - 1]; p += n_layers - 1
        bs = refs[p : p + n_layers]; p += n_layers
        out_ref = refs[p]

        n = table_ref.shape[1]
        s_chunk = idx_ref.shape[1]
        rows = s_chunk * K

        # bb batch rows per grid step: the per-step fixed cost (pipeline
        # fill, block semaphores, epilogue) dominates small-shape steps —
        # measured +14% at the RCNN SA1 shape, reaching the same MXU
        # utilization as a dense fat matmul (tools/probe_fused_gap.py)
        for i in range(bb):
            # one-hot built in (S, K, N) layout: reshaping (S, K) -> (S*K, 1)
            # would cross the lane dim, which Mosaic cannot shape-cast
            idx3 = idx_ref[i][:, :, None]  # (s_chunk, K, 1) int32
            cols3 = jax.lax.broadcasted_iota(jnp.int32, (s_chunk, K, n), 2)
            oh = (cols3 == idx3).astype(jnp.bfloat16).reshape(rows, n)

            # ONE matmul gathers the commuted layer-1 partials and hi/lo
            # geometry together
            g = jnp.dot(oh, table_ref[i], preferred_element_type=jnp.float32)

            x = g[:, :f0p]  # feature half of layer-1 pre-activation
            if fold:
                # geometry already folded into the table: subtract c @ w0_xyz
                x = (x.reshape(s_chunk, K, f0p)
                     - cent_ref[i][:, None, :]).reshape(rows, f0p)
            if use_xyz:
                geo = g[:, f0p:]  # (rows, _GEO): xyz-hi in 0:3, xyz-lo in 3:6
                rel = (geo.reshape(s_chunk, K, _GEO)
                       - cent_ref[i][:, None, :]).reshape(rows, _GEO)
                x = x + jnp.dot(rel.astype(jnp.bfloat16),
                                w0x_ref[...].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)

            x = jnp.maximum(x + bs[0][...].astype(jnp.float32), 0.0)
            for j in range(1, n_layers):
                x = jnp.dot(x.astype(jnp.bfloat16),
                            ws[j - 1][...].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                x = jnp.maximum(x + bs[j][...].astype(jnp.float32), 0.0)

            cout = x.shape[-1]
            out_ref[i] = jnp.max(x.reshape(s_chunk, K, cout), axis=1)

    return kernel


# batch rows folded into one grid step (amortizes the fixed per-step cost;
# measured on chip with tools/probe_fused_gap.py: +14% at RCNN SA1 — all of
# it already at bb=2 — and +5% at SA2; larger bb is flat at SA1 and can
# regress at tiny-table shapes, so 2 is the default)
_BB_MAX = int(os.environ.get("POINTRCNN_MLP_BB", 2))


def _pick_bb(B: int, N: int, CT: int) -> int:
    bb = min(_BB_MAX, B)
    # keep the (bb, N, CT) table block comfortably double-bufferable
    while bb > 1 and (B % bb or bb * N * CT * 2 > (1 << 21)):
        bb -= 1
    return bb


def _fused_group(table, idx, cent, w0x, ws, bs, mode, f0p):
    B, N, CT = table.shape
    S, K = idx.shape[1], idx.shape[2]
    n_layers = 1 + len(ws)
    cout = bs[-1].shape[1]
    chunk_s = _pick_chunk(S, K)
    bb = _pick_bb(B, N, CT)
    grid = (B // bb, S // chunk_s)

    fixed = lambda b, s: (0, 0)
    in_specs = [
        pl.BlockSpec((bb, N, CT), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, chunk_s, K), lambda b, s: (b, s, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [table, idx]
    if mode == "hilo":
        in_specs.append(pl.BlockSpec((bb, chunk_s, _GEO), lambda b, s: (b, s, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(cent)
        in_specs.append(pl.BlockSpec(w0x.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(w0x)
    elif mode == "fold":
        in_specs.append(pl.BlockSpec((bb, chunk_s, f0p), lambda b, s: (b, s, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(cent)
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(w)
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(b)

    return pl.pallas_call(
        _make_kernel(n_layers, K, f0p, mode, bb=bb),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bb, chunk_s, cout), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, cout), jnp.float32),
        interpret=_INTERPRET,
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


# below this table size the gather matmul is no longer the dominant cost and
# fold's per-row centroid subtraction (rows x f0 on the VPU) outweighs the
# halved gather (measured: SA1 N=512 8.5->5.7 ms, SA2 N=128 2.26->2.65 ms —
# tools/bench_fold.py)
_FOLD_MIN_N = 256


def fold_geometry_profitable(features) -> bool:
    """Whether the folded-geometry table wins at this stage's shape."""
    return features is not None and features.shape[1] >= _FOLD_MIN_N


def fused_group_mlp_max(xyz, features, new_xyz, idx, weights, biases,
                        use_xyz: bool = True, fold_geometry: bool = False):
    """Fused ``group_points`` + MLP stack + max-over-K.

    :param xyz: (B, N, 3) f32; features: (B, N, C); new_xyz: (B, S, 3)
    :param idx: (B, S, K) int32 neighborhood indices
    :param weights: list of (Ci, Ci+1); biases: list of (Ci+1,) — BN folded.
        ``weights[0]`` has Cin = 3 + C when ``use_xyz`` else C.
    :param fold_geometry: commute the layer-1 xyz weights through the gather
        (halves the gather matmul; see module docstring).  Only valid for
        canonical-frame ``xyz`` magnitudes — adds bf16 table rounding of the
        absolute-coordinate term, ~2^-9 * max|xyz| equivalent coordinate
        noise.  Ignored when ``use_xyz`` is False.
    :return: (B, S, Cout) f32

    Differentiable.  Within :func:`fused_group_bwd_supported` shapes the VJP
    is a Pallas kernel that recomputes the forward *bit-identically* (same
    contraction dims and rounding points) and backprops in-core — gradients
    are of exactly the function the forward evaluated, to the bf16 precision
    of the backward matmuls themselves.  Outside those shapes the VJP falls
    back to differentiating the ungrouped XLA formulation (bf16
    group_points + fused_mlp_max): numerically equivalent in f32 but a
    different bf16 rounding order than the kernel, so near relu/max ties the
    fallback gradients can diverge locally — fine in practice (and exact
    where cotangents are zero, e.g. the FIXED RPN under ``stop_gradient``).
    """
    mode = ("fold" if fold_geometry else "hilo") if use_xyz else "none"
    return _fused_group_mlp_max_diff(
        mode, xyz, features, new_xyz, idx.astype(jnp.int32),
        tuple(weights), tuple(biases),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_group_mlp_max_diff(mode, xyz, features, new_xyz, idx, weights,
                              biases):
    return _fused_group_mlp_max_impl(
        mode, xyz, features, new_xyz, idx, weights, biases
    )


def _trim_padded_lanes(out_full, weights):
    """Single-layer stacks max over the padded layer-1 lanes; trim them.
    Shared by the primal and the custom-vjp fwd rule so the two cannot
    drift from _prepare_operands' padding convention."""
    return out_full[..., : weights[0].shape[1]] if len(weights) == 1 else out_full


def _fused_group_mlp_max_fwd(mode, xyz, features, new_xyz, idx, weights,
                             biases):
    out_full = _fused_group_mlp_max_full(
        mode, xyz, features, new_xyz, idx, weights, biases
    )
    out = _trim_padded_lanes(out_full, weights)
    return out, (xyz, features, new_xyz, idx, weights, biases, out_full)


def _fused_group_mlp_max_bwd(mode, res, ct):
    xyz, features, new_xyz, idx, weights, biases, out_full = res
    import numpy as _np

    gidx = _np.zeros(idx.shape, jax.dtypes.float0)

    if fused_group_bwd_supported(features, idx):
        gx, gf, gn, gw, gb = _pallas_bwd(
            mode, xyz, features, new_xyz, idx, weights, biases, out_full, ct
        )
        return gx, gf, gn, gidx, gw, gb

    # fallback: differentiate the ungrouped XLA formulation (numerically
    # equivalent in f32 but a different bf16 rounding order than the kernel)
    from pointrcnn_tpu.ops.grouping import group_points

    def reference(xyz, features, new_xyz, weights, biases):
        g = group_points(xyz, features, new_xyz, idx, mode != "none",
                         out_dtype=jnp.bfloat16)
        return fused_mlp_max(g, list(weights), list(biases))

    _, vjp = jax.vjp(reference, xyz, features, new_xyz, weights, biases)
    gx, gf, gn, gw, gb = vjp(ct)
    return gx, gf, gn, gidx, gw, gb


_fused_group_mlp_max_diff.defvjp(_fused_group_mlp_max_fwd, _fused_group_mlp_max_bwd)


def _pad_lanes(a, width, axis):
    pads = [(0, 0)] * a.ndim
    pads[axis] = (0, width - a.shape[axis])
    return jnp.pad(a, pads) if width != a.shape[axis] else a


def _prepare_operands(mode, xyz, features, new_xyz, weights, biases):
    """Build the kernel operands shared by the forward and backward passes:
    the gather table (commuted layer-1 P lanes, + hi/lo geometry lanes in
    ``"hilo"`` mode / folded xyz @ w0_xyz in ``"fold"`` mode), the padded
    centroid block, the duplicated layer-1 xyz weight rows (hilo only), and
    the lane-padded deeper weights/biases."""
    B, N, C = features.shape
    S = new_xyz.shape[1]
    w0 = weights[0]
    f0 = w0.shape[1]
    f0p = _ceil128(f0)

    if mode != "none":
        w0x3, w0f = w0[:3], w0[3:]
    else:
        w0f = w0
    # layer-1 commute: P = features @ w0_feat rides in the table instead of
    # raw features (bf16 inputs feed the MXU, matching the kernel's own
    # compute dtype)
    P = jnp.dot(features.astype(jnp.bfloat16), w0f.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    if mode == "hilo":
        P = P.astype(jnp.bfloat16)
        # hi/lo split so geometry survives the bf16 gather exactly; ONE
        # concatenate builds the whole table (pad + .at[].set would cost
        # two extra full-tensor HBM rewrites at ~26 MB each).  Bitmask
        # split — XLA's excess-precision pass folds the naive convert
        # round-trip to lo == 0 on TPU (see ops.common.split_hilo)
        from pointrcnn_tpu.ops.common import split_hilo

        xhi, xlo = split_hilo(xyz)
        zero_pf = jnp.zeros((B, N, f0p - f0), jnp.bfloat16)
        zero_geo = jnp.zeros((B, N, _GEO - 6), jnp.bfloat16)
        table = jnp.concatenate([P, zero_pf, xhi, xlo, zero_geo], axis=-1)
        cent = jnp.concatenate(
            [new_xyz.astype(jnp.float32),
             jnp.zeros((B, S, _GEO - 3), jnp.float32)], axis=-1)
        # duplicate xyz weight rows: (hi - c) w + lo w == (xyz - c) w
        w0x = jnp.zeros((_GEO, f0p), jnp.float32)
        w0x = w0x.at[0:3, :f0].set(w0x3).at[3:6, :f0].set(w0x3)
    elif mode == "fold":
        # geometry commuted through the gather: table rows carry the FULL
        # per-point layer-1 pre-activation P + x @ w0_xyz (bf16 — the one
        # rounding this mode adds); the centroid term c @ w0_xyz stays f32
        # and is subtracted in-kernel after the gather
        G = jnp.einsum("bnc,cf->bnf", xyz, w0x3,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        table = _pad_lanes((P + G).astype(jnp.bfloat16), f0p, 2)
        cent = _pad_lanes(
            jnp.einsum("bsc,cf->bsf", new_xyz, w0x3,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32), f0p, 2)
        w0x = None
    else:
        table, cent, w0x = _pad_lanes(P.astype(jnp.bfloat16), f0p, 2), None, None
    # padded layer-1 lanes carry zero P, zero bias and zero w1 rows, so they
    # stay zero through the ReLU and contribute nothing downstream
    ws = [_pad_lanes(weights[1].astype(jnp.float32), f0p, 0)] if len(weights) > 1 else []
    ws += [w.astype(jnp.float32) for w in weights[2:]]
    bs = [_pad_lanes(biases[0].reshape(1, -1).astype(jnp.float32), f0p, 1)]
    bs += [b.reshape(1, -1).astype(jnp.float32) for b in biases[1:]]
    return table, cent, w0x, tuple(ws), tuple(bs), f0, f0p


def _fused_group_mlp_max_full(mode, xyz, features, new_xyz, idx, weights,
                              biases):
    table, cent, w0x, ws, bs, f0, f0p = _prepare_operands(
        mode, xyz, features, new_xyz, weights, biases
    )
    return _fused_group(
        table, idx.astype(jnp.int32), cent, w0x, ws, bs, mode, f0p
    )


def _fused_group_mlp_max_impl(mode, xyz, features, new_xyz, idx, weights,
                              biases):
    out = _fused_group_mlp_max_full(
        mode, xyz, features, new_xyz, idx, weights, biases
    )
    return _trim_padded_lanes(out, weights)


# ---------------------------------------------------------------------------
# Pallas backward: recompute the gather+MLP in VMEM, backprop in-core.
#
# The XLA backward of this op is HBM-bound: it materialises the (B, S, K, C)
# neighborhood activations and the (B, S*K, N) one-hot operand of the
# transposed gather (dtable = oh^T @ dgathered) in HBM — ~38 ms of the 49 ms
# RCNN-stage backward at the production shapes.  This kernel rebuilds the
# one-hot and re-runs the (cheap, MXU-bound) forward per centroid chunk in
# VMEM, then chains the backward in-core, accumulating dW/db across all grid
# steps and dtable across the centroid chunks of each batch row.  Nothing of
# size (S*K) ever reaches HBM.
# ---------------------------------------------------------------------------

# smaller row budget than the forward: the backward keeps ~3x the live
# buffers (activations + their cotangents + the dgather block)
_MAX_ROWS_BWD = int(os.environ.get("POINTRCNN_MLP_ROWS_BWD", 2048))


def _pick_chunk_bwd(S: int, K: int) -> int:
    chunk = min(_CHUNK_S_MAX, S, max(1, _MAX_ROWS_BWD // K))
    while S % chunk:
        chunk -= 1
    return chunk


def fused_group_bwd_supported(features, idx) -> bool:
    if not _INTERPRET and jax.default_backend() not in ("tpu", "axon"):
        return False
    if features is None:
        return False
    B, N, C = features.shape
    S, K = idx.shape[1], idx.shape[2]
    chunk = _pick_chunk_bwd(S, K)
    return N <= _MAX_N and chunk >= 8 and chunk * K * N <= _MAX_OH_CELLS


def _make_bwd_kernel(n_layers: int, K: int, f0p: int, mode: str):
    use_xyz = mode == "hilo"
    fold = mode == "fold"

    def kernel(*refs):
        p = 0
        table_ref = refs[p]; p += 1
        idx_ref = refs[p]; p += 1
        if use_xyz:
            cent_ref = refs[p]; p += 1
            w0x_ref = refs[p]; p += 1
        elif fold:
            cent_ref = refs[p]; p += 1
        ws = refs[p : p + n_layers - 1]; p += n_layers - 1
        bs = refs[p : p + n_layers]; p += n_layers
        out_ref = refs[p]; p += 1
        ct_ref = refs[p]; p += 1
        dtable_ref = refs[p]; p += 1
        if use_xyz or fold:
            dcent_ref = refs[p]; p += 1
        if use_xyz:
            dw0x_ref = refs[p]; p += 1
        dws = refs[p : p + n_layers - 1]; p += n_layers - 1
        dbs = refs[p : p + n_layers]; p += n_layers

        b = pl.program_id(0)
        s = pl.program_id(1)

        # dtable accumulates over the centroid chunks of one batch row;
        # dW/db accumulate over the whole grid (their blocks are pinned)
        @pl.when(s == 0)
        def _zero_dtable():
            dtable_ref[...] = jnp.zeros(dtable_ref.shape, dtable_ref.dtype)

        @pl.when(jnp.logical_and(b == 0, s == 0))
        def _zero_params():
            if use_xyz:
                dw0x_ref[...] = jnp.zeros(dw0x_ref.shape, dw0x_ref.dtype)
            for r in dws:
                r[...] = jnp.zeros(r.shape, r.dtype)
            for r in dbs:
                r[...] = jnp.zeros(r.shape, r.dtype)

        n = table_ref.shape[1]
        s_chunk = idx_ref.shape[1]
        rows = s_chunk * K

        def dot_tn(a, c):  # a^T @ c, contracting rows
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        def dot_nt(c, w):  # c @ w^T, contracting lanes
            return jax.lax.dot_general(
                c.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

        # ---- recompute the forward, bit-identical to the fwd kernel (same
        # contraction dims, so the MXU accumulation order matches and the
        # relu/max masks are exact) ----
        idx3 = idx_ref[0][:, :, None]
        cols3 = jax.lax.broadcasted_iota(jnp.int32, (s_chunk, K, n), 2)
        oh = (cols3 == idx3).astype(jnp.bfloat16).reshape(rows, n)
        g = jnp.dot(oh, table_ref[0], preferred_element_type=jnp.float32)
        x = g[:, :f0p]
        if fold:
            x = (x.reshape(s_chunk, K, f0p)
                 - cent_ref[0][:, None, :]).reshape(rows, f0p)
        if use_xyz:
            geo = g[:, f0p:]
            rel = (geo.reshape(s_chunk, K, _GEO)
                   - cent_ref[0][:, None, :]).reshape(rows, _GEO)
            x = x + jnp.dot(rel.astype(jnp.bfloat16),
                            w0x_ref[...].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        acts = [jnp.maximum(x + bs[0][...].astype(jnp.float32), 0.0)]
        for i in range(1, n_layers):
            x = jnp.dot(acts[-1].astype(jnp.bfloat16),
                        ws[i - 1][...].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            acts.append(jnp.maximum(x + bs[i][...].astype(jnp.float32), 0.0))

        a_last = acts[-1]
        cout = a_last.shape[-1]

        # ---- K-max backward: even split among ties (jnp.max convention) ----
        # INVARIANT: the recompute above must be bit-identical to the
        # forward kernel (same contraction dims/rounding points), else
        # eqm can be all-zero for a (centroid, channel) and its cotangent
        # is silently dropped (cnt clamps to 1).  tools/tpu_smoke.py checks
        # the end-to-end gradients on-chip; re-run it after any change to
        # either kernel's matmul chain.
        a3 = a_last.reshape(s_chunk, K, cout)
        mx = out_ref[0]
        eqm = (a3 == mx[:, None, :]).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(eqm, axis=1), 1.0)
        da = (eqm * (ct_ref[0] / cnt)[:, None, :]).reshape(rows, cout)

        # ---- MLP backward (relu mask: post-relu a > 0 <=> pre-act > 0) ----
        dz = da * (a_last > 0)
        for i in range(n_layers - 1, 0, -1):
            a_prev = acts[i - 1]
            dws[i - 1][...] += dot_tn(a_prev, dz)
            dbs[i][...] += jnp.sum(dz, axis=0, keepdims=True)
            dz = dot_nt(dz, ws[i - 1][...]) * (a_prev > 0)

        dbs[0][...] += jnp.sum(dz, axis=0, keepdims=True)
        if use_xyz:
            dw0x_ref[...] += dot_tn(rel, dz)
            drel = dot_nt(dz, w0x_ref[...])
            dcent_ref[0] = -jnp.sum(drel.reshape(s_chunk, K, _GEO), axis=1)
            dgather = jnp.concatenate([dz, drel], axis=1)  # (rows, CT)
        elif fold:
            # x = gather - cent_term: straight pass-through / negated sum
            dcent_ref[0] = -jnp.sum(dz.reshape(s_chunk, K, f0p), axis=1)
            dgather = dz
        else:
            dgather = dz
        # transposed gather: scatter-add of dgather back to table rows
        dtable_ref[0] += dot_tn(oh, dgather)

    return kernel


def _pallas_bwd(mode, xyz, features, new_xyz, idx, weights, biases,
                out_full, ct):
    use_xyz = mode == "hilo"
    fold = mode == "fold"
    B, N, C = features.shape
    S, K = idx.shape[1], idx.shape[2]
    table, cent, w0x, ws, bs, f0, f0p = _prepare_operands(
        mode, xyz, features, new_xyz, weights, biases
    )
    n_layers = 1 + len(ws)
    cout = out_full.shape[-1]
    ct_full = ct if ct.shape[-1] == cout else _pad_lanes(
        ct.astype(jnp.float32), cout, 2)
    chunk_s = _pick_chunk_bwd(S, K)
    grid = (B, S // chunk_s)
    CT = table.shape[-1]

    fixed = lambda b, s: (0, 0)
    in_specs = [
        pl.BlockSpec((1, N, CT), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, chunk_s, K), lambda b, s: (b, s, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [table, idx.astype(jnp.int32)]
    if use_xyz:
        in_specs.append(pl.BlockSpec((1, chunk_s, _GEO), lambda b, s: (b, s, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(cent)
        in_specs.append(pl.BlockSpec(w0x.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(w0x)
    elif fold:
        in_specs.append(pl.BlockSpec((1, chunk_s, f0p), lambda b, s: (b, s, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(cent)
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(w)
    for bb in bs:
        in_specs.append(pl.BlockSpec(bb.shape, fixed, memory_space=pltpu.VMEM))
        operands.append(bb)
    for a in (out_full, ct_full):
        in_specs.append(pl.BlockSpec((1, chunk_s, cout), lambda b, s: (b, s, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(a.astype(jnp.float32))

    out_shape = [jax.ShapeDtypeStruct((B, N, CT), jnp.float32)]
    out_specs = [pl.BlockSpec((1, N, CT), lambda b, s: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    if use_xyz or fold:
        geo_w = _GEO if use_xyz else f0p
        out_shape.append(jax.ShapeDtypeStruct((B, S, geo_w), jnp.float32))
        out_specs.append(pl.BlockSpec((1, chunk_s, geo_w), lambda b, s: (b, s, 0),
                                      memory_space=pltpu.VMEM))
    if use_xyz:
        out_shape.append(jax.ShapeDtypeStruct(w0x.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w0x.shape, fixed, memory_space=pltpu.VMEM))
    for w in ws:
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, fixed, memory_space=pltpu.VMEM))
    for bb in bs:
        out_shape.append(jax.ShapeDtypeStruct(bb.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(bb.shape, fixed, memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        _make_bwd_kernel(n_layers, K, f0p, mode),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_INTERPRET,
    )(*operands)

    k = 0
    dtable = res[k]; k += 1
    if use_xyz or fold:
        dcent = res[k]; k += 1
    if use_xyz:
        dw0x_dup = res[k]; k += 1
    dws_pad = res[k : k + n_layers - 1]; k += n_layers - 1
    dbs_pad = res[k : k + n_layers]

    # assemble parameter-space grads from the table/commuted-lane grads
    w0 = weights[0]
    w0f = w0[3:] if mode != "none" else w0
    dP = dtable[..., :f0]
    # P = features_bf16 @ w0f_bf16 (see _prepare_operands)
    dfeatures = jax.lax.dot_general(
        dP.astype(jnp.bfloat16), w0f.astype(jnp.bfloat16),
        (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dw0f = jnp.einsum(
        "bnc,bnf->cf", features.astype(jnp.bfloat16), dP.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    if use_xyz:
        # x rides the table as a bf16 hi/lo pair; the casts carry identity /
        # zero derivative respectively, so dxyz is the hi-lane grad alone
        dxyz = dtable[..., f0p : f0p + 3]
        dnew_xyz = dcent[..., :3]
        # the hi and lo weight rows are the same parameter w0[:3]
        dw0x3 = dw0x_dup[0:3, :f0] + dw0x_dup[3:6, :f0]
        dw0 = jnp.concatenate([dw0x3, dw0f], axis=0)
    elif fold:
        # table = bf16(P + xyz @ w0x3), cent = new_xyz @ w0x3 (both linear;
        # the bf16 cast carries identity derivative)
        w0x3 = w0[:3]
        dcent_f = dcent[..., :f0]
        dxyz = jnp.einsum("bnf,cf->bnc", dP, w0x3,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        dnew_xyz = jnp.einsum("bsf,cf->bsc", dcent_f, w0x3,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
        dw0x3 = (
            jnp.einsum("bnc,bnf->cf", xyz, dP,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bsc,bsf->cf", new_xyz, dcent_f,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        )
        dw0 = jnp.concatenate([dw0x3, dw0f], axis=0)
    else:
        dxyz = jnp.zeros_like(xyz)
        dnew_xyz = jnp.zeros_like(new_xyz)
        dw0 = dw0f
    dws_out = [dw0]
    if n_layers > 1:
        dws_out.append(dws_pad[0][:f0])  # trim the padded layer-1 lanes
        dws_out += list(dws_pad[1:])
    dbs_out = [dbs_pad[0][0, :f0]] + [d[0] for d in dbs_pad[1:]]
    return (dxyz, dfeatures, dnew_xyz, tuple(dws_out), tuple(dbs_out))


def fused_mlp_max(grouped, weights, biases, compute_dtype=jnp.bfloat16):
    """(B, S, K, Cin) -> (B, S, Cout): per-point MLP stack + max over K, on an
    already-materialised neighborhood tensor (XLA; the fusion win lives in
    :func:`fused_group_mlp_max`, which skips this materialisation entirely)."""
    x = grouped.astype(compute_dtype)
    for w, b in zip(weights, biases):
        x = jnp.dot(x, w.astype(compute_dtype), preferred_element_type=jnp.float32)
        x = jnp.maximum(x + b.astype(jnp.float32), 0.0).astype(compute_dtype)
    return jnp.max(x.astype(jnp.float32), axis=2)
