"""Fused ball-query Pallas kernel (distances + k-nearest selection in VMEM).

The XLA formulation (ops.grouping.ball_query_multi) materialises the (S, N)
distance matrix in HBM and hands it to ``approx_min_k``; at RPN stage-1 scale
(4096 x 16384 per scene) that round-trip is ~4 ms/batch — the single most
expensive part of the backbone after FPS.  This kernel never leaves VMEM:

- distances are computed in ``w`` strided passes of width ``W`` (contiguous
  lane slices of the transposed point table), folding a running min per
  stride class — point ``p`` belongs to class ``p mod W``, so each class
  keeps its nearest candidate (the same windowed-candidate scheme
  ``approx_min_k``'s PartialReduce uses, with stride classes instead of
  contiguous windows — identical recall statistics for shuffled points);
- the class minima are pairwise-min folded down to ``_XW`` lanes (folding
  classes j and j+W/2 IS the class-(j mod W/2) minimum, so this is exactly a
  narrower stride-class count applied only to the selection stage), then
- the k nearest candidates are extracted from the (chunk, _XW) folded minima
  by ``kmax`` masked min-reductions, ascending in distance.  Extraction does
  5 masked reduces per neighbor, so it dominates the kernel at large widths;
  scanning wide + folding + extracting narrow decouples the scan's stride
  count from the extraction cost (14.3 -> ~6 ms at SA1 train shapes).

Selection is approximate in exactly the way the default XLA path already is
(a class keeps only its nearest member): with W classes and k neighbors the
expected number of true-top-k collisions is C(k,2)/W — ~1 at W=512, k=32
(recall ~0.97, at or above the approx_min_k recall_target of 0.95 used
before; measured 1.00 on clustered scenes at every W in {128..2048},
tools/ab_approximations.py).  On-chip sweep (v5e, SA1 banded 16384->4096 and
full-scan 4096x1024): W=512 is fastest at every measured shape — narrower W
shortens the k-extraction sweeps but the (chunk, W) class-minima fold
dominates and lays out best at 4x128 lanes — so ``_pick_w`` prefers 512 and
only halves for divisibility of small candidate pools.
In-radius masking and CUDA-compatible backfill (repeat first hit, zeros when
empty — reference Pointnet2.PyTorch ball_query semantics) happen outside on
the tiny (B, S, k) result.

Used by ops.grouping.ball_query / ball_query_multi for large point tables
(RPN stages 1-2); small tables stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# interpret mode for CPU-side CI (tests monkeypatch this)
_INTERPRET = False

_W = 512  # default stride-class count (full-scan path; see _pick_w)
_XW = 128  # extraction width: class minima fold to this many lanes first
_BIG = 3.0e38  # python float: jnp scalars would be captured consts in the kernel


def _fold_extract(v, g, gx, gy, gz, cx, cy, cz, kmax, emit_rel):
    """Ascending k-extraction from the stride-class minima, preceded by a
    pairwise-min tournament fold of the class axis down to ``_XW`` lanes.

    Folding classes j and j + W/2 yields EXACTLY the class-(j mod W/2)
    minimum, so the fold is semantically just a narrower stride-class count
    (recall measured 1.00 at every W in {128..2048} on clustered scenes,
    tools/ab_approximations.py; expected top-k collisions C(k,2)/W stays
    ~<=4 at W=128, k=32).  The point: the k-extraction below does 5 masked
    (chunk, W) min-reduces PER NEIGHBOR — it dominated the whole kernel at
    W=512 (the scan itself is ~1/7 of the cost) — while each fold stage is
    one compare + a few selects.  Scanning wide + extracting narrow
    decouples the scan's stride count from the extraction width.

    Returns the packed [dist | idx (| relx | rely | relz)] parts list."""
    W = v.shape[1]
    while W > _XW and W % 2 == 0:
        W //= 2
        keep = v[:, :W] <= v[:, W:]  # ties keep the lower class
        v = jnp.where(keep, v[:, :W], v[:, W:])
        g = jnp.where(keep, g[:, :W], g[:, W:])
        if emit_rel:
            gx = jnp.where(keep, gx[:, :W], gx[:, W:])
            gy = jnp.where(keep, gy[:, :W], gy[:, W:])
            gz = jnp.where(keep, gz[:, :W], gz[:, W:])
    chunk = v.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, W), 1)

    gf = g.astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, kmax), 1)
    out_d = jnp.zeros((chunk, kmax), jnp.float32)
    out_i = jnp.zeros((chunk, kmax), jnp.float32)
    if emit_rel:
        out_x = jnp.zeros((chunk, kmax), jnp.float32)
        out_y = jnp.zeros((chunk, kmax), jnp.float32)
        out_z = jnp.zeros((chunk, kmax), jnp.float32)
    for k in range(kmax):
        m = jnp.min(v, axis=1, keepdims=True)  # (chunk, 1)
        wcol = jnp.min(jnp.where(v == m, col, 2**30), axis=1, keepdims=True)
        at_w = col == wcol
        win = jnp.min(jnp.where(at_w, gf, _BIG), axis=1, keepdims=True)
        sel = lane == k
        out_d = out_d + jnp.where(sel, m, 0.0)
        out_i = out_i + jnp.where(sel, win, 0.0)
        if emit_rel:
            wx = jnp.min(jnp.where(at_w, gx, _BIG), axis=1, keepdims=True)
            wy = jnp.min(jnp.where(at_w, gy, _BIG), axis=1, keepdims=True)
            wz = jnp.min(jnp.where(at_w, gz, _BIG), axis=1, keepdims=True)
            out_x = out_x + jnp.where(sel, wx - cx, 0.0)
            out_y = out_y + jnp.where(sel, wy - cy, 0.0)
            out_z = out_z + jnp.where(sel, wz - cz, 0.0)
        v = jnp.where(at_w, _BIG, v)

    parts = [out_d, out_i]
    if emit_rel:
        parts += [out_x, out_y, out_z]
    return parts


def _pick_w(candidates: int, kmax: int) -> int:
    """Stride-class count for a candidate pool of the given size.

    512 measured fastest at every benchmarked shape (see module docstring)
    and keeps top-k collision loss ~<=1 expected point for k <= 45, so the
    only reason to narrow is divisibility: pools that aren't a multiple of
    512 (but are of 128 — callers guarantee that) halve down until they
    divide.  POINTRCNN_BQ_W=<n> forces a width (the on-chip A/B sweep hook,
    tools/ab_approximations.py kernel_ball_query[_banded]).
    """
    import os

    forced = int(os.environ.get("POINTRCNN_BQ_W", "0"))
    if forced:
        # the kernel scans (candidates // W) * W columns, so a W that does
        # not divide the pool would silently drop tail candidates — halve a
        # forced width down until it divides (and say so), matching the
        # default path's rule
        W = min(forced, candidates)
        while candidates % W:
            W //= 2
        if W != forced:
            import warnings

            warnings.warn(
                f"POINTRCNN_BQ_W={forced} does not divide the candidate "
                f"pool {candidates}; using W={W}")
        return W
    W = min(_W, candidates)
    while candidates % W:
        W //= 2
    return W


def _make_kernel(N: int, kmax: int, w: int, emit_rel: bool, _W: int):
    def kernel(cent_ref, kt_ref, out_ref):
        """cent_ref: (1, chunk, 3); kt_ref: (1, 3, N); out_ref:
        (1, chunk, (2 + 3*emit_rel)*kmax) packed
        [dist | idx-as-f32 (| relx | rely | relz)]."""
        c = cent_ref[0]  # (chunk, 3)
        chunk = c.shape[0]
        cx, cy, cz = c[:, 0:1], c[:, 1:2], c[:, 2:3]

        col = jax.lax.broadcasted_iota(jnp.int32, (chunk, _W), 1)

        # stride-class running min: class j keeps its nearest point
        v = jnp.full((chunk, _W), _BIG, jnp.float32)
        g = jnp.zeros((chunk, _W), jnp.int32)
        if emit_rel:
            gx = jnp.zeros((chunk, _W), jnp.float32)
            gy = jnp.zeros((chunk, _W), jnp.float32)
            gz = jnp.zeros((chunk, _W), jnp.float32)
        for j in range(w):
            kt = kt_ref[0, :, j * _W : (j + 1) * _W]  # (3, W)
            # direct diffs: the matmul form loses ~1e-2 m to f32
            # cancellation at scene coordinates
            d2 = (
                jnp.square(cx - kt[0:1, :])
                + jnp.square(cy - kt[1:2, :])
                + jnp.square(cz - kt[2:3, :])
            )
            upd = d2 < v
            g = jnp.where(upd, j * _W + col, g)
            v = jnp.where(upd, d2, v)
            if emit_rel:
                gx = jnp.where(upd, jnp.broadcast_to(kt[0:1, :], (chunk, _W)), gx)
                gy = jnp.where(upd, jnp.broadcast_to(kt[1:2, :], (chunk, _W)), gy)
                gz = jnp.where(upd, jnp.broadcast_to(kt[2:3, :], (chunk, _W)), gz)

        if not emit_rel:
            gx = gy = gz = None
        out_ref[0] = jnp.concatenate(
            _fold_extract(v, g, gx, gy, gz, cx, cy, cz, kmax, emit_rel), axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("kmax", "emit_rel", "W"))
def _ball_query_pallas(cent: jnp.ndarray, known_t: jnp.ndarray, kmax: int,
                       emit_rel: bool = False, W: int = _W):
    B, S, _ = cent.shape
    N = known_t.shape[2]
    chunk = 128
    while S % chunk:
        chunk //= 2
    width = (2 + 3 * emit_rel) * kmax
    packed = pl.pallas_call(
        _make_kernel(N, kmax, N // W, emit_rel, W),
        grid=(B, S // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, 3), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, width), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, width), jnp.float32),
        interpret=_INTERPRET,
    )(cent, known_t)
    dist2 = packed[..., :kmax]
    idx = packed[..., kmax : 2 * kmax].astype(jnp.int32)
    if not emit_rel:
        return dist2, idx
    rel = jnp.stack(
        [packed[..., 2 * kmax + i * kmax : 2 * kmax + (i + 1) * kmax]
         for i in range(3)],
        axis=-1,
    )  # (B, S, kmax, 3)
    return dist2, idx, rel


def _make_banded_kernel(Ns: int, kmax: int, n_bands: int, cpb: int,
                        chunk: int, emit_rel: bool, _W: int):
    """Banded variant: the point table is z-sorted and the centroids are
    band-ordered (``cpb`` per equal-count depth band — the blockwise-FPS
    layout), so a chunk of centroids only searches its own band ±1 (three
    (3, Ns) table blocks) instead of the full N columns: w = 3*Ns/_W strides
    instead of N/_W.  Candidates from a clamped (duplicated) edge band are
    masked out, so no point can occupy two selection slots."""
    w = Ns // _W

    def kernel(cent_ref, ktp_ref, ktc_ref, ktn_ref, out_ref):
        c = cent_ref[0]
        chunk_rows = c.shape[0]
        cx, cy, cz = c[:, 0:1], c[:, 1:2], c[:, 2:3]
        col = jax.lax.broadcasted_iota(jnp.int32, (chunk_rows, _W), 1)

        band = (pl.program_id(1) * chunk) // cpb
        prev_ok = band > 0
        next_ok = band < n_bands - 1
        base_prev = jnp.maximum(band - 1, 0)
        base_next = jnp.minimum(band + 1, n_bands - 1)

        v = jnp.full((chunk_rows, _W), _BIG, jnp.float32)
        g = jnp.zeros((chunk_rows, _W), jnp.int32)
        if emit_rel:
            gx = jnp.zeros((chunk_rows, _W), jnp.float32)
            gy = jnp.zeros((chunk_rows, _W), jnp.float32)
            gz = jnp.zeros((chunk_rows, _W), jnp.float32)

        for ref, base, ok in (
            (ktp_ref, base_prev, prev_ok),
            (ktc_ref, band, True),
            (ktn_ref, base_next, next_ok),
        ):
            pen = jnp.float32(0.0) if ok is True else jnp.where(ok, 0.0, _BIG)
            for j in range(w):
                kt = ref[0, :, j * _W : (j + 1) * _W]
                d2 = (
                    jnp.square(cx - kt[0:1, :])
                    + jnp.square(cy - kt[1:2, :])
                    + jnp.square(cz - kt[2:3, :])
                ) + pen
                upd = d2 < v
                gidx = base * Ns + j * _W + col
                g = jnp.where(upd, gidx, g)
                v = jnp.where(upd, d2, v)
                if emit_rel:
                    gx = jnp.where(upd, jnp.broadcast_to(kt[0:1, :], (chunk_rows, _W)), gx)
                    gy = jnp.where(upd, jnp.broadcast_to(kt[1:2, :], (chunk_rows, _W)), gy)
                    gz = jnp.where(upd, jnp.broadcast_to(kt[2:3, :], (chunk_rows, _W)), gz)

        if not emit_rel:
            gx = gy = gz = None
        out_ref[0] = jnp.concatenate(
            _fold_extract(v, g, gx, gy, gz, cx, cy, cz, kmax, emit_rel), axis=1)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("kmax", "n_bands", "emit_rel", "W"))
def _ball_query_pallas_banded(cent, known_t, kmax: int, n_bands: int,
                              emit_rel: bool = True, W: int = _W):
    """cent: (B, S, 3) band-ordered; known_t: (B, 3, N) z-sorted columns."""
    B, S, _ = cent.shape
    N = known_t.shape[2]
    Ns = N // n_bands
    cpb = S // n_bands
    chunk = 128
    while S % chunk or cpb % chunk:
        chunk //= 2
    width = (2 + 3 * emit_rel) * kmax
    band_of = lambda s: (s * chunk) // cpb
    packed = pl.pallas_call(
        _make_banded_kernel(Ns, kmax, n_bands, cpb, chunk, emit_rel, W),
        grid=(B, S // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, 3), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Ns),
                         lambda b, s: (b, 0, jnp.maximum(band_of(s) - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Ns), lambda b, s: (b, 0, band_of(s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Ns),
                         lambda b, s: (b, 0, jnp.minimum(band_of(s) + 1,
                                                         n_bands - 1)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, width), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, width), jnp.float32),
        interpret=_INTERPRET,
    )(cent, known_t, known_t, known_t)
    dist2 = packed[..., :kmax]
    idx = packed[..., kmax : 2 * kmax].astype(jnp.int32)
    if not emit_rel:
        return dist2, idx
    rel = jnp.stack(
        [packed[..., 2 * kmax + i * kmax : 2 * kmax + (i + 1) * kmax]
         for i in range(3)],
        axis=-1,
    )
    return dist2, idx, rel


def ball_query_banded_supported(N: int, S: int, kmax: int, n_bands: int) -> bool:
    if not (jax.default_backend() in ("tpu", "axon") or _INTERPRET):
        return False
    if n_bands < 2 or N % n_bands or S % n_bands:
        return False
    Ns, cpb = N // n_bands, S // n_bands
    chunk = 128
    while (S % chunk or cpb % chunk) and chunk > 1:
        chunk //= 2
    return Ns % 128 == 0 and kmax <= 128 and chunk >= 8


def ball_query_multi_grouped_banded(xs, new_xyz, specs, n_bands: int,
                                    point0=None):
    """Banded ball query + xyz-only grouping on a z-SORTED table ``xs`` with
    band-ordered centroids (the blockwise-FPS layout).  Same output contract
    as ball_query_multi_grouped_pallas; only the candidate search is
    restricted to each centroid's depth band ±1 (in-radius recall parity
    measured in tools/ab_approximations.py kernel_ball_query_banded).

    ``point0``: (B, 1, 3) empty-neighborhood fallback point — pass the
    ORIGINAL cloud's first point to match ball_query_multi_grouped_pallas
    (which never sees the z-sort); defaults to the sorted table's first
    (globally lowest-z) point when the caller has no original ordering."""
    kmax = max(ns for _, ns in specs)
    known_t = jnp.transpose(xs.astype(jnp.float32), (0, 2, 1))
    cent = new_xyz.astype(jnp.float32)
    dist2, idx, rel = _ball_query_pallas_banded(
        cent, known_t, kmax, n_bands, emit_rel=True,
        W=_pick_w(xs.shape[1] // n_bands, kmax))
    p0 = xs[:, 0:1] if point0 is None else point0
    rel0 = p0[:, :, None, :] - new_xyz[:, :, None, :]
    outs = []
    for radius, nsample in specs:
        r2 = jnp.float32(radius) ** 2
        in_r = (dist2[..., :nsample] < r2)[..., None]
        r = rel[..., :nsample, :]
        first = r[..., 0:1, :]
        any_hit = in_r[..., 0:1, :]
        outs.append(jnp.where(in_r, r, jnp.where(any_hit, first, rel0)))
    return outs


def ball_query_pallas_supported(N: int, S: int, kmax: int) -> bool:
    return (
        jax.default_backend() in ("tpu", "axon")
        and N % 128 == 0
        and N >= 2048  # below this the XLA path is already cheap
        and kmax <= 128
        and S % 8 == 0
    )


def ball_query_pallas(xyz: jnp.ndarray, new_xyz: jnp.ndarray, kmax: int):
    """(B, N, 3) x (B, S, 3) -> (dist2 (B, S, kmax) ascending, idx (B, S, kmax)).

    Approximate k-nearest candidates (stride-class scheme, see module doc);
    callers apply per-radius masking/backfill on the result.
    """
    known_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    return _ball_query_pallas(new_xyz.astype(jnp.float32), known_t, kmax,
                              W=_pick_w(xyz.shape[1], kmax))


def ball_query_multi_grouped_pallas(xyz, new_xyz, specs, point0=None):
    """Ball query + xyz-only neighborhood grouping, fused.

    For SA stages with no input features (RPN stage 1: the backbone consumes
    raw xyz only, lib/net/pointnet2_msg.py + cfg USE_INTENSITY=False) the
    neighborhood gather fetches nothing but coordinates — which the kernel
    already holds per candidate class.  Emitting relative coordinates from
    the kernel removes the XLA row-gather entirely (~6 ms/batch-4 at RPN
    stage-1 scale).

    ``point0``: (B, 1, 3) empty-neighborhood fallback point; defaults to
    ``xyz[:, 0:1]`` (pass the original cloud's first point when ``xyz`` is
    a reordered view, e.g. the z-sorted table of the banded fallback path).

    :return: list over specs of rel_xyz (B, S, nsample, 3) f32 with CUDA
        QueryAndGroup fill semantics (slots past the hit count repeat the
        first hit; rows with no hit fall back to point 0, matching
        group_points on an all-zero index row).
    """
    kmax = max(ns for _, ns in specs)
    known_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    cent = new_xyz.astype(jnp.float32)
    dist2, idx, rel = _ball_query_pallas(
        cent, known_t, kmax, emit_rel=True,
        W=_pick_w(xyz.shape[1], kmax))
    # rel of point 0 relative to each centroid: the all-empty fallback
    p0 = xyz[:, 0:1] if point0 is None else point0
    rel0 = p0[:, :, None, :] - new_xyz[:, :, None, :]  # (B, S, 1, 3)
    outs = []
    for radius, nsample in specs:
        r2 = jnp.float32(radius) ** 2
        in_r = (dist2[..., :nsample] < r2)[..., None]  # (B, S, ns, 1)
        r = rel[..., :nsample, :]
        first = r[..., 0:1, :]
        any_hit = in_r[..., 0:1, :]
        outs.append(jnp.where(in_r, r, jnp.where(any_hit, first, rel0)))
    return outs
