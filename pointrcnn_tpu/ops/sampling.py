"""Furthest point sampling.

TPU-native equivalent of the reference's ``furthest_point_sampling`` CUDA op
(Pointnet2.PyTorch submodule, consumed at lib/net/pointnet2_msg.py:26-45).
Same algorithm — start at index 0, then greedily take the point with the
largest min-distance to the selected set — expressed as an XLA ``fori_loop``
over a (B, N) distance cache.  The per-step work is a vector min/argmax, so
XLA keeps the whole loop on-chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def furthest_point_sample(
    xyz: jnp.ndarray, npoint: int, method: str = "exact"
) -> jnp.ndarray:
    """``xyz``: (B, N, 3) -> (B, npoint) int32 indices.

    ``method="exact"`` — the CUDA greedy semantics: first selected index is 0,
    then npoint-1 sequential max-min-distance iterations.  Dispatches to the
    Pallas kernel (ops.pallas_fps) for the large scene-level problem shape on
    TPU; the XLA loop handles small/roi-level shapes (where the batch is
    large and the per-kernel sequential grid would serialise it).

    ``method="blockwise"`` — two-level approximation: each batch row is
    sorted by depth (z), split into ``s`` contiguous *spatial bands* of equal
    point count, and exact greedy FPS runs independently per band for
    npoint/s picks.  The sequential chain shrinks from npoint to npoint/s
    iterations while each iteration does the same (B, N)-cells of vector
    work, so the kernel is ~s× faster.  The z-sort matters: bands own
    disjoint territories, so their FPS picks cannot duplicate each other
    (independent *random* stripes waste ~40% of the centroid budget on
    cross-stripe near-duplicates), and equal-count bands allocate centroids
    proportionally to point density — measured fg-point coverage at the SA1
    radii is slightly *better* than exact FPS on clustered scenes
    (tools/ab_approximations.py kernel_fps_coverage).
    """
    if method not in ("exact", "blockwise"):
        raise ValueError(f"fps method must be 'exact'|'blockwise', got {method!r}")
    B, N, _ = xyz.shape
    if method == "blockwise":
        s = _blockwise_stripes(N, npoint)
        if s > 1:
            Ns = N // s
            xs, perm = _zsort(xyz)
            sub = furthest_point_sample(
                xs.reshape(B * s, Ns, 3), npoint // s, method="exact"
            )  # (B*s, npoint/s) of band-local indices
            stripe = jnp.arange(B * s, dtype=jnp.int32)[:, None] % s
            sorted_idx = (sub + stripe * Ns).reshape(B, npoint)
            return jnp.take_along_axis(perm, sorted_idx, axis=1)
        # too small to stripe: exact is already cheap
    if jax.default_backend() in ("tpu", "axon") and N % 128 == 0:
        from pointrcnn_tpu.ops.pallas_fps import MAX_CELLS, furthest_point_sample_pallas

        if B * N <= MAX_CELLS:
            return furthest_point_sample_pallas(xyz, npoint)
    return _fps_xla(xyz, npoint)


def _zsort(xyz: jnp.ndarray):
    """Sort each row of ``xyz`` (B, N, 3) by z, returning the sorted table and
    the permutation.  One stable multi-operand ``lax.sort`` carrying x/y/z and
    the index as values — the argsort + take_along_axis form costs ~2.7x more
    on this backend (the (B, N, 3) gather serialises; tools/probe_sa1_geom.py:
    4.75 vs 1.77 ms at B=16, N=16384).  Bit-identical to stable argsort +
    gather: both break z-ties by original position."""
    B, N, _ = xyz.shape
    z = xyz[..., 2]
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], z.shape)
    _, x0, x1, x2, perm = jax.lax.sort(
        (z, xyz[..., 0], xyz[..., 1], xyz[..., 2], idx), dimension=1, num_keys=1
    )
    return jnp.stack([x0, x1, x2], axis=-1), perm


def _blockwise_stripes(N: int, npoint: int) -> int:
    """Largest power-of-two stripe count s.t. stripes keep >=1024 points
    (quality floor: each stripe must still see the whole scene densely),
    divide npoint evenly, and stay Pallas-tileable (N/s % 128 == 0)."""
    s = 1
    while (
        s < 16
        and N % (2 * s) == 0
        and npoint % (2 * s) == 0
        and N // (2 * s) >= 1024
        and (N // (2 * s)) % 128 == 0
    ):
        s *= 2
    return s


def _fps_xla(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Portable XLA fori_loop formulation (same greedy semantics)."""
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)

    def body(i, state):
        dists, last, idxs = state
        lastp = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B, 1, 3)
        d = jnp.sum(jnp.square(xyz - lastp), axis=-1)  # (B, N)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, axis=-1).astype(jnp.int32)  # (B,)
        idxs = idxs.at[:, i].set(nxt)
        return dists, nxt, idxs

    idxs = jnp.zeros((B, npoint), jnp.int32)
    dists = jnp.full((B, N), jnp.inf, jnp.float32)
    state = (dists, jnp.zeros((B,), jnp.int32), idxs)
    _, _, idxs = jax.lax.fori_loop(1, npoint, body, state)
    return idxs
