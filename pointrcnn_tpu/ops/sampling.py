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


def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """``xyz``: (B, N, 3) -> (B, npoint) int32 indices.

    Deterministic: the first selected index is 0 (matching the CUDA kernel).
    Dispatches to the Pallas kernel (ops.pallas_fps) for the large scene-level
    problem shape on TPU; the XLA loop handles small/roi-level shapes (where
    the batch is large and the per-kernel sequential grid would serialise it).
    """
    B, N, _ = xyz.shape
    if jax.default_backend() in ("tpu", "axon") and N % 128 == 0:
        from pointrcnn_tpu.ops.pallas_fps import MAX_CELLS, furthest_point_sample_pallas

        if B * N <= MAX_CELLS:
            return furthest_point_sample_pallas(xyz, npoint)
    return _fps_xla(xyz, npoint)


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
